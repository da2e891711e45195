package graft

import org.apache.spark.sql.functions._
import graft.operators.Layout

/** Physical-layout ops: Morton interleave correctness, the clustering
  * property z-order buys for multi-dimension pruning, and small-file
  * compaction. */
class LayoutSpec extends SparkSpecBase {
  import spark.implicits._

  test("zOrderFrame through a commit log: range reads prune files on BOTH cluster columns") {
    import graft.sources.CommitLog
    val t = java.nio.file.Files.createTempDirectory("zlog").toString + "/t"
    val grid = spark.range(10000).select(
      ($"id" % 100).as("x"), ($"id" / 100).cast("long").as("y"))
    val log = CommitLog(spark, t)
    log.replaceAll(Layout.zOrderFrame(grid, Seq("x", "y"), numFiles = 16))
    val all = log.read().inputFiles.length
    assert(all === 16)
    // the manifest's footer stats + z-clustering skip most files for a
    // narrow range on EITHER interleaved dimension — the r7 gap where
    // zorder existed but the log couldn't exploit it on its own tables
    val px = log.readRange("x", 10L, 19L)
    val py = log.readRange("y", 10L, 19L)
    assert(px.inputFiles.length <= all / 2, s"x-range read ${px.inputFiles.length}/$all files")
    assert(py.inputFiles.length <= all / 2, s"y-range read ${py.inputFiles.length}/$all files")
    // pruning never changes results
    assert(px.count() === 1000L && py.count() === 1000L)
  }

  test("zValue interleaves bits at the documented positions") {
    val df = Seq((3L, 0L), (0L, 3L), (3L, 3L), (2L, 1L)).toDF("x", "y")
    val got = df.select(Layout.zValue(Seq($"x", $"y"), 2).as("z"))
      .as[Long].collect().toSeq
    // bit i of x -> 2i, bit i of y -> 2i+1
    assert(got === Seq(0x5L, 0xAL, 0xFL, 0x6L))
  }

  test("z-order bounds BOTH dimensions' per-file span; single sort only one") {
    val grid = spark.range(10000).select(
      ($"id" % 100).as("x"), ($"id" / 100).cast("long").as("y"))
    val zdir = "/tmp/graft-test/zorder"
    val sdir = "/tmp/graft-test/singlesort"
    Layout.zOrderWrite(grid, zdir, Seq("x", "y"), numFiles = 16)
    grid.repartitionByRange(16, $"x").sortWithinPartitions($"x")
      .write.mode("overwrite").parquet(sdir)

    def avgSpans(path: String): (Double, Double) = {
      val spans = spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg((max($"x") - min($"x")).cast("double").as("sx"),
          (max($"y") - min($"y")).cast("double").as("sy"))
        .agg(avg($"sx"), avg($"sy")).as[(Double, Double)].head()
      spans
    }
    val (zx, zy) = avgSpans(zdir)
    val (sx, sy) = avgSpans(sdir)
    // global span is 99 in each dimension; 16 z-files ~ 4x4 tiles
    assert(zx < 50 && zy < 50, s"z-order spans ($zx, $zy) should both be tile-sized")
    assert(sx < 15, s"single-sort clusters its own key, got $sx")
    assert(sy > 90, s"single-sort leaves the other dimension unclustered, got $sy")
    // same rows either way
    assert(spark.read.parquet(zdir).count() === 10000L)
  }

  test("compact rewrites many small files into the target count, keeping rows") {
    val dir = "/tmp/graft-test/compact"
    val df = spark.range(5000).select($"id", ($"id" % 7).as("k"))
    df.repartition(64).write.mode("overwrite").parquet(dir)
    def nFiles = new java.io.File(dir).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(nFiles === 64)
    Layout.compact(spark, dir, targetFiles = 4, sortCols = Seq("id"))
    assert(nFiles === 4)
    val back = spark.read.parquet(dir)
    assert(back.count() === 5000L)
    assert(back.agg(sum($"id")).as[Long].head() === (4999L * 5000 / 2))
  }
}
