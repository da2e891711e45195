package graft

import org.apache.spark.sql.functions._

/** Dev utility: isolate the snapshot-fold cost (r19). Builds a table
  * with N commits (every commit carrying per-file stats like real
  * writes), then times M snapshot() calls on fresh CommitLog
  * instances — the pattern every multi-commit query runs.
  *
  *   runMain graft.DevSnap <commits> <calls>
  */
object DevSnap {
  def main(args: Array[String]): Unit = {
    val commits = args.headOption.map(_.toInt).getOrElse(20)
    val calls = args.drop(1).headOption.map(_.toInt).getOrElse(100)
    val spark = Sessions.local("dev-snap")
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("devsnap").toString + "/t"
    val log = graft.sources.CommitLog(spark, root)
    for (i <- 1 to commits)
      log.append(Seq.tabulate(64)(j => (i.toLong * 1000 + j, s"v$i-$j", j * 1.5))
        .toDF("id", "v", "x"))
    for (round <- 1 to 3) {
      val t0 = System.nanoTime()
      var last = -1L
      for (_ <- 1 to calls)
        last = graft.sources.CommitLog(spark, root).snapshot().version
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[snap] round $round: $calls calls over $commits commits " +
        f"(head v$last): $dt%.3f s (${dt / calls * 1000}%.1f ms/call)")
    }
    spark.stop()
  }
}
