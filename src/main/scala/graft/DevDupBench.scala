package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

/** Dev utility: [[graft.operators.ExactSubstr]] on a HIGH-duplication
  * corpus — the operator's design-point workload (a corpus worth
  * exact-substring deduping is by definition full of repeated spans)
  * and the worst case for the r11 explode-then-distinct mark shape,
  * whose pre-distinct shuffle carried up to windowTokens× the
  * covered-token count. Every document gets a shared 120-token
  * boilerplate prefix, so nearly every stride-1 window of the prefix
  * region is duplicated corpus-wide. Reports wall time and total
  * shuffle WRITE bytes (stage-level task metrics) per run:
  *
  *   runMain graft.DevDupBench <sfDir>
  */
object DevDupBench {
  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: DevDupBench <sfDir>")
    val spark = Sessions.local("dev-dup-bench")
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        shuffleBytes.addAndGet(
          sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })
    val boiler = (1 to 120).map(i => s"tok$i").mkString(" ")
    val docs = spark.read.parquet(s"${args(0)}/documents.parquet")
      .select(col("doc_id"),
        concat_ws(" ", lit(boiler), col("text")).as("text"))
    docs.write.format("noop").mode("overwrite").save() // warm the scan
    for (i <- 1 to 3) {
      shuffleBytes.set(0L)
      val t0 = System.nanoTime()
      graft.operators.ExactSubstr
        .dropDuplicateSpans(docs, "doc_id", "text", windowTokens = 50)
        .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(2000) // let the listener bus drain stage events
      println(f"[dup-bench] run$i: $sec%.2f s, shuffle write " +
        f"${shuffleBytes.get() / 1e6}%.1f MB")
    }
    spark.stop()
  }
}
