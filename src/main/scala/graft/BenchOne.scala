package graft

/** Dev utility: time one declared query in isolation (3 runs after a
  * warm-up table read). `runMain graft.BenchOne <sfDir> <queryName>` —
  * used because single full-suite bench runs have ~±30% ambient variance
  * on a shared box. Writes to the `noop` sink so the whole plan executes
  * without materialization cost. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: BenchOne <sfDir> <queryName[,queryName...]>")
    val sfDir = args(0)
    val names = args(1).split(',').map(_.trim).filter(_.nonEmpty)
    val spark = Sessions.local("bench-one")
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    locally { // one-time ICU case-mapping table init (see Bench warmup)
      import org.apache.spark.sql.functions._
      spark.range(1).select(lower(lit("Warm")), upper(lit("warm")),
          initcap(lit("warm up")), levenshtein(lit("warm"), lit("worm")))
        .write.format("noop").mode("overwrite").save()
    }
    names.foreach { name =>
      var best = Double.MaxValue
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        best = math.min(best, sec)
        println(f"[bench-one] $name run$i: $sec%.2f s")
      }
      println(f"[bench-one] $name min: $best%.2f s")
    }
    spark.stop()
  }
}
