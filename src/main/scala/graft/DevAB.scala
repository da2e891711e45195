package graft

/** Dev utility: interleaved A/B of runtime-settable SQL confs (r19).
  * Cross-process bench comparisons on a shared box drown real deltas
  * in window noise (canary drift of 1.2-1.6x between runs observed);
  * interleaving A and B runs of the same query inside ONE JVM removes
  * the window entirely — both arms see the same JIT state, page cache,
  * and ambient load.
  *
  *   runMain graft.DevAB <sfDir> <k1=v1,k2=v2[;k3=v3...]> <q1,q2,...>
  *
  * Arm A = session defaults, arm B = the listed confs. 3 pairs per
  * query, alternating B,A,B,A,...; reports min per arm. */
object DevAB {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: DevAB <sfDir> <confs> <queries>")
    val sfDir = args(0)
    val confs = args(1).split("[,;]").map(_.trim).filter(_.nonEmpty)
      .map { kv => val Array(k, v) = kv.split("=", 2); (k, v) }.toSeq
    val names = args(2).split(',').map(_.trim).filter(_.nonEmpty)
    val spark = Sessions.local("dev-ab")
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    locally {
      import org.apache.spark.sql.functions._
      spark.range(1).select(lower(lit("Warm")), upper(lit("warm")),
          initcap(lit("warm up")), levenshtein(lit("warm"), lit("worm")))
        .write.format("noop").mode("overwrite").save()
    }
    val baseline = confs.map { case (k, _) => k -> spark.conf.get(k) }
    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      graft.util.Ckpt.sweep(spark)
      (System.nanoTime() - t0) / 1e9
    }
    for (name <- names) {
      var minA = Double.MaxValue
      var minB = Double.MaxValue
      for (_ <- 1 to 3) {
        confs.foreach { case (k, v) => spark.conf.set(k, v) }
        minB = math.min(minB, runOnce(name))
        baseline.foreach { case (k, v) => spark.conf.set(k, v) }
        minA = math.min(minA, runOnce(name))
      }
      println(f"[ab] $name  A(default)=$minA%.2f s  B(conf)=$minB%.2f s  " +
        f"delta=${minB - minA}%+.2f s")
    }
    spark.stop()
  }
}
