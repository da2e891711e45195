// temp probe (not committed)
package graft
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val name = args(1)
    val spark = Sessions.local("bench-one")
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[probe] $name run$i: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
