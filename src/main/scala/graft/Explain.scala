package graft

/** Dev tool: dump formatted physical plans for declared queries and flag
  * scale smells — missing filter pushdown, unexpectedly wide scans,
  * missing broadcasts, codegen gaps. Usage:
  *   runMain graft.Explain [sfDir] [queryName ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = Sessions.local("graft-explain", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      println(s"\n===== $name =====")
      println(plan)
      val smells = Seq(
        "PushedFilters: []" -> "scan with no pushed filters",
        "CartesianProduct" -> "cartesian product").collect {
        case (pat, msg) if plan.contains(pat) => msg
      }
      if (smells.nonEmpty) println(s"[smell] $name: ${smells.mkString("; ")}")
    }
    spark.stop()
  }
}
