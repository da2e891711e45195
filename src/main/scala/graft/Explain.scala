package graft

/** Dev tool: dump formatted physical plans for declared queries and flag
  * scale smells — missing filter pushdown, cartesian products. Usage:
  *   runMain graft.Explain [sfDir] [queryName ...]   # dump + report
  *   runMain graft.Explain --gate [sfDir]            # CI gate: exit 1 on
  *                                                   # smells outside the
  *                                                   # allowlist
  *
  * Gate semantics (VERDICT r6 #7): a query FAILS if its physical plan
  * contains a CartesianProduct, or if a parquet scan reports
  * `PushedFilters: []` while the plan still carries a post-scan Filter
  * (a filter that exists but reached no scan is either a real pushdown
  * miss or a computed-column predicate — the allowlist records the
  * vetted latter class, so a NEW miss can't hide). Only plans are
  * analyzed; the handful of queries whose CONSTRUCTION runs a bounded
  * driver job (q115's min/max head(), ExactQuantile's narrowing) still
  * run those, so the gate is seconds-to-a-minute, not a bench.
  */
object Explain {

  /** Queries vetted to carry a residual Filter over an unfiltered scan:
    * every entry is a predicate Catalyst CANNOT push (computed columns,
    * post-explode/window/aggregate filters), re-checked when touched.
    * Keep sorted; comment = the unpushable predicate.
    *
    * Known false-positive class (ADVICE r7, accepted as conservative):
    * the heuristic pairs ANY `PushedFilters: []` scan with ANY Filter
    * in the same plan, so a multi-scan query whose predicate-free scan
    * coexists with a legitimate post-aggregate Filter cross-matches.
    * Such an entry here must name BOTH nodes in its comment; the
    * conservative bias is deliberate — a NEW pushdown miss can never
    * hide behind an empty allowlist. */
  private val pushdownAllowlist: Set[String] = Set.empty

  private def smells(plan: String): Seq[String] = {
    val cartesian = if (plan.contains("CartesianProduct"))
      Seq("cartesian product") else Nil
    val pushMiss =
      if (plan.contains("PushedFilters: []") &&
          plan.linesIterator.exists(_.matches(""".*\(\d+\) Filter.*""")))
        Seq("post-scan Filter with an unfiltered scan (pushdown miss?)")
      else Nil
    cartesian ++ pushMiss
  }

  def main(args: Array[String]): Unit = {
    val gate = args.headOption.contains("--gate")
    val rest = if (gate) args.tail else args
    val sfDir = rest.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (rest.length > 1) rest.tail.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = Sessions.local("graft-explain", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    var failures = List.empty[(String, Seq[String])]
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      if (!gate) {
        println(s"\n===== $name =====")
        println(plan)
      }
      val found = smells(plan)
      if (found.nonEmpty) {
        println(s"[smell] $name: ${found.mkString("; ")}")
        val gated = if (pushdownAllowlist(name))
          found.filterNot(_.contains("pushdown")) else found
        if (gated.nonEmpty) failures ::= (name, gated)
      }
    }
    spark.stop()
    if (gate) {
      if (failures.nonEmpty) {
        System.err.println(s"[gate] ${failures.size} queries failed the plan audit:")
        failures.reverse.foreach { case (n, s) =>
          System.err.println(s"[gate]   $n: ${s.mkString("; ")}") }
        sys.exit(1)
      }
      println(s"[gate] plan audit clean: ${names.size} queries, 0 smells")
    }
  }
}
