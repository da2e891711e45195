package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Per-group hard token caps: keep each group's rows — in a declared
  * deterministic priority order — until the group's token budget is
  * exhausted, then drop the rest. The "domain cap" stage of crawl
  * curation (no single site may contribute more than N tokens),
  * complementing [[Mixture]]'s proportional resampling with an absolute
  * ceiling.
  *
  * Keep rule: a row survives iff the running token total THROUGH it is
  * ≤ cap (prefix semantics — the decision depends only on higher-
  * priority rows, so it is one window expression, not a sequential
  * scan). All-integer arithmetic: any engine replays the cut exactly.
  *
  * Scale shape: one shuffle on the group key; the running sum is a
  * rank-order window within each group. A pathologically hot group
  * serializes its own window — mitigate upstream with the usual salting
  * trick only if a single group exceeds a partition (caps are usually
  * applied per domain, where groups are millions of small sets).
  */
object Caps {

  /** Adds `cum_tok` (running total through this row, priority order) and
    * `is_kept` (cum_tok ≤ cap) to `df`. */
  def capPerGroup(df: DataFrame, groupCols: Seq[String], ord: Seq[Column],
      tokCol: String, cap: Long): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cum_tok", sum(col(tokCol)).over(w))
      .withColumn("is_kept", col("cum_tok") <= cap)
  }
}
