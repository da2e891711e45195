package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget sequence packing (the pre-training batch-prep step):
  * concatenate the corpus in a deterministic document order and chunk
  * it into fixed-budget token blocks — each document lands at a global
  * token offset and spans one or more blocks.
  *
  * The core is a DISTRIBUTED PREFIX SUM. A naive
  * `Window.orderBy(id)` with no partition key funnels the whole table
  * through one task — the classic global-window anti-pattern — so the
  * scan runs in two phases instead (the textbook scan decomposition):
  *
  *   1. range-partition by the order key; per-partition totals (one
  *      map-side-combinable agg over P rows);
  *   2. exclusive offsets across the P totals (a window over P rows,
  *      trivially small), broadcast back; within-partition running sum
  *      via a window PARTITIONED by the range bucket.
  *
  * Every stage is bounded per-partition; the result is independent of P
  * (asserted in spec) because prefix sums compose exactly.
  */
object Packing {

  /** `df` plus `outCol` = exclusive running sum of `valCol` in ascending
    * `orderCol` order (global, exact, partition-count-independent).
    * `orderCol` must be unique — it is the total order.
    *
    * The cross-partition offsets are cumulated on the DRIVER from the P
    * per-partition totals (≤ numShufflePartitions rows — metadata-sized
    * by construction) and attached as a map literal: a partition-less
    * `Window.orderBy(__pid)` over the same P rows would be equally safe
    * but indistinguishable in logs from a real global-window scale bug.
    * The range-partitioned input is localCheckpoint'ed once so the
    * totals job and the running-sum job see the SAME partition
    * assignment (range boundaries come from sampling). */
  def exclusivePrefixSum(df: DataFrame, orderCol: String, valCol: String,
      outCol: String, numParts: Int = 0): DataFrame =
    exclusivePrefixSumBy(df, Seq(col(orderCol)), valCol, outCol, numParts)

  /** [[exclusivePrefixSum]] under an arbitrary total order (e.g.
    * quality DESC with an id tie-break — the budget-selection order).
    * `orderCols` MUST be a total order: range partitioning and the
    * in-partition window both follow it, and a tie would make the
    * prefix sum nondeterministic. */
  def exclusivePrefixSumBy(df: DataFrame, orderCols: Seq[Column],
      valCol: String, outCol: String, numParts: Int = 0): DataFrame = {
    val p = if (numParts > 0) numParts
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val parted = df.repartitionByRange(p, orderCols: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val tot = parted.groupBy(col("__pid"))
      .agg(coalesce(sum(col(valCol)), lit(0L)).as("__tot"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    if (tot.isEmpty) return parted.withColumn(outCol, lit(0L)).drop("__pid")
    val pids = tot.keys.toSeq.sorted
    val offs = pids.scanLeft(0L)((acc, pid) => acc + tot(pid)).init
    val offMap = map(pids.zip(offs).flatMap {
      case (pid, off) => Seq(lit(pid), lit(off)) }: _*)
    val w = Window.partitionBy(col("__pid")).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    parted.withColumn(outCol,
        element_at(offMap, col("__pid"))
          + coalesce(sum(col(valCol)).over(w), lit(0L)))
      .drop("__pid")
  }

  /** Global token-budget selection (the "fill a 10B-token budget with
    * the best documents" curation step): rank the corpus by
    * `orderCols` (quality DESC + unique tie-break), keep every doc
    * whose EXCLUSIVE cumulative `valCol` is under `budget` — i.e. the
    * ranked prefix, with the boundary-straddling doc included (its
    * predecessors fit; truncating it is the loader's call). One
    * distributed prefix sum — no global window, no driver sort. */
  def selectUnderBudget(docs: DataFrame, valCol: String, budget: Long,
      orderCols: Seq[Column], outCol: String = "selected",
      numParts: Int = 0): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    exclusivePrefixSumBy(docs, orderCols, valCol, "cum_before", numParts)
      .withColumn(outCol, col("cum_before") < budget)
  }

  /** Block assignment under `budget` tokens per block: each doc's token
    * span [start_tok, start_tok + n_tok) maps to blocks
    * first_block..last_block; `straddles` marks docs crossing a block
    * boundary (the ones a loader must split). */
  def packBlocks(docs: DataFrame, idCol: String, tokCol: String,
      budget: Long, numParts: Int = 0): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val b = lit(budget)
    exclusivePrefixSum(docs, idCol, tokCol, "start_tok", numParts)
      .select(col(idCol), col(tokCol), col("start_tok"),
        expr(s"start_tok div $budget").as("first_block"),
        ((col("start_tok") + col(tokCol) - 1).cast("long")).as("__end"))
      .withColumn("last_block", expr(s"__end div $budget"))
      .drop("__end")
      .withColumn("straddles", col("first_block") =!= col("last_block"))
  }
}
