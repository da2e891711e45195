package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus mixture balancing: hit a target token budget with declared
  * per-source proportions — the "data mixture" step of training-set
  * assembly (upweight curated sources, downsample bulk crawl).
  *
  * Given per-source weights w_s and a global budget B, each source's
  * token target is B·w_s/Σw and its sampling RATE is target/available.
  * Rates may exceed 1 (upsampling): a doc is kept floor(rate) times
  * plus one more iff its deterministic md5-uniform falls under the
  * fractional remainder — so expected tokens per source ≈ its target,
  * and reruns pick the SAME docs (Efraimidis-style determinism, same
  * md5→uniform construction as [[WeightedSample]]).
  *
  * Scale shape: one tiny per-source aggregate (|sources| rows) joined
  * back by broadcast; the per-doc decision is a single codegen'd
  * projection over the corpus — no second shuffle of the big side.
  */
object Mixture {

  /** md5-derived uniform in [0,1): top 60 bits of md5(seed:id) / 2^60. */
  private def u01(seed: String, id: Column): Column =
    conv(substring(md5(concat(lit(seed + ":"), id.cast("string"))), 1, 15), 16, 10)
      .cast("long").cast("double") / 1152921504606846976.0d

  /** Per-doc copy counts meeting `budget` tokens at the given mixture.
    *
    * @param docs     corpus with `idCol`, `srcCol`, `tokCol`
    * @param weights  (source → relative weight); sources absent from
    *                 the map get weight 0 (dropped, n_copies = 0)
    * @param budget   global token budget B
    * @param seed     determinism seed for the fractional keep decision
    */
  def balance(
      docs: DataFrame,
      idCol: String,
      srcCol: String,
      tokCol: String,
      weights: Map[String, Double],
      budget: Long,
      seed: String): DataFrame = {
    // Sorted fold: Map iteration order must not leak into the sum (FP
    // addition is order-sensitive) or the plan string. With integer-valued
    // weights the sum is exact regardless, which is what makes the
    // keep-decision bit-replayable in any engine (q86-class determinism).
    val sortedW = weights.toSeq.sortBy(_._1)
    val totalW = sortedW.map(_._2).sum
    val wExpr = sortedW.foldLeft(lit(0.0d)) { case (acc, (s, w)) =>
      when(col(srcCol) === s, lit(w)).otherwise(acc)
    }
    val avail = docs.groupBy(col(srcCol))
      .agg(sum(col(tokCol)).as("avail_tok"))
      .withColumn("target_tok", lit(budget.toDouble) * wExpr / totalW)
      .withColumn("rate", col("target_tok") / col("avail_tok").cast("double"))
    docs
      .join(broadcast(avail), Seq(srcCol))
      .withColumn("n_copies",
        (floor(col("rate")) +
          when(u01(seed, col(idCol)) < col("rate") - floor(col("rate")), 1L)
            .otherwise(0L)).cast("long"))
  }
}
