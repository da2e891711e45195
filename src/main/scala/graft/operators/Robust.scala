package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Robust per-group outlier scoring — the median/MAD (Hampel
  * identifier) form of the quality gate a training-data pipeline runs
  * over per-source numeric signals (doc length, score drift, price
  * feeds): mean/stddev z-scores move with the outliers they're meant
  * to catch (one 1000× row drags a group's mean past its own tail),
  * while the median and the median-absolute-deviation have a 50%
  * breakdown point — half a group must be corrupt before the gate
  * moves. The reference's analog is its null-field row rejection
  * (/root/reference/index.js:118-120) — a per-row validity gate; this
  * is the distributional form of the same idea.
  *
  * Both location (median) and scale (MAD) come from
  * [[ExactQuantile.quantilesByGroup]], so the scores are EXACT (type-7
  * interpolation, bit-equal to DuckDB's `quantile_cont`) and the scale
  * shape is the engine's: O(levels) jobs and O(bins) task memory for
  * ANY group count, never a per-group sort or buffer.
  *
  * 100 TB shape: two grouped-quantile narrowings + two keyed joins on
  * the group key (the median/MAD frames are group-domain-sized — they
  * broadcast while small and shuffle-join past that); the row frame is
  * never shuffled except by those joins and nothing row-sized reaches
  * the driver.
  *
  * Degeneracy is the identifier's documented behavior, not a bug: a
  * group where ≥ half the values are identical has MAD = 0, so EVERY
  * deviating row flags (`dev > k·0`). Callers gating on noisy
  * near-constant signals should floor the scale (`greatest(mad, ε)`)
  * upstream of the flag.
  */
object Robust {

  /** Per-row robust scores: each input row joined with its group's
    * exact `med` (median) and `mad` (median absolute deviation from
    * the median), plus `is_outlier` = |value − med| > k·mad. Rows
    * whose value is null/NaN carry null med-deviation and a null flag
    * (SQL comparison semantics); groups with NO measurable value drop
    * (inner join against the per-group stats — there is no median to
    * score against). */
  def madScores(df: DataFrame, keyCols: Seq[String], valueCol: String,
      k: Double = 3.0, medCol: String = "med", madCol: String = "mad",
      flagCol: String = "is_outlier", bins: Int = 1024,
      collectThreshold: Int = 65536): DataFrame = {
    require(keyCols.nonEmpty, "madScores needs ≥1 group key")
    require(k >= 0, s"outlier threshold k=$k must be ≥ 0")
    // ONE materialized (keys, v) projection feeds both dependent
    // quantile passes: the median narrowing, and — joined with the
    // group-sized median frame — the deviation narrowing. The source
    // is scanned once here and once for the row-level output below,
    // instead of once per pass (r9; the BenchOne pin showed the extra
    // scans+checkpoints were most of q146's isolated time).
    val vals = df
      .select(keyCols.map(col) :+ col(valueCol).cast("double").as("v"): _*)
      .filter(col("v").isNotNull && !isnan(col("v")))
      .localCheckpoint()
    val med = ExactQuantile.quantilesByGroupPrepped(
      vals, keyCols, Seq(0.5), Seq(medCol),
      bins = bins, collectThreshold = collectThreshold)
      .select(keyCols.map(col) :+ col(medCol): _*)
    val devVals = vals.join(med, keyCols)
      .select(keyCols.map(col) :+ abs(col("v") - col(medCol)).as("v"): _*)
      .localCheckpoint()
    val mad = ExactQuantile.quantilesByGroupPrepped(
      devVals, keyCols, Seq(0.5), Seq(madCol),
      bins = bins, collectThreshold = collectThreshold)
      .select(keyCols.map(col) :+ col(madCol): _*)
    // prepped results never read their input (result-independence
    // contract), and the returned frame below joins the caller's `df`
    // against med/mad only — both scratch projections are dead here.
    graft.util.Ckpt.release(vals, devVals)
    df.join(med, keyCols)
      .withColumn("__dev", abs(col(valueCol).cast("double") - col(medCol)))
      .join(mad, keyCols)
      .withColumn(flagCol, col("__dev") > lit(k) * col(madCol))
      .drop("__dev")
  }
}
