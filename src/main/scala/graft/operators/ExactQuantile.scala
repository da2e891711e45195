package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact global quantiles WITHOUT buffering the column: iterative
  * histogram narrowing (distributed selection by multi-pass counting;
  * cf. Munro-Paterson 1980 on selection with bounded memory). Each
  * level bins the surviving candidate set into `bins` equal-width
  * buckets with one map-side-combinable aggregate, keeps the bucket
  * holding the target rank, and recurses; once ≤ `collectThreshold`
  * candidates survive they are collected and selected exactly.
  *
  * This is the scale answer to `percentile`'s per-group value buffer
  * (SURVEY §9): memory per task is O(bins) regardless of row count,
  * and each level is a pushed-down filter + one aggregate. The range
  * shrinks by ×bins per level, so doubles separate in ≤ ~6 levels even
  * at 100 TB. Global only by design: per-GROUP exact quantiles keep the
  * buffered built-in (bounded by group size); this operator is for the
  * column-wide case where that buffer would be the dataset.
  *
  * FP discipline: candidate membership is tracked as the CONJUNCTION of
  * the exact bin expressions already applied (never as a recomputed
  * range compare, which can disagree with floor-binning at bin edges by
  * one ulp), and each level re-derives min/max over the true candidate
  * set — when all survivors are equal the value itself is returned, so
  * duplicate-heavy plateaus terminate.
  *
  * Interpolation matches `percentile`/`quantile_cont`: pos = p·(n−1)+1,
  * result = v(⌊pos⌋) + (pos−⌊pos⌋)·(v(⌊pos⌋+1) − v(⌊pos⌋)).
  */
object ExactQuantile {

  /** Exact interpolated quantiles of non-null, non-NaN `valueCol`.
    * Returns one (p, value) per requested p. */
  def quantiles(df: DataFrame, valueCol: String, ps: Seq[Double],
      bins: Int = 2048, collectThreshold: Int = 65536): Seq[(Double, Double)] = {
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1),
      s"quantile fractions must be in [0,1], got $ps")
    val vals = df.select(col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull && !isnan(col("v")))
      .localCheckpoint()
    val n = vals.count()
    require(n > 0, "exact quantile of an empty column")
    ps.map { p =>
      val pos = p * (n - 1) + 1
      val lo = math.floor(pos).toLong
      val frac = pos - lo
      val vLo = rankValue(vals, lo, bins, collectThreshold)
      val v = if (frac == 0) vLo
        else vLo + frac * (rankValue(vals, lo + 1, bins, collectThreshold) - vLo)
      p -> v
    }
  }

  /** The value at 1-based rank `k` of column `v` (ascending). */
  private def rankValue(vals: DataFrame, k: Long, bins: Int,
      collectThreshold: Int): Double = {
    var cond: Column = lit(true) // exact candidate-set membership
    var kRem = k                 // target rank within the candidate set
    var level = 0
    while (true) {
      level += 1
      require(level <= 64, "histogram narrowing failed to converge")
      val row = vals.filter(cond)
        .agg(count(lit(1)), min(col("v")), max(col("v"))).head()
      val (cnt, mn, mx) = (row.getLong(0), row.getDouble(1), row.getDouble(2))
      require(cnt >= kRem && kRem >= 1, s"rank $kRem outside candidate set ($cnt)")
      if (mn == mx) return mn // all survivors equal (also the n==1 case)
      if (cnt <= collectThreshold) {
        val arr = vals.filter(cond).sort(col("v")).collect().map(_.getDouble(0))
        return arr(kRem.toInt - 1)
      }
      val w = (mx - mn) / bins
      // clamp: v == mx lands in the last bin; FP edge cases stay in range
      val bin = greatest(lit(0),
        least(floor((col("v") - mn) / w).cast("int"), lit(bins - 1)))
      val hist = vals.filter(cond)
        .groupBy(bin.as("b")).agg(count(lit(1)).as("c"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      var cum = 0L
      var target = -1
      var below = 0L
      for (b <- 0 until bins if target < 0) {
        val c = hist.getOrElse(b, 0L)
        if (cum + c >= kRem) { target = b; below = cum }
        cum += c
      }
      require(target >= 0, s"rank $kRem not covered by histogram (cum=$cum)")
      cond = cond && (bin === target) // exact same expression → no edge drift
      kRem -= below
    }
    0.0 // unreachable
  }
}
