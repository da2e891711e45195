package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale path for range (interval) joins (SURVEY §2.B B5).
  *
  * A point-in-interval join `p.x BETWEEN i.lo AND i.hi` has no equi-key,
  * so Spark plans it as a broadcast nested loop — fine for a tiny
  * interval dim (q19's shape), an O(|P|·|I|) disaster when both sides
  * are big. The standard fix is binning: pick a bin width `w`, explode
  * each interval to the bins it touches, key each point by its single
  * bin, and equi-join on the bin before applying the exact predicate.
  * Cost drops to O(|P| + |I|·avgSpan/w + matches·overlapFactor) with a
  * plain shuffled equi-join — AQE-skew-splittable, spillable, the plan
  * you want at 100 TB. (Same trick Databricks' range-join optimization
  * and the Flink/Trino interval-join implementations use.)
  *
  * A point falls in exactly ONE bin, and an interval containing the
  * point always covers that bin, so each matching (point, interval)
  * pair meets on exactly one bin key — no duplicate elimination needed.
  *
  * `binWidth` tuning: ~the typical interval span, so each interval
  * explodes to O(1) bins while each bin holds few intervals. Too small →
  * interval blow-up (bounded by `maxBinsPerInterval`); too large → many
  * intervals per bin re-checked by the exact filter.
  */
object RangeJoin {

  /** Inner point-in-interval join. `points.x BETWEEN intervals.lo AND
    * intervals.hi` (inclusive both ends), all numeric columns cast to
    * double for binning; the exact BETWEEN predicate re-checks on the
    * original values so binning never changes semantics.
    *
    * Intervals wider than `maxBinsPerInterval` bins fail fast rather
    * than silently exploding the build side — widen `binWidth` (or split
    * the offending intervals) instead of letting one open-ended interval
    * fan out to millions of rows. NULL points/bounds never match
    * (BETWEEN is null-rejecting), matching the naive theta-join.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      x: String, lo: String, hi: String, binWidth: Double,
      maxBinsPerInterval: Int = 10000): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    def bin(c: Column): Column = floor(c.cast("double") / binWidth).cast("long")
    val nBins = bin(col(hi)) - bin(col(lo)) + 1
    val bins = when(nBins <= maxBinsPerInterval,
        sequence(bin(col(lo)), bin(col(hi))))
      .otherwise(raise_error(concat(
        lit(s"RangeJoin: interval ["), col(lo).cast("string"), lit(", "),
        col(hi).cast("string"),
        lit(s"] spans more than $maxBinsPerInterval bins of width $binWidth; " +
          "increase binWidth or split the interval"))))
    val binned = intervals
      .filter(col(lo).isNotNull && col(hi).isNotNull && col(lo) <= col(hi))
      .withColumn("__bin", explode(bins))
    points
      .filter(col(x).isNotNull)
      .withColumn("__bin", bin(col(x)))
      .join(binned, Seq("__bin"))
      .filter(col(x) >= col(lo) && col(x) <= col(hi))
      .drop("__bin")
  }

  /** Inner INTERVAL-OVERLAP join: `[a.lo, a.hi] ∩ [b.lo, b.hi] ≠ ∅`
    * (inclusive ends — overlap iff a.lo <= b.hi AND b.lo <= a.hi).
    * Both sides explode to their touched bins and equi-join on the bin
    * key; an overlapping pair shares every bin of the intersection, so
    * the pair is kept ONLY at the intersection's FIRST bin
    * (`max(bin(a.lo), bin(b.lo))` — computable per joined row from the
    * original bounds, no dedup shuffle, the [[pointInInterval]]
    * each-pair-meets-once guarantee generalized). Exact predicate
    * re-checks on the original values; the fail-fast width guard
    * applies to both sides. Columns must be disjoint between `left`
    * and `right` (rename upstream).
    *
    * Malformed intervals (ADVICE r7): an INVERTED interval (lo > hi)
    * raises like the width guard does — the naive theta predicate
    * would let it match, but binning cannot represent it, so silence
    * would diverge from the stated equivalence. NULL- and NaN-bounded
    * rows are dropped: a null bound never satisfies the predicate,
    * and a NaN bound (which Spark orders ABOVE every finite value, so
    * it would otherwise trip the inverted-interval guard) can only
    * theta-match another NaN-degenerate interval — binning cannot
    * place either, so both are filtered before the guard runs. */
  def intervalOverlap(left: DataFrame, right: DataFrame,
      lLo: String, lHi: String, rLo: String, rHi: String, binWidth: Double,
      maxBinsPerInterval: Int = 10000): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    def bin(c: Column): Column = floor(c.cast("double") / binWidth).cast("long")
    def binned(df: DataFrame, lo: String, hi: String): DataFrame = {
      val nBins = bin(col(hi)) - bin(col(lo)) + 1
      val bins = when(col(lo) > col(hi), raise_error(concat(
          lit("RangeJoin: inverted interval ["), col(lo).cast("string"),
          lit(", "), col(hi).cast("string"),
          lit("] (lo > hi) — fix or filter malformed intervals upstream"))))
        .when(nBins <= maxBinsPerInterval,
          sequence(bin(col(lo)), bin(col(hi))))
        .otherwise(raise_error(concat(
          lit(s"RangeJoin: interval ["), col(lo).cast("string"), lit(", "),
          col(hi).cast("string"),
          lit(s"] spans more than $maxBinsPerInterval bins of width $binWidth; " +
            "increase binWidth or split the interval"))))
      df.filter(col(lo).isNotNull && col(hi).isNotNull &&
          !isnan(col(lo).cast("double")) && !isnan(col(hi).cast("double")))
        .withColumn("__bin", explode(bins))
    }
    binned(left, lLo, lHi)
      .join(binned(right, rLo, rHi), Seq("__bin"))
      .filter(col(lLo) <= col(rHi) && col(rLo) <= col(lHi))
      .filter(col("__bin") === greatest(bin(col(lLo)), bin(col(rLo))))
      .drop("__bin")
  }
}
