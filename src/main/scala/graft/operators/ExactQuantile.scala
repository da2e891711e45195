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
  * All requested ranks narrow TOGETHER: ranks whose candidate sets are
  * still identical (always true at level 1, and usually true at every
  * level for an interpolation pair k, k+1) share one histogram pass, so
  * p50/p90/p99 cost ~one narrowing each, not one per rank.
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
    val wanted = ps.map { p =>
      val pos = p * (n - 1) + 1
      (p, math.floor(pos).toLong, pos - math.floor(pos))
    }
    val ranks = wanted.flatMap { case (_, lo, frac) =>
      if (frac == 0) Seq(lo) else Seq(lo, lo + 1) }.distinct
    val byRank = rankValues(vals, ranks, bins, collectThreshold)
    wanted.map { case (p, lo, frac) =>
      val vLo = byRank(lo)
      p -> (if (frac == 0) vLo else vLo + frac * (byRank(lo + 1) - vLo))
    }
  }

  /** One in-flight selection: the original rank, its candidate-set
    * predicate (exact conjunction of applied bin tests), and the
    * target's rank within that set. */
  private final case class Pending(k: Long, cond: Column, kRem: Long)

  /** Values at 1-based ranks `ks` of column `v` (ascending), narrowing
    * all ranks level by level; pendings with literally identical
    * predicate lineage (tracked by group key) share each level's
    * aggregate + histogram. */
  private def rankValues(vals: DataFrame, ks: Seq[Long], bins: Int,
      collectThreshold: Int): Map[Long, Double] = {
    val done = scala.collection.mutable.Map.empty[Long, Double]
    // group key = sequence of (level bin) choices made so far; pendings
    // sharing it have the same cond by construction
    var groups: Map[List[Int], Seq[Pending]] =
      Map(List.empty[Int] -> ks.map(k => Pending(k, lit(true), k)))
    var level = 0
    while (groups.nonEmpty) {
      level += 1
      require(level <= 64, "histogram narrowing failed to converge")
      groups = groups.flatMap { case (path, pending) =>
        val cond = pending.head.cond
        val row = vals.filter(cond)
          .agg(count(lit(1)), min(col("v")), max(col("v"))).head()
        val (cnt, mn, mx) = (row.getLong(0), row.getDouble(1), row.getDouble(2))
        pending.foreach(p => require(cnt >= p.kRem && p.kRem >= 1,
          s"rank ${p.kRem} outside candidate set ($cnt)"))
        if (mn == mx) { // all survivors equal (also the n==1 case)
          pending.foreach(p => done(p.k) = mn)
          Nil
        } else if (cnt <= collectThreshold) {
          val arr = vals.filter(cond).sort(col("v")).collect().map(_.getDouble(0))
          pending.foreach(p => done(p.k) = arr(p.kRem.toInt - 1))
          Nil
        } else {
          val w = (mx - mn) / bins
          // clamp: v == mx lands in the last bin; FP edges stay in range
          val bin = greatest(lit(0),
            least(floor((col("v") - mn) / w).cast("int"), lit(bins - 1)))
          val hist = vals.filter(cond)
            .groupBy(bin.as("b")).agg(count(lit(1)).as("c"))
            .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
          val cum = new Array[Long](bins + 1) // cum(b) = rows in bins < b
          for (b <- 0 until bins) cum(b + 1) = cum(b) + hist.getOrElse(b, 0L)
          pending.groupBy { p =>
            val t = (0 until bins).find(b => cum(b + 1) >= p.kRem)
            require(t.isDefined, s"rank ${p.kRem} not covered (cum=${cum(bins)})")
            t.get
          }.map { case (target, ps) =>
            // exact same bin expression extends the predicate → no drift
            (target :: path) -> ps.map(p =>
              p.copy(cond = p.cond && (bin === target), kRem = p.kRem - cum(target)))
          }
        }
      }
    }
    done.toMap
  }
}
