package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data profiling — the first thing run against a new 100 TB delivery
  * before any pipeline touches it: per-column quality stats and
  * numeric histograms. Both are single-pass aggregates (ONE scan for
  * the whole profile, map-side combined; nothing per-column-per-pass),
  * which is the difference between a profile that costs one read of
  * the corpus and one that costs `n_columns` reads.
  */
object Profile {

  /** One row per profiled column: null count/rate, distinct count,
    * min/max/avg length of the string form. All columns fold into ONE
    * aggregate row (single scan), then unpivot to the per-column
    * relation. The 100 TB default is `exactDistinct = false` — HLL
    * keeps the profile a single map-side-combinable pass (engine-
    * specific sketch values; bound-check them like q35). Exact mode
    * plans Spark's multi-distinct Expand (rows multiplied per distinct
    * set) — affordable for a handful of columns, and what a SQL oracle
    * can replay. */
  def tableProfile(df: DataFrame, cols: Seq[String],
      exactDistinct: Boolean = false): DataFrame = {
    val n = count(lit(1)).as("__n")
    val per = cols.flatMap { c =>
      val s = col(c).cast("string")
      val dist = if (exactDistinct) countDistinct(col(c))
        else approx_count_distinct(col(c))
      Seq(
        sum(col(c).isNull.cast("long")).as(s"__nulls_$c"),
        dist.as(s"__dist_$c"),
        min(length(s)).as(s"__minl_$c"),
        max(length(s)).as(s"__maxl_$c"),
        avg(length(s)).as(s"__avgl_$c"))
    }
    val agg = df.agg(n, per: _*)
    val rows = cols.map { c =>
      struct(lit(c).as("column"),
        col(s"__nulls_$c").as("n_null"),
        round(col(s"__nulls_$c").cast("double") / col("__n").cast("double"), 6)
          .as("null_rate"),
        col(s"__dist_$c").as("n_distinct"),
        col(s"__minl_$c").as("min_len"),
        col(s"__maxl_$c").as("max_len"),
        round(col(s"__avgl_$c"), 6).as("avg_len"))
    }
    agg.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
  }

  /** Equi-width histogram of `valueCol`: `bins` buckets over [lo, hi]
    * (pass the observed min/max, or domain bounds), top-clamped so
    * v == hi lands in the last bucket. One map-side-combinable
    * aggregate; empty buckets are materialized (a histogram with holes
    * silently dropped reads as data that isn't there). */
  def histogram(df: DataFrame, valueCol: String, lo: Double, hi: Double,
      bins: Int): DataFrame = {
    require(bins > 0 && hi > lo, s"need bins>0 and hi>lo, got $bins [$lo,$hi]")
    val w = (hi - lo) / bins
    val v = col(valueCol).cast("double")
    val bin = least(greatest(floor((v - lo) / w).cast("int"), lit(0)),
      lit(bins - 1))
    val counts = df.filter(v.isNotNull && v >= lo && v <= hi)
      .groupBy(bin.as("bin")).agg(count(lit(1)).as("n"))
    val spark = df.sparkSession
    import spark.implicits._
    val all = (0 until bins).toDF("bin")
    all.join(counts, Seq("bin"), "left")
      .select(col("bin"),
        round(lit(lo) + col("bin") * w, 6).as("bin_lo"),
        round(lit(lo) + (col("bin") + 1) * w, 6).as("bin_hi"),
        coalesce(col("n"), lit(0L)).as("n"))
  }

  /** [[histogram]] per group: one aggregate over (group, bin), the
    * empty buckets materialized RELATIONALLY (distinct groups ×
    * generated bins — no driver collect of the group domain, so the
    * group count can scale). Shared [lo, hi] so the distributions are
    * comparable across groups. */
  def histogramBy(df: DataFrame, groupCol: String, valueCol: String,
      lo: Double, hi: Double, bins: Int): DataFrame = {
    require(bins > 0 && hi > lo, s"need bins>0 and hi>lo, got $bins [$lo,$hi]")
    val w = (hi - lo) / bins
    val v = col(valueCol).cast("double")
    val bin = least(greatest(floor((v - lo) / w).cast("int"), lit(0)),
      lit(bins - 1))
    val counts = df.filter(v.isNotNull && v >= lo && v <= hi)
      .groupBy(col(groupCol), bin.as("bin")).agg(count(lit(1)).as("n"))
    val grid = df.select(col(groupCol)).distinct()
      .withColumn("bin", explode(sequence(lit(0), lit(bins - 1))))
    grid.join(counts, Seq(groupCol, "bin"), "left")
      .select(col(groupCol), col("bin"),
        round(lit(lo) + col("bin") * w, 6).as("bin_lo"),
        round(lit(lo) + (col("bin") + 1) * w, 6).as("bin_hi"),
        coalesce(col("n"), lit(0L)).as("n"))
  }
}
