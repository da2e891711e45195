package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** SURVEY §2 B6/B10 extensions added in round 2: exact percentiles,
  * bivariate statistics, edit-distance fuzzy matching, pivot/unpivot
  * reshaping. All DuckDB-oracled.
  *
  * Numeric policy (same as Relational/Relational2): aggregates whose FP
  * accumulation order differs between engines are either computed over
  * small-magnitude columns (so double error stays far below the rounding
  * grain) and rounded, or kept exact via decimal internals.
  */
object Relational3 {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  /** B6 exact interpolated percentiles, computed by GROUPED histogram
    * narrowing ([[graft.operators.ExactQuantile.quantilesByGroup]]) —
    * bit-identical to Spark `percentile` ≡ DuckDB `quantile_cont` (same
    * (n-1)·q interpolation) but with O(bins) task memory instead of the
    * built-in's per-group value buffer, which at 100× data would hold
    * ~10⁸ doubles for one `l_returnflag` group. `n` counts non-null
    * prices (none are null, matching the oracle's COUNT(*)). */
  private val q20 = Q(
    "q20_percentiles",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      val qty = graft.operators.ExactQuantile.quantilesByGroup(
        li, Seq("l_returnflag"), "l_quantity", Seq(0.5), Seq("med_qty"))
      val price = graft.operators.ExactQuantile.quantilesByGroup(
        li, Seq("l_returnflag"), "l_extendedprice", Seq(0.25, 0.75, 0.95),
        Seq("p25_price", "p75_price", "p95_price"), countCol = Some("n"))
      qty.join(price, Seq("l_returnflag"))
        .select(col("l_returnflag"), col("med_qty"), col("p25_price"),
          col("p75_price"), col("p95_price"), col("n"))
        .orderBy(col("l_returnflag"))
    },
    Some("""SELECT l_returnflag,
      CAST(quantile_cont(l_quantity, 0.5) AS DOUBLE) AS med_qty,
      CAST(quantile_cont(l_extendedprice, 0.25) AS DOUBLE) AS p25_price,
      CAST(quantile_cont(l_extendedprice, 0.75) AS DOUBLE) AS p75_price,
      CAST(quantile_cont(l_extendedprice, 0.95) AS DOUBLE) AS p95_price,
      COUNT(*) AS n
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** B6 bivariate/second-moment statistics. Columns are small-magnitude
    * (quantity ≤ 50, discount/tax ≤ 0.1) so the engines' differing
    * accumulation orders agree to ~1e-12 abs; outputs are rounded to 6 dp
    * — far above the FP noise, far below the signal. */
  private val q21 = Q(
    "q21_corr_stats",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .groupBy($"l_linestatus")
        .agg(
          round(corr($"l_quantity", $"l_extendedprice"), 6).as("corr_qty_price"),
          round(covar_samp($"l_quantity", $"l_discount"), 6).as("covar_qty_disc"),
          round(covar_pop($"l_quantity", $"l_discount"), 6).as("covarp_qty_disc"),
          round(stddev_samp($"l_discount"), 6).as("sd_disc"),
          round(stddev_pop($"l_discount"), 6).as("sdp_disc"),
          round(var_samp($"l_tax"), 6).as("var_tax"),
          round(var_pop($"l_tax"), 6).as("varp_tax"),
          count(lit(1)).as("n"))
        .orderBy($"l_linestatus")
    },
    Some("""SELECT l_linestatus,
      ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
      ROUND(covar_samp(l_quantity, l_discount), 6) AS covar_qty_disc,
      ROUND(covar_pop(l_quantity, l_discount), 6) AS covarp_qty_disc,
      ROUND(stddev_samp(l_discount), 6) AS sd_disc,
      ROUND(stddev_pop(l_discount), 6) AS sdp_disc,
      ROUND(var_samp(l_tax), 6) AS var_tax,
      ROUND(var_pop(l_tax), 6) AS varp_tax,
      COUNT(*) AS n
      FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus"""))

  /** B10/C2 edit-distance fuzzy matching: all part-name pairs in a fixed
    * id window within Levenshtein ≤ 3 (0 = identical names) — the string-similarity dedup
    * flavor (complements token-set Jaccard q46 / MinHash q47). The id
    * window keeps the pair count bounded at every SF. */
  private val q22 = Q(
    "q22_edit_distance",
    (s, dir) => {
      import s.implicits._
      val p = t(s, dir, "part")
        .filter($"p_partkey" <= 100)
        .select($"p_partkey", lower($"p_name").as("nm"))
      p.as("a").join(p.as("b"), $"a.p_partkey" < $"b.p_partkey")
        .select(
          $"a.p_partkey".as("a_id"), $"b.p_partkey".as("b_id"),
          levenshtein($"a.nm", $"b.nm").cast("long").as("dist"))
        .filter($"dist" <= 3)
        .orderBy($"a_id", $"b_id")
    },
    Some("""SELECT a.p_partkey AS a_id, b.p_partkey AS b_id,
        CAST(levenshtein(lower(a.p_name), lower(b.p_name)) AS BIGINT) AS dist
      FROM part a JOIN part b ON a.p_partkey < b.p_partkey
      WHERE a.p_partkey <= 100 AND b.p_partkey <= 100
        AND levenshtein(lower(a.p_name), lower(b.p_name)) <= 3
      ORDER BY a_id, b_id"""))

  /** B6 PIVOT: order counts by priority × status, statuses as columns. */
  private val q23 = Q(
    "q23_pivot",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .groupBy($"o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select($"o_orderpriority",
          coalesce($"F", lit(0L)).as("n_f"),
          coalesce($"O", lit(0L)).as("n_o"),
          coalesce($"P", lit(0L)).as("n_p"))
        .orderBy($"o_orderpriority")
    },
    Some("""SELECT o_orderpriority,
      COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
      COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
      COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** B3 UNPIVOT (melt): wide part metrics → long (id, metric, value). */
  private val q24 = Q(
    "q24_unpivot",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "part")
        .select($"p_partkey",
          $"p_size".cast("double").as("p_size"), $"p_retailprice")
        .unpivot(
          Array(col("p_partkey")),
          Array(col("p_size"), col("p_retailprice")),
          "metric", "value")
        .orderBy($"p_partkey", $"metric")
    },
    Some("""SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
      UNION ALL
      SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS value FROM part
      ORDER BY p_partkey, metric"""))

  /** B6 approx_percentile (Greenwald-Khanna sketch) — like q35's HLL,
    * the raw sketch value is engine-specific, so the hashed output is the
    * exact percentile plus a bounded-error check of the sketch against
    * it: rank error ≤ n/accuracy ⇒ with accuracy=10000 the approx p50
    * must land well inside the exact [p25, p75] band; we assert it lands
    * within 10% of the IQR around the exact median. Deterministic — the
    * sketch is deterministic for fixed data. */
  private val q70 = Q(
    "q70_approx_percentile",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          percentile($"l_extendedprice",
            typedLit(Seq(0.25, 0.5, 0.75))).as("__ex"),
          approx_percentile($"l_extendedprice", lit(0.5), lit(10000)).as("__ap"),
          count(lit(1)).as("n"))
        .select($"l_returnflag",
          element_at($"__ex", 2).as("exact_p50"),
          (abs($"__ap" - element_at($"__ex", 2)) <=
            (element_at($"__ex", 3) - element_at($"__ex", 1)) * 0.1).as("approx_ok"),
          $"n")
        .orderBy($"l_returnflag")
    },
    Some("""SELECT l_returnflag,
      CAST(quantile_cont(l_extendedprice, 0.5) AS DOUBLE) AS exact_p50,
      TRUE AS approx_ok, COUNT(*) AS n
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Training-pipeline subsampling: seeded stratified sample
    * (`sampleBy` per document source). Per-row membership is
    * engine-internal (seeded Bernoulli), so the oracle checks the
    * deterministic *properties*: stratum totals, and the sampled count
    * landing inside a generous Chernoff band around fraction·total (the
    * sample is deterministic for a fixed seed, so the band check is
    * stable, not flaky). Strata are derived from the data — `sampleBy`
    * needs a driver-side fractions map, and the stratum domain is small
    * by definition (it's a grouping key), so the distinct-collect is a
    * metadata-sized read, not a data read. */
  private val q71 = Q(
    "q71_stratified_sample",
    (s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val fractions = docs.select($"source").distinct()
        .as[String].collect().map(_ -> 0.5).toMap
      val sampled = docs.stat.sampleBy("source", fractions, seed = 42L)
        .groupBy($"source").agg(count(lit(1)).as("n_sampled"))
      docs.groupBy($"source").agg(count(lit(1)).as("n_total"))
        .join(sampled, Seq("source"), "left")
        .select($"source", $"n_total",
          (coalesce($"n_sampled", lit(0L)) >= $"n_total" * 0.15 &&
            coalesce($"n_sampled", lit(0L)) <= $"n_total" * 0.85).as("in_band"))
        .orderBy($"source")
    },
    Some("""SELECT source, COUNT(*) AS n_total, TRUE AS in_band
      FROM documents GROUP BY source ORDER BY source"""))

  /** B7 ranking-window battery: ntile, percent_rank, cume_dist,
    * nth_value — identical definitions in DuckDB. The (price, key) order
    * is collision-free, so every rank is deterministic. */
  private val q72 = Q(
    "q72_rank_windows",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"o_orderstatus")
        .orderBy($"o_totalprice", $"o_orderkey")
      t(s, dir, "orders")
        .filter($"o_orderkey" <= 2000)
        .select($"o_orderkey", $"o_orderstatus", $"o_totalprice",
          ntile(4).over(w).cast("long").as("quartile"),
          round(percent_rank().over(w), 9).as("pct_rank"),
          round(cume_dist().over(w), 9).as("cume"),
          nth_value($"o_orderkey", 2).over(
            w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
            .as("second_cheapest"))
        .orderBy($"o_orderkey")
    },
    Some("""SELECT o_orderkey, o_orderstatus, o_totalprice,
      CAST(ntile(4) OVER w AS BIGINT) AS quartile,
      ROUND(percent_rank() OVER w, 9) AS pct_rank,
      ROUND(cume_dist() OVER w, 9) AS cume,
      nth_value(o_orderkey, 2) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
        AND UNBOUNDED FOLLOWING) AS second_cheapest
      FROM orders WHERE o_orderkey <= 2000
      WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
      ORDER BY o_orderkey"""))

  /** B6 boolean/conditional aggregates: bool_and, bool_or, count_if —
    * same names and semantics in DuckDB. */
  private val q73 = Q(
    "q73_bool_aggs",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          bool_and($"l_discount" <= 0.1).as("all_small_disc"),
          bool_or($"l_quantity" >= 50).as("any_bulk"),
          count_if($"l_tax" === 0.0).as("n_taxfree"),
          count_if($"l_quantity" > 25).as("n_large"),
          count(lit(1)).as("n"))
        .orderBy($"l_returnflag")
    },
    Some("""SELECT l_returnflag,
      bool_and(l_discount <= 0.1) AS all_small_disc,
      bool_or(l_quantity >= 50) AS any_bulk,
      CAST(count_if(l_tax = 0.0) AS BIGINT) AS n_taxfree,
      CAST(count_if(l_quantity > 25) AS BIGINT) AS n_large,
      COUNT(*) AS n
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  def qs: Seq[Q] = Seq(q20, q21, q22, q23, q24, q70, q71, q72, q73)
}
