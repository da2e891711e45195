package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.sources.Tables

/** SURVEY §2.B relational closure, one named deterministic query per row,
  * each with a DuckDB oracle. Spark side is DataFrame API (Catalyst plans
  * it); oracle side is DuckDB dialect over the same parquet tables.
  *
  * Numeric determinism: SUMs go through DECIMAL(18,2) (exact, association-
  * free) and are cast to DOUBLE only at the output boundary — both engines
  * convert the same decimal to the same IEEE double. Per-row double
  * arithmetic (single expressions) is IEEE-deterministic and left raw.
  */
object Relational {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)
  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** B6 aggregation battery over lineitem (generalizes A13 counts; TPC-H Q1
    * shape). Ref: /root/reference/index.js:94,143 (stage counts). */
  private val q01 = Q(
    "q01_pricing_summary",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .filter($"l_shipdate" <= lit("2000-12-01").cast("timestamp"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          dec(sum(dec($"l_quantity"))).cast("double").as("sum_qty"),
          sum(dec($"l_extendedprice")).cast("double").as("sum_base_price"),
          sum(dec($"l_extendedprice") * (lit(1).cast(DecimalType(18, 2)) - dec($"l_discount")))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    },
    Some("""SELECT l_returnflag, l_linestatus,
      CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""))

  /** B4 filter battery: comparison, BETWEEN, IN, boolean logic, LIKE.
    * Generalizes A5 (null-rejecting filter, /root/reference/index.js:118-120). */
  private val q02 = Q(
    "q02_filter_predicates",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .filter(
          $"l_shipdate".between(lit("1996-01-01").cast("timestamp"), lit("1997-12-31").cast("timestamp")) &&
            $"l_discount".between(0.02, 0.09) &&
            $"l_quantity" < 25 &&
            $"l_returnflag".isin("A", "R") &&
            $"l_linestatus".isNotNull)
        .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_discount", $"l_extendedprice")
        .orderBy($"l_orderkey", $"l_linenumber")
    },
    Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_extendedprice
      FROM lineitem
      WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1997-12-31 00:00:00'
        AND l_discount BETWEEN 0.02 AND 0.09
        AND l_quantity < 25
        AND l_returnflag IN ('A','R')
        AND l_linestatus IS NOT NULL
      ORDER BY l_orderkey, l_linenumber"""))

  /** B3 projection: select/alias/computed columns/struct build+flatten.
    * Generalizes A3/A6 (/root/reference/index.js:88-91,123-133). */
  private val q03 = Q(
    "q03_project_expr",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .filter($"l_orderkey" <= 100)
        .select(
          $"l_orderkey", $"l_linenumber",
          ($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("net_price"),
          ($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax")).as("charged"),
          struct($"l_returnflag".as("flag"), $"l_linestatus".as("status")).as("st"))
        .select($"l_orderkey", $"l_linenumber", $"net_price", $"charged",
          $"st.flag".as("flag"), $"st.status".as("status"))
        .orderBy($"l_orderkey", $"l_linenumber")
    },
    Some("""SELECT l_orderkey, l_linenumber,
      l_extendedprice * (1.0 - l_discount) AS net_price,
      l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS charged,
      l_returnflag AS flag, l_linestatus AS status
      FROM lineitem WHERE l_orderkey <= 100
      ORDER BY l_orderkey, l_linenumber"""))

  /** B5 inner equi-join (broadcast dim) + B6 agg: revenue per nation.
    * Relational form of A4's lookup join (/root/reference/index.js:112-141). */
  private val q04 = Q(
    "q04_join_agg_nation",
    (s, dir) => {
      import s.implicits._
      val orders = t(s, dir, "orders")
      val customer = t(s, dir, "customer")
      val nation = t(s, dir, "nation")
      orders
        .join(customer, $"o_custkey" === $"c_custkey")
        .join(broadcast(nation), $"c_nationkey" === $"n_nationkey")
        .groupBy($"n_name")
        .agg(
          sum(dec($"o_totalprice")).cast("double").as("total_revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy($"n_name")
    },
    Some("""SELECT n_name,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue,
      COUNT(*) AS n_orders
      FROM orders JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name ORDER BY n_name"""))

  /** B5 3-way join + B8 top-n with deterministic tie-break (TPC-H Q3 shape). */
  private val q05 = Q(
    "q05_join3_topn",
    (s, dir) => {
      import s.implicits._
      val cutoff = lit("1998-01-01").cast("timestamp")
      val customer = t(s, dir, "customer").filter($"c_mktsegment" === "BUILDING")
      val orders = t(s, dir, "orders").filter($"o_orderdate" < cutoff)
      val lineitem = t(s, dir, "lineitem").filter($"l_shipdate" > cutoff)
      customer
        .join(orders, $"c_custkey" === $"o_custkey")
        .join(lineitem, $"o_orderkey" === $"l_orderkey")
        .groupBy($"o_orderkey", $"o_orderdate", $"o_orderpriority")
        .agg(sum(dec($"l_extendedprice") * (lit(1).cast(DecimalType(18, 2)) - dec($"l_discount")))
          .cast("double").as("revenue"))
        .orderBy($"revenue".desc, $"o_orderkey")
        .limit(10)
    },
    Some("""SELECT o_orderkey, o_orderdate, o_orderpriority,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      FROM customer JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY o_orderkey, o_orderdate, o_orderpriority
      ORDER BY revenue DESC, o_orderkey LIMIT 10"""))

  /** B5 left-anti join — the upsert A7's "not yet present" side
    * (/root/reference/index.js:368): customers with no orders. */
  private val q06 = Q(
    "q06_anti_join",
    (s, dir) => {
      import s.implicits._
      val pOrders = t(s, dir, "orders").filter($"o_orderstatus" === "P")
      t(s, dir, "customer")
        .join(pOrders, $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_custkey", $"c_name", $"c_mktsegment")
        .orderBy($"c_custkey")
    },
    Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
      ORDER BY c_custkey"""))

  /** B5 left-semi join: customers having at least one open ('O') order. */
  private val q07 = Q(
    "q07_semi_join",
    (s, dir) => {
      import s.implicits._
      val openOrders = t(s, dir, "orders").filter($"o_orderstatus" === "O")
      t(s, dir, "customer")
        .join(openOrders, $"c_custkey" === $"o_custkey", "left_semi")
        .select($"c_custkey", $"c_name")
        .orderBy($"c_custkey")
    },
    Some("""SELECT c_custkey, c_name FROM customer
      WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
      ORDER BY c_custkey"""))

  /** B5 left outer join + coalesce: per-order lineitem stats, orders with no
    * lines kept at 0 (A14's keep-going-on-missing semantics). */
  private val q08 = Q(
    "q08_left_join_coalesce",
    (s, dir) => {
      import s.implicits._
      val li = t(s, dir, "lineitem")
        .groupBy($"l_orderkey")
        .agg(count(lit(1)).as("n_items"), sum(dec($"l_quantity")).cast("double").as("qty"))
      t(s, dir, "orders")
        .join(li, $"o_orderkey" === $"l_orderkey", "left")
        .select(
          $"o_orderkey",
          coalesce($"n_items", lit(0L)).as("n_items"),
          coalesce($"qty", lit(0.0)).as("total_qty"))
        .orderBy($"o_orderkey")
    },
    Some("""SELECT o_orderkey,
      COALESCE(n_items, 0) AS n_items, COALESCE(qty, 0.0) AS total_qty
      FROM orders LEFT JOIN (
        SELECT l_orderkey, COUNT(*) AS n_items,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        FROM lineitem GROUP BY l_orderkey) li
      ON o_orderkey = l_orderkey
      ORDER BY o_orderkey"""))

  /** A9/B7: latest row per key via descending row_number — the reference's
    * `ScanIndexForward:false, Limit:1` read (/root/reference/index.js:305-314)
    * as a window. */
  private val q09 = Q(
    "q09_latest_per_key",
    (s, dir) => {
      import s.implicits._
      // (l_orderkey, l_linenumber) is NOT unique in the synthetic data;
      // (…, l_shipdate, l_partkey, l_suppkey) is — full tie-break chain.
      val w = Window.partitionBy($"l_orderkey")
        .orderBy($"l_shipdate".desc, $"l_linenumber".desc, $"l_partkey".desc, $"l_suppkey".desc)
      t(s, dir, "lineitem")
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"l_orderkey", $"l_linenumber", $"l_shipdate", $"l_quantity")
        .orderBy($"l_orderkey")
    },
    Some("""SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity FROM (
      SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity,
        ROW_NUMBER() OVER (PARTITION BY l_orderkey ORDER BY l_shipdate DESC, l_linenumber DESC, l_partkey DESC, l_suppkey DESC) AS rn
      FROM lineitem) WHERE rn = 1
      ORDER BY l_orderkey"""))

  /** B7 lag/lead: per-user event value deltas — the price-change detection
    * the reference TODOs at /root/reference/index.js:272. */
  private val q10 = Q(
    "q10_window_lag",
    (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      t(s, dir, "events")
        .select($"user_id", $"event_id", $"ts", $"value",
          lag($"value", 1).over(w).as("prev_value"),
          lead($"event_type", 1).over(w).as("next_type"))
        .withColumn("delta", $"value" - $"prev_value")
        .orderBy($"user_id", $"ts", $"event_id")
    },
    Some("""SELECT user_id, event_id, ts, value,
      LAG(value, 1) OVER w AS prev_value,
      LEAD(event_type, 1) OVER w AS next_type,
      value - LAG(value, 1) OVER w AS delta
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ORDER BY user_id, ts, event_id"""))

  /** B8 top-k per group with rank + unique tie-break. */
  private val q11 = Q(
    "q11_topk_per_group",
    (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"p_brand")
        .orderBy($"p_retailprice".desc, $"p_partkey")
      t(s, dir, "part")
        .withColumn("rk", row_number().over(w))
        .filter($"rk" <= 3)
        .select($"p_brand", $"rk", $"p_partkey", $"p_name", $"p_retailprice")
        .orderBy($"p_brand", $"rk")
    },
    Some("""SELECT p_brand, rk, p_partkey, p_name, p_retailprice FROM (
      SELECT p_brand, p_partkey, p_name, p_retailprice,
        ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rk
      FROM part) WHERE rk <= 3
      ORDER BY p_brand, rk"""))

  /** B7 running aggregate: cumulative spend per customer over order history
    * (frame-ordered decimal sum — exact in both engines). */
  private val q12 = Q(
    "q12_window_running",
    (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_orderdate", $"o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "orders")
        .select($"o_custkey", $"o_orderkey", $"o_orderdate",
          sum(dec($"o_totalprice")).over(w).cast("double").as("running_spend"),
          row_number().over(
            Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey"))
            .as("order_seq"))
        .orderBy($"o_custkey", $"order_seq")
    },
    Some("""SELECT o_custkey, o_orderkey, o_orderdate,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
      ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS order_seq
      FROM orders
      ORDER BY o_custkey, order_seq"""))

  def qs: Seq[Q] = Seq(q01, q02, q03, q04, q05, q06, q07, q08, q09, q10, q11, q12)
}
