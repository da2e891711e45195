package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{AsOf, Dedup, Upsert}
import graft.sources.Tables

/** Library-operator queries: the tier-A semantics (upsert A7, dedup A10,
  * as-of A9/B13) exercised through [[graft.operators]] and oracled with
  * plain SQL equivalents. */
object OpsQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  /** A7 insert-if-absent: target = orders with key % 3 != 0; incoming =
    * all orders re-priced. Existing keys keep their original price. */
  private val q36 = Q(
    "q36_upsert_insert_absent",
    (s, dir) => {
      import s.implicits._
      val base = t(s, dir, "orders")
        .select($"o_orderkey", $"o_totalprice", $"o_orderstatus")
      val target = base.filter($"o_orderkey" % 3 =!= 0)
      val incoming = base.select(
        $"o_orderkey", ($"o_totalprice" + 1000.0).as("o_totalprice"), $"o_orderstatus")
      Upsert.insertIfAbsent(target, incoming, Seq("o_orderkey"))
        .orderBy($"o_orderkey")
    },
    Some("""WITH target AS (
        SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders WHERE o_orderkey % 3 <> 0),
      incoming AS (
        SELECT o_orderkey, o_totalprice + 1000.0 AS o_totalprice, o_orderstatus FROM orders)
      SELECT * FROM target
      UNION ALL
      SELECT * FROM incoming WHERE o_orderkey NOT IN (SELECT o_orderkey FROM target)
      ORDER BY o_orderkey"""))

  /** Type-1 upsert: incoming wins on conflict. */
  private val q37 = Q(
    "q37_upsert_last_wins",
    (s, dir) => {
      import s.implicits._
      val base = t(s, dir, "orders")
        .select($"o_orderkey", $"o_totalprice", $"o_orderstatus")
      val target = base
      val incoming = base.filter($"o_orderkey" % 5 === 0).select(
        $"o_orderkey", ($"o_totalprice" * 2.0).as("o_totalprice"), lit("U").as("o_orderstatus"))
      Upsert.lastWins(target, incoming, Seq("o_orderkey"))
        .orderBy($"o_orderkey")
    },
    Some("""WITH incoming AS (
        SELECT o_orderkey, o_totalprice * 2.0 AS o_totalprice, 'U' AS o_orderstatus
        FROM orders WHERE o_orderkey % 5 = 0)
      SELECT * FROM incoming
      UNION ALL
      SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
      WHERE o_orderkey NOT IN (SELECT o_orderkey FROM incoming)
      ORDER BY o_orderkey"""))

  /** A10/C1 deterministic last-wins dedup: latest event per
    * (user_id, event_type). */
  private val q38 = Q(
    "q38_dedup_last_wins",
    (s, dir) => {
      import s.implicits._
      Dedup.lastWins(t(s, dir, "events"),
          Seq("user_id", "event_type"), Seq("ts", "event_id"))
        .select($"user_id", $"event_type", $"event_id", $"ts", $"value")
        .orderBy($"user_id", $"event_type")
    },
    Some("""SELECT user_id, event_type, event_id, ts, value FROM (
      SELECT user_id, event_type, event_id, ts, value,
        ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn
      FROM events) WHERE rn = 1
      ORDER BY user_id, event_type"""))

  /** B13 as-of join through the engine's custom whole-operator plan
    * (AsOfJoinNode → AsOfJoinMergeExec: co-partitioned sorted children +
    * single forward merge; see graft/plans). The union+window library
    * formulation is equality-tested against it in OperatorsSpec. Oracle
    * uses DuckDB's native ASOF JOIN. */
  private val q39 = Q(
    "q39_asof_join",
    (s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"event_id", $"user_id", $"ts", $"value")
      val clicks = ev.filter($"event_type" === "click")
        .select($"user_id", $"ts", $"event_id".as("click_event_id"))
      AsOf.asofJoinMerge(purchases, clicks, Seq("user_id"), "ts", "ts", "click_")
        .select($"event_id", $"user_id", $"ts", $"value",
          $"click_ts", $"click_click_event_id".as("click_event_id"))
        .orderBy($"event_id")
    },
    Some("""SELECT l.event_id, l.user_id, l.ts, l.value,
        r.ts AS click_ts, r.event_id AS click_event_id
      FROM (SELECT * FROM events WHERE event_type = 'purchase') l
      ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') r
        ON l.user_id = r.user_id AND r.ts <= l.ts
      ORDER BY l.event_id"""))

  /** A9 point as-of: latest event per user at-or-before a fixed t
    * (the reference's DESC+Limit-1 read, /root/reference/index.js:305-314). */
  private val q40 = Q(
    "q40_asof_point",
    (s, dir) => {
      import s.implicits._
      AsOf.latestAsOf(t(s, dir, "events"), Seq("user_id"), "ts",
          "2024-01-15 00:00:00", tieBreak = Seq("event_id"))
        .select($"user_id", $"event_id", $"ts", $"event_type", $"value")
        .orderBy($"user_id")
    },
    Some("""SELECT user_id, event_id, ts, event_type, value FROM (
      SELECT user_id, event_id, ts, event_type, value,
        ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events WHERE ts <= TIMESTAMP '2024-01-15 00:00:00') WHERE rn = 1
      ORDER BY user_id"""))

  /** Skew-mitigated two-stage aggregation ([[graft.operators.Skew]]
    * — the 100 TB hot-key path): partial combine on (key, salt), final
    * combine on key. Result must equal the plain GROUP BY, which is what
    * the oracle checks. The price sum rides as integer cents so the
    * two-stage recombination is order-independent and exact. */
  private val q66 = Q(
    "q66_salted_agg",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.types.DecimalType
      val li = t(s, dir, "lineitem")
        .withColumn("cents",
          ($"l_extendedprice".cast(DecimalType(18, 2)) * 100).cast("long"))
      graft.operators.Skew.saltedAgg(li, Seq("l_returnflag"),
          Map(
            "sum_cents" -> (("sum", "cents")),
            "n" -> (("count", "cents")),
            "min_qty" -> (("min", "l_quantity")),
            "max_qty" -> (("max", "l_quantity"))),
          salt = 16)
        .select($"l_returnflag", ($"sum_cents" / 100.0).as("sum_price"),
          $"n", $"min_qty", $"max_qty")
        .orderBy($"l_returnflag")
    },
    Some("""SELECT l_returnflag,
      CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) / 100.0 AS sum_price,
      COUNT(*) AS n, MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** B13 forward as-of with tolerance ([[AsOf.asofJoin]] direction =
    * forward): for each purchase, the EARLIEST click at-or-after it,
    * nulled when more than 30 minutes later — the merge_asof surface
    * beyond the reference's backward lookup. Right side pre-deduped to
    * one row per (user, ts) so both engines pick the same row at ties. */
  private val q112 = Q(
    "q112_asof_forward_tolerance",
    (s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"event_id", $"user_id", $"ts", $"value")
      val clicks = Dedup.lastWins(
        ev.filter($"event_type" === "click")
          .select($"user_id", $"ts", $"event_id".as("click_event_id")),
        Seq("user_id", "ts"), Seq("click_event_id"))
      AsOf.asofJoin(purchases, clicks, Seq("user_id"), "ts", "ts", "next_",
          direction = "forward",
          tolerance = Some(expr("INTERVAL 30 MINUTES")))
        .select($"event_id", $"user_id", $"ts", $"value",
          $"next_ts", $"next_click_event_id".as("next_click_id"))
        .orderBy($"event_id")
    },
    Some("""WITH c AS (SELECT user_id, ts, MAX(event_id) AS click_event_id
        FROM events WHERE event_type = 'click' GROUP BY user_id, ts),
      j AS (SELECT l.event_id, l.user_id, l.ts, l.value,
          r.ts AS rts, r.click_event_id AS rid
        FROM (SELECT * FROM events WHERE event_type = 'purchase') l
        ASOF LEFT JOIN c r ON l.user_id = r.user_id AND l.ts <= r.ts)
      SELECT event_id, user_id, ts, value,
        CASE WHEN rts <= ts + INTERVAL 30 MINUTE THEN rts END AS next_ts,
        CASE WHEN rts <= ts + INTERVAL 30 MINUTE THEN rid END AS next_click_id
      FROM j ORDER BY event_id"""))

  /** B13 nearest as-of ([[AsOf.asofJoin]] direction = nearest): the
    * closer of the backward and forward matches, ties to backward
    * (pandas merge_asof semantics). The oracle composes two DuckDB
    * ASOF joins and replays the strict-< choice. */
  private val q113 = Q(
    "q113_asof_nearest",
    (s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"event_id", $"user_id", $"ts", $"value")
      val clicks = Dedup.lastWins(
        ev.filter($"event_type" === "click")
          .select($"user_id", $"ts", $"event_id".as("click_event_id")),
        Seq("user_id", "ts"), Seq("click_event_id"))
      AsOf.asofJoin(purchases, clicks, Seq("user_id"), "ts", "ts", "near_",
          direction = "nearest")
        .select($"event_id", $"user_id", $"ts", $"value",
          $"near_ts", $"near_click_event_id".as("near_click_id"))
        .orderBy($"event_id")
    },
    Some("""WITH c AS (SELECT user_id, ts, MAX(event_id) AS click_event_id
        FROM events WHERE event_type = 'click' GROUP BY user_id, ts),
      p AS (SELECT * FROM events WHERE event_type = 'purchase'),
      b AS (SELECT l.event_id, r.ts AS bts, r.click_event_id AS bid
        FROM p l ASOF LEFT JOIN c r ON l.user_id = r.user_id AND l.ts >= r.ts),
      f AS (SELECT l.event_id, r.ts AS fts, r.click_event_id AS fid
        FROM p l ASOF LEFT JOIN c r ON l.user_id = r.user_id AND l.ts <= r.ts)
      SELECT p.event_id, p.user_id, p.ts, p.value,
        CASE WHEN bts IS NULL THEN fts WHEN fts IS NULL THEN bts
             WHEN (epoch_us(fts) - epoch_us(p.ts)) < (epoch_us(p.ts) - epoch_us(bts))
               THEN fts ELSE bts END AS near_ts,
        CASE WHEN bts IS NULL THEN fid WHEN fts IS NULL THEN bid
             WHEN (epoch_us(fts) - epoch_us(p.ts)) < (epoch_us(p.ts) - epoch_us(bts))
               THEN fid ELSE bid END AS near_click_id
      FROM p LEFT JOIN b USING (event_id) LEFT JOIN f USING (event_id)
      ORDER BY p.event_id"""))

  def qs: Seq[Q] = Seq(q36, q37, q38, q39, q40, q66, q112, q113)
}
