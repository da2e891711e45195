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

  /** B7 TIME-RANGE window frame (the rolling-aggregate capability rows
    * frames can't express): per-user trailing 1-hour event count and
    * value sum — `rangeBetween` over unix micros in Spark, `RANGE
    * BETWEEN INTERVAL 1 HOUR PRECEDING` in the oracle; identical
    * inclusive-boundary and ts-tie (peer-row) semantics. The sum rides
    * DECIMAL so the unordered in-frame accumulation is exact (doubles
    * would make the window nondeterministic across engines). Scale:
    * keyed window, frame state is O(events in 1h per user). */
  private val q121 = Q(
    "q121_range_window",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"user_id")
        .orderBy(unix_micros($"ts"))
        .rangeBetween(-3600L * 1000000L, Window.currentRow)
      t(s, dir, "events")
        .select($"event_id", $"user_id", $"ts", $"value")
        .withColumn("n_1h", count(lit(1)).over(w))
        .withColumn("sum_1h",
          sum($"value".cast("decimal(18,2)")).over(w).cast("double"))
        .select($"event_id", $"user_id", $"n_1h", $"sum_1h")
        .orderBy($"event_id")
    },
    Some("""SELECT event_id, user_id,
        COUNT(*) OVER w AS n_1h,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_1h
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts
        RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
      ORDER BY event_id"""))

  /** B7/B6 conversion funnel over the event stream: per user, the
    * first signup, the first click within 48h AFTER it, the first
    * purchase within 24h after THAT (strict ordering with per-stage
    * conversion windows — unbounded stages all converge to stage 3 on
    * this fixture), rolled up to users-reaching-stage counts and the
    * mean signup→purchase latency. Three keyed aggregates + two
    * broadcast-sized joins (the per-user stage table is one row per
    * user); timestamps compare in exact micros, the latency mean is
    * an exact integer sum with one final double division. */
  private val q122 = Q(
    "q122_funnel",
    (s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
        .select($"user_id", $"event_type", $"ts")
      val t1 = ev.filter($"event_type" === "signup")
        .groupBy($"user_id").agg(min($"ts").as("t1"))
      val t2 = ev.filter($"event_type" === "click").join(t1, "user_id")
        .filter($"ts" > $"t1" &&
          unix_micros($"ts") <= unix_micros($"t1") + 48L * 3600 * 1000000)
        .groupBy($"user_id", $"t1").agg(min($"ts").as("t2"))
      val t3 = ev.filter($"event_type" === "purchase").join(t2, "user_id")
        .filter($"ts" > $"t2" &&
          unix_micros($"ts") <= unix_micros($"t2") + 24L * 3600 * 1000000)
        .groupBy($"user_id", $"t1", $"t2").agg(min($"ts").as("t3"))
      val stages = t1
        .join(t2.select($"user_id", $"t2"), Seq("user_id"), "left")
        .join(t3.select($"user_id", $"t3"), Seq("user_id"), "left")
        .withColumn("stage",
          when($"t3".isNotNull, 3).when($"t2".isNotNull, 2).otherwise(1))
      stages.groupBy($"stage")
        .agg(count(lit(1)).as("n_users"),
          (sum(when($"stage" === 3,
              unix_micros($"t3") - unix_micros($"t1"))).cast("double")
            / count(when($"stage" === 3, 1)) / 1000000.0).as("avg_secs_to_purchase"))
        .orderBy($"stage")
    },
    Some("""WITH t1 AS (SELECT user_id, MIN(ts) AS t1 FROM events
        WHERE event_type = 'signup' GROUP BY user_id),
      t2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
        JOIN t1 ON t1.user_id = e.user_id AND e.ts > t1.t1
          AND epoch_us(e.ts) <= epoch_us(t1.t1) + CAST(48 AS BIGINT) * 3600 * 1000000
        WHERE e.event_type = 'click' GROUP BY e.user_id),
      t3 AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
        JOIN t2 ON t2.user_id = e.user_id AND e.ts > t2.t2
          AND epoch_us(e.ts) <= epoch_us(t2.t2) + CAST(24 AS BIGINT) * 3600 * 1000000
        WHERE e.event_type = 'purchase' GROUP BY e.user_id),
      st AS (SELECT t1.user_id, t1.t1, t3.t3,
          CASE WHEN t3.t3 IS NOT NULL THEN 3
               WHEN t2.t2 IS NOT NULL THEN 2 ELSE 1 END AS stage
        FROM t1
        LEFT JOIN t2 ON t2.user_id = t1.user_id
        LEFT JOIN t3 ON t3.user_id = t1.user_id)
      SELECT stage, COUNT(*) AS n_users,
        CAST(SUM(CASE WHEN stage = 3
            THEN epoch_us(t3) - epoch_us(t1) END) AS DOUBLE)
          / COUNT(CASE WHEN stage = 3 THEN 1 END) / 1000000.0
          AS avg_secs_to_purchase
      FROM st GROUP BY stage ORDER BY stage"""))

  /** B7 window battery 2 — the distribution/position functions q09-q12
    * and q72 don't cover: ntile quartiles, percent_rank, cume_dist
    * (rank rationals = exact-int divisions, engine-identical),
    * nth_value over the full-partition frame. Order is (acctbal DESC,
    * custkey) — unique, so every function is deterministic. */
  private val q124 = Q(
    "q124_window_battery2",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"c_mktsegment")
        .orderBy($"c_acctbal".desc, $"c_custkey")
      val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, dir, "customer")
        .select($"c_custkey", $"c_mktsegment", $"c_acctbal")
        .withColumn("quartile", ntile(4).over(w))
        .withColumn("pr", percent_rank().over(w))
        .withColumn("cd", cume_dist().over(w))
        .withColumn("runner_up_bal", nth_value($"c_acctbal", 2).over(wf))
        .orderBy($"c_custkey")
    },
    Some("""SELECT c_custkey, c_mktsegment, c_acctbal,
        NTILE(4) OVER w AS quartile,
        percent_rank() OVER w AS pr,
        cume_dist() OVER w AS cd,
        nth_value(c_acctbal, 2) OVER
          (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
          AS runner_up_bal
      FROM customer
      WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
      ORDER BY c_custkey"""))

  /** B13 resample + forward fill ([[graft.operators.AsOf.resampleFfill]]):
    * the reference's as-of price read evaluated for every user at every
    * daily grid point in ONE plan — distinct keys × exploded `sequence`
    * grid, filled by the engine's merge as-of plan (no window state, no
    * driver loop). Equal-timestamp duplicates are deduped last-wins
    * FIRST (the operator refuses them — nondeterministic fill); grid
    * points before a user's first event carry nulls. The staleness
    * column (µs since the filled observation) pins WHICH observation
    * filled each point, not just its value. Oracle: DuckDB ASOF LEFT
    * JOIN against generate_series. */
  private val q147 = Q(
    "q147_resample_ffill",
    (s, dir) => {
      import s.implicits._
      val obs = Dedup.lastWins(
          t(s, dir, "events").filter($"user_id" < 50),
          Seq("user_id", "ts"), Seq("event_id"))
        .select($"user_id", $"ts", $"value")
      AsOf.resampleFfill(obs, Seq("user_id"), "ts",
          "2024-01-01 00:00:00", "2024-01-31 00:00:00",
          expr("interval 1 day"))
        .select($"user_id", $"grid_ts", $"last_ts",
          $"last_value".as("value"),
          (unix_micros($"grid_ts") - unix_micros($"last_ts")).as("stale_us"))
        .orderBy($"user_id", $"grid_ts")
    },
    Some("""WITH f AS (SELECT * FROM events WHERE user_id < 50),
      obs AS (SELECT user_id, ts, value FROM (
        SELECT user_id, ts, value,
          ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        FROM f) WHERE rn = 1),
      grid AS (SELECT u.user_id, g.ts AS grid_ts
        FROM (SELECT DISTINCT user_id FROM obs) u
        CROSS JOIN (SELECT unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
          TIMESTAMP '2024-01-31 00:00:00', INTERVAL 1 DAY)) AS ts) g)
      SELECT g.user_id, g.grid_ts, o.ts AS last_ts, o.value,
        date_diff('microsecond', o.ts, g.grid_ts) AS stale_us
      FROM grid g ASOF LEFT JOIN obs o
        ON g.user_id = o.user_id AND o.ts <= g.grid_ts
      ORDER BY g.user_id, g.grid_ts"""))

  /** B13 resample + LINEAR INTERPOLATION
    * ([[graft.operators.AsOf.resampleInterpolate]], r10 — q147's grid
    * with time-weighted blends instead of hold-last): each daily grid
    * point carries prev + (next − prev)·(Δprev/Δspan) over its two
    * bracketing observations, computed via the `both` as-of direction
    * (ONE keyed shuffle, two window passes sharing the exchange). No
    * extrapolation: points outside a key's observed range are null.
    * The blend is one closed-form expression over epoch-microsecond
    * arithmetic, so the oracle (bracketing via LATERAL last/first
    * lookups) replays it bit-exactly — round(12) guards only the
    * final multiply-divide's last ulp across engines. */
  private val q158 = Q(
    "q158_resample_interpolate",
    (s, dir) => {
      import s.implicits._
      val obs = Dedup.lastWins(
          t(s, dir, "events").filter($"user_id" < 50),
          Seq("user_id", "ts"), Seq("event_id"))
        .select($"user_id", $"ts", $"value")
      AsOf.resampleInterpolate(obs, Seq("user_id"), "ts", "value",
          "2024-01-01 00:00:00", "2024-01-31 00:00:00",
          expr("interval 1 day"))
        .select($"user_id", $"grid_ts", $"prev_ts", $"next_ts",
          round($"interp", 12).as("interp"))
        .orderBy($"user_id", $"grid_ts")
    },
    Some("""WITH f AS (SELECT * FROM events WHERE user_id < 50),
      obs AS (SELECT user_id, ts, CAST(value AS DOUBLE) AS value FROM (
        SELECT user_id, ts, value,
          ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        FROM f) WHERE rn = 1),
      grid AS (SELECT u.user_id, g.ts AS grid_ts
        FROM (SELECT DISTINCT user_id FROM obs) u
        CROSS JOIN (SELECT unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
          TIMESTAMP '2024-01-31 00:00:00', INTERVAL 1 DAY)) AS ts) g)
      SELECT g.user_id, g.grid_ts, p.ts AS prev_ts, n.ts AS next_ts,
        round(CASE
          WHEN p.ts IS NULL OR n.ts IS NULL THEN NULL
          WHEN n.ts = p.ts THEN p.value
          ELSE p.value + (n.value - p.value) *
            (CAST(date_diff('microsecond', p.ts, g.grid_ts) AS DOUBLE) /
             CAST(date_diff('microsecond', p.ts, n.ts) AS DOUBLE))
        END, 12) AS interp
      FROM grid g
      LEFT JOIN LATERAL (SELECT ts, value FROM obs o
        WHERE o.user_id = g.user_id AND o.ts <= g.grid_ts
        ORDER BY o.ts DESC LIMIT 1) p ON true
      LEFT JOIN LATERAL (SELECT ts, value FROM obs o
        WHERE o.user_id = g.user_id AND o.ts >= g.grid_ts
        ORDER BY o.ts ASC LIMIT 1) n ON true
      ORDER BY g.user_id, g.grid_ts"""))

  /** B13/B14 INCREMENTALLY-MAINTAINED resample grid
    * ([[graft.streaming.ResampleSync]], r11 — the streaming closure of
    * q158 and the reference's as-of poller, index.js:41-59): build an
    * observation commit-log table through keyed upserts and a delete
    * (three versions), then catch a persisted interpolation GRID up
    * with the change feed ONE VERSION PER SLICE — each slice
    * re-resamples only its touched keys (the per-key delta rule; a
    * fully-retracted key leaves the grid). The output is the grid
    * TABLE, so hash equality pins that incremental maintenance lands
    * on exactly the one-shot resample of the final base state — the
    * oracle replays final-state dedup (odd event-ids win over even,
    * last-wins within a side), the delete, and q158's bracketing
    * interpolation. */
  private val q163 = Q(
    "q163_resample_sync",
    (s, dir) => {
      import s.implicits._
      import graft.sources.CommitLog
      val root = s"${System.getProperty("java.io.tmpdir")}/graft-rsync-" +
        dir.replaceAll("[^A-Za-z0-9.]", "_")
      val p = new org.apache.hadoop.fs.Path(root)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      val ev = t(s, dir, "events").filter($"user_id" < 50)
        .select($"user_id", $"ts", $"value", $"event_id")
      def side(parity: Int) = Dedup.lastWins(
          ev.filter($"event_id" % 2 === parity),
          Seq("user_id", "ts"), Seq("event_id"))
        .drop("event_id")
      val base = CommitLog(s, s"$root/obs")
      base.upsert(side(0), Seq("user_id", "ts"), CommitLog.LastWins)  // v0
      base.upsert(side(1), Seq("user_id", "ts"), CommitLog.LastWins)  // v1
      base.delete($"user_id" % 7 === 3)                               // v2
      graft.streaming.ResampleSync.catchUp(s, s"$root/obs", s"$root/grid",
        Seq("user_id"), "ts", "value",
        "2024-01-01 00:00:00", "2024-01-31 00:00:00",
        expr("interval 1 day"), interpolate = true,
        fromVersion = -1L, sliceVersions = 1L)
      CommitLog(s, s"$root/grid").read()
        .select($"user_id", $"grid_ts", $"prev_ts", $"next_ts",
          round($"interp", 12).as("interp"))
        .orderBy($"user_id", $"grid_ts")
    },
    Some("""WITH f AS (SELECT * FROM events WHERE user_id < 50),
      obs AS (SELECT user_id, ts, CAST(value AS DOUBLE) AS value FROM (
        SELECT user_id, ts, value,
          ROW_NUMBER() OVER (PARTITION BY user_id, ts
            ORDER BY (event_id % 2) DESC, event_id DESC) AS rn
        FROM f) WHERE rn = 1 AND user_id % 7 <> 3),
      grid AS (SELECT u.user_id, g.ts AS grid_ts
        FROM (SELECT DISTINCT user_id FROM obs) u
        CROSS JOIN (SELECT unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
          TIMESTAMP '2024-01-31 00:00:00', INTERVAL 1 DAY)) AS ts) g)
      SELECT g.user_id, g.grid_ts, p.ts AS prev_ts, n.ts AS next_ts,
        round(CASE
          WHEN p.ts IS NULL OR n.ts IS NULL THEN NULL
          WHEN n.ts = p.ts THEN p.value
          ELSE p.value + (n.value - p.value) *
            (CAST(date_diff('microsecond', p.ts, g.grid_ts) AS DOUBLE) /
             CAST(date_diff('microsecond', p.ts, n.ts) AS DOUBLE))
        END, 12) AS interp
      FROM grid g
      LEFT JOIN LATERAL (SELECT ts, value FROM obs o
        WHERE o.user_id = g.user_id AND o.ts <= g.grid_ts
        ORDER BY o.ts DESC LIMIT 1) p ON true
      LEFT JOIN LATERAL (SELECT ts, value FROM obs o
        WHERE o.user_id = g.user_id AND o.ts >= g.grid_ts
        ORDER BY o.ts ASC LIMIT 1) n ON true
      ORDER BY g.user_id, g.grid_ts"""))

  def qs: Seq[Q] = Seq(q36, q37, q38, q39, q40, q66, q112, q113, q121,
    q122, q124, q147, q158, q163)
}
