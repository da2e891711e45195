package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.operators.Dedup
import graft.sources.Tables

/** SURVEY §2 B14: streaming capability, batch-oracled. Each query runs the
  * exact aggregation a Structured Streaming job would run (same window
  * functions, same output schema) in batch mode over events — the oracle
  * checks semantics; StreamingSpec runs the same plans through
  * readStream/writeStream and asserts batch ≡ stream. */
object StreamingQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)
  private def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 2))

  /** Tumbling 1-hour window per event type. */
  private val q60 = Q(
    "q60_tumbling_window",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
        .agg(count(lit(1)).as("n"), sum(dec($"value")).cast("double").as("sum_value"))
        .select($"w.start".as("window_start"), $"event_type", $"n", $"sum_value")
        .orderBy($"window_start", $"event_type")
    },
    Some("""SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
      COUNT(*) AS n,
      CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1, 2 ORDER BY window_start, event_type"""))

  /** Sliding 1-hour window, 30-minute step (each event lands in 2 windows). */
  private val q61 = Q(
    "q61_sliding_window",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .groupBy(window($"ts", "1 hour", "30 minutes").as("w"))
        .agg(count(lit(1)).as("n"))
        .select($"w.start".as("window_start"), $"n")
        .orderBy($"window_start")
    },
    Some("""SELECT window_start, COUNT(*) AS n FROM (
      SELECT unnest([time_bucket(INTERVAL '30 minutes', ts),
                     time_bucket(INTERVAL '30 minutes', ts) - INTERVAL 30 MINUTE]) AS window_start
      FROM events)
      GROUP BY window_start ORDER BY window_start"""))

  /** Session windows (30-minute gap) per user; oracle is the classic
    * gaps-and-islands rewrite. */
  private val q62 = Q(
    "q62_session_window",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .groupBy(session_window($"ts", "30 minutes").as("w"), $"user_id")
        .agg(count(lit(1)).as("n_events"),
          sum(dec($"value")).cast("double").as("sum_value"))
        .select($"user_id", $"w.start".as("session_start"), $"n_events", $"sum_value")
        .orderBy($"user_id", $"session_start")
    },
    Some("""WITH m AS (
        SELECT user_id, ts, value,
          CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
            OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) > INTERVAL '30 minutes'
            THEN 1 ELSE 0 END AS brk
        FROM events),
      sess AS (SELECT user_id, ts, value,
        SUM(brk) OVER (PARTITION BY user_id ORDER BY ts) AS sid FROM m)
      SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      FROM sess GROUP BY user_id, sid
      ORDER BY user_id, session_start"""))

  /** Streaming dropDuplicates semantics (first occurrence wins by event
    * time) in batch form. */
  private val q63 = Q(
    "q63_stream_dedup_first",
    (s, dir) => {
      import s.implicits._
      Dedup.firstWins(t(s, dir, "events"),
          Seq("user_id", "event_type"), Seq("ts", "event_id"))
        .select($"user_id", $"event_type", $"event_id", $"ts")
        .orderBy($"user_id", $"event_type")
    },
    Some("""SELECT user_id, event_type, event_id, ts FROM (
      SELECT user_id, event_type, event_id, ts,
        ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
      FROM events) WHERE rn = 1
      ORDER BY user_id, event_type"""))

  /** B14/B15 custom streaming state: per-user running stats via
    * `mapGroupsWithState` ([[graft.streaming.StatefulStats]]). Spark
    * executes the same stateful plan in batch mode (empty initial state),
    * so the Verify path exercises the real operator; StreamingSpec runs
    * it through readStream and asserts stream ≡ batch. Values ride as
    * integer cents — the accumulator must commute because group-iterator
    * order is unspecified. */
  private val q64 = Q(
    "q64_stateful_stats",
    (s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
        .select($"user_id",
          ($"value".cast(DecimalType(18, 2)) * 100).cast("long").as("cents"))
        .as[graft.streaming.StatefulStats.UserEventC]
      graft.streaming.StatefulStats.runningStatsCents(ev)
        .toDF()
        .select($"user_id", $"n", ($"sum_cents" / 100.0).as("sum_value"))
        .orderBy($"user_id")
    },
    Some("""SELECT user_id, COUNT(*) AS n,
      CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) / 100.0 AS sum_value
      FROM events GROUP BY user_id ORDER BY user_id"""))

  /** B14 change detection (`flatMapGroupsWithState`,
    * [[graft.streaming.ChangeDetect]]): emit an event only when the
    * user's value changed — the reference's change-before-write TODO
    * (index.js:272 / checkClientPrices index.js:63-79) as a stateful
    * streaming operator, batch-executed for the gate. Oracle = the LAG
    * window formulation. */
  private val q68 = Q(
    "q68_change_detect",
    (s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
        .select($"user_id", $"event_id", $"ts",
          ($"value".cast(DecimalType(18, 2)) * 100).cast("long").as("cents"))
        .as[graft.streaming.ChangeDetect.Ev]
      graft.streaming.ChangeDetect.changes(ev)
        .toDF()
        .orderBy($"user_id", $"ts", $"event_id")
    },
    Some("""WITH e AS (
        SELECT user_id, event_id, ts,
          CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        FROM events),
      w AS (
        SELECT user_id, event_id, ts, cents,
          LAG(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        FROM e)
      SELECT user_id, event_id, ts, cents, prev AS prev_cents
      FROM w WHERE prev IS NULL OR prev <> cents
      ORDER BY user_id, ts, event_id"""))

  /** B14 stream-stream interval join: attribute each purchase to every
    * click by the same user in the preceding hour — the canonical
    * two-stream event-time join. Batch executes the identical plan (an
    * equi-join on user_id with the time-range residual, NOT a nested
    * loop); StreamingSpec runs the same join through two readStreams
    * with watermarks, where the two-sided time bound is what lets Spark
    * evict join state. */
  private val q77 = Q(
    "q77_stream_interval_join",
    (s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
      val clicks = ev.filter($"event_type" === "click")
        .select($"user_id", $"event_id".as("click_id"), $"ts".as("click_ts"))
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"user_id", $"event_id".as("purchase_id"), $"ts".as("purchase_ts"))
      purchases.join(clicks, Seq("user_id"))
        .filter($"purchase_ts" >= $"click_ts" &&
          $"purchase_ts" <= $"click_ts" + expr("INTERVAL 1 HOUR"))
        .select($"user_id", $"purchase_id", $"click_id", $"purchase_ts", $"click_ts")
        .orderBy($"user_id", $"purchase_id", $"click_id")
    },
    Some("""SELECT p.user_id, p.event_id AS purchase_id, c.event_id AS click_id,
        p.ts AS purchase_ts, c.ts AS click_ts
      FROM events p JOIN events c
        ON p.user_id = c.user_id
        AND p.event_type = 'purchase' AND c.event_type = 'click'
        AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
      ORDER BY p.user_id, purchase_id, click_id"""))

  /** B14 stream-stream LEFT OUTER interval join — q77 plus the
    * unmatched-purchase rows (null click), the outer-join semantics
    * Structured Streaming only emits once the watermark proves no
    * match can still arrive. Declared here in its batch form (the
    * oracle); StreamingSpec runs the true two-readStream form with
    * watermarks + a sentinel to close the tail and asserts equality.
    * Null click_id orders NULLS FIRST on both engines (spelled out —
    * DuckDB defaults NULLS LAST). */
  private val q125 = Q(
    "q125_stream_leftouter_join",
    (s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
      val clicks = ev.filter($"event_type" === "click")
        .select($"user_id", $"event_id".as("click_id"), $"ts".as("click_ts"))
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"user_id", $"event_id".as("purchase_id"), $"ts".as("purchase_ts"))
      purchases.as("p").join(clicks.as("c"),
          $"p.user_id" === $"c.user_id" &&
            $"purchase_ts" >= $"click_ts" &&
            $"purchase_ts" <= $"click_ts" + expr("INTERVAL 1 HOUR"),
          "left_outer")
        .select($"p.user_id".as("user_id"), $"purchase_id", $"click_id",
          $"purchase_ts", $"click_ts")
        .orderBy($"user_id", $"purchase_id", $"click_id")
    },
    Some("""SELECT p.user_id, p.event_id AS purchase_id, c.event_id AS click_id,
        p.ts AS purchase_ts, c.ts AS click_ts
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        ON p.user_id = c.user_id
        AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
      ORDER BY p.user_id, purchase_id, click_id NULLS FIRST"""))

  def qs: Seq[Q] = Seq(q60, q61, q62, q63, q64, q68, q77, q125)
}
