package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch gap-sessionization (gaps-and-islands): label every EVENT with
  * its session. Complements the streaming `session_window` aggregate
  * (q62) — that collapses each session to one row; this keeps the rows
  * and attaches session ordinal, position-in-session, and offset, the
  * grouping step for conversation/trajectory training sequences,
  * funnels, and attribution. Generalizes the reference's per-station
  * time-ordered price history (`/root/reference/index.js:305-314`).
  *
  * Scale shape: ONE shuffle (hash on `userCol`). The lag, the running
  * break-sum, the per-session min/count, and the intra-session
  * row_number all run inside that exchange — the (user, session_seq)
  * windows only add a local sort, because HashPartitioning(user)
  * already satisfies their required ClusteredDistribution. Per-user
  * history is assumed executor-sized (bounded entity history), the
  * same assumption Spark's own session_window makes.
  */
object Sessionize {

  /** Assign sessions split by `> gapSeconds` of event-time silence.
    *
    * Adds: `session_seq` (1-based per-user session ordinal),
    * `event_seq` (1-based position within the session),
    * `session_start`, `session_events`, `micros_into_session`.
    * Ordering inside a user is by (`tsCol`, `tieCol`) — the tie column
    * makes the labeling deterministic under equal timestamps.
    */
  def assignSessions(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      tieCol: String,
      gapSeconds: Long): DataFrame = {
    val user = col(userCol); val ts = col(tsCol); val tie = col(tieCol)
    val byTime = Window.partitionBy(user).orderBy(ts, tie)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prevTs = lag(ts, 1).over(Window.partitionBy(user).orderBy(ts, tie))
    val brk = when(
      prevTs.isNull ||
        unix_micros(ts) - unix_micros(prevTs) > gapSeconds * 1000000L,
      1L).otherwise(0L)
    val sess = Window.partitionBy(user, col("session_seq"))
    events
      .withColumn("session_seq", sum(brk).over(byTime))
      .withColumn("event_seq",
        row_number().over(Window.partitionBy(user, col("session_seq")).orderBy(ts, tie)))
      .withColumn("session_start", min(ts).over(sess))
      .withColumn("session_events", count(lit(1)).over(sess))
      .withColumn("micros_into_session",
        unix_micros(ts) - unix_micros(col("session_start")))
  }
}
