package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** B14 custom streaming state: running per-user aggregates via
  * `mapGroupsWithState` — the engine's pattern for stateful semantics
  * Spark's built-in windowed aggs can't express (arbitrary per-key
  * accumulators, custom eviction). State lives in the state store
  * (checkpointed, partitioned by key) so it scales horizontally with
  * executors, exactly like the built-in streaming aggregations. */
object StatefulStats {

  case class UserEvent(user_id: Long, value: Double)
  case class UserStats(user_id: Long, n: Long, sum_value: Double)

  def update(key: Long, events: Iterator[UserEvent],
      state: GroupState[UserStats]): UserStats = {
    val prev = state.getOption.getOrElse(UserStats(key, 0L, 0.0))
    var n = prev.n
    var s = prev.sum_value
    events.foreach { e => n += 1; s += e.value }
    val next = UserStats(key, n, s)
    state.update(next)
    next
  }

  /** Streaming: one updated row per user per micro-batch. */
  def runningStats(ds: Dataset[UserEvent]): Dataset[UserStats] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(update)
  }

  /** Deterministic variant for the oracle gate: values carried as integer
    * cents so the accumulator is order-independent (long addition
    * commutes; double addition does not, and neither batch nor streaming
    * group iterators guarantee an order). */
  case class UserEventC(user_id: Long, cents: Long)
  case class UserStatsC(user_id: Long, n: Long, sum_cents: Long)

  def updateCents(key: Long, events: Iterator[UserEventC],
      state: GroupState[UserStatsC]): UserStatsC = {
    val prev = state.getOption.getOrElse(UserStatsC(key, 0L, 0L))
    var n = prev.n
    var s = prev.sum_cents
    events.foreach { e => n += 1; s += e.cents }
    val next = UserStatsC(key, n, s)
    state.update(next)
    next
  }

  /** Works in batch too (Spark runs mapGroupsWithState over batch
    * Datasets with empty initial state) — q64 runs this exact plan in
    * Verify; StreamingSpec runs it through readStream and asserts the
    * final state matches. */
  def runningStatsCents(ds: Dataset[UserEventC]): Dataset[UserStatsC] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(updateCents)
  }
}
