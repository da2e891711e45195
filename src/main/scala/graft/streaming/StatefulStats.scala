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
}
