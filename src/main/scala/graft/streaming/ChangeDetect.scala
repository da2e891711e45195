package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** B14 change detection via `flatMapGroupsWithState`: emit an event only
  * when its value differs from the key's previous value — the reference's
  * unbuilt intent ("check if prices to update are equal to the last
  * inserted", TODO at /root/reference/index.js:272, and the dead helper
  * `checkClientPrices` at index.js:63-79) as a streaming operator.
  *
  * Within a micro-batch events are sorted by (ts, event_id); the carried
  * state is the key's last seen value, so consecutive-equal suppression
  * works across micro-batches. Feed batches in event-time order (the
  * watermark contract) — late cross-batch events would compare against a
  * newer value, same as any stateful streaming op.
  *
  * Values ride as integer cents (see [[StatefulStats]]: group iterators
  * have no guaranteed order, accumulation must not depend on FP order —
  * here the explicit in-batch sort makes emission deterministic too).
  */
object ChangeDetect {

  case class Ev(user_id: Long, event_id: Long, ts: java.sql.Timestamp, cents: Long)
  case class Change(user_id: Long, event_id: Long, ts: java.sql.Timestamp,
      cents: Long, prev_cents: Option[Long])
  case class LastValue(cents: Long)

  def detect(key: Long, events: Iterator[Ev],
      state: GroupState[LastValue]): Iterator[Change] = {
    val sorted = events.toArray.sortBy(e =>
      (e.ts.toInstant.getEpochSecond, e.ts.getNanos, e.event_id))
    val out = scala.collection.mutable.ArrayBuffer.empty[Change]
    var last: Option[Long] = state.getOption.map(_.cents)
    sorted.foreach { e =>
      // `last` always equals the previous event's value here: when an
      // event is suppressed it was equal to `last` already.
      if (!last.contains(e.cents)) {
        out += Change(e.user_id, e.event_id, e.ts, e.cents, last)
        last = Some(e.cents)
      }
    }
    last.foreach(v => state.update(LastValue(v)))
    out.iterator
  }

  /** Works in batch too (empty initial state, one group call per key) —
    * q68 runs this plan through the oracle gate; the oracle is the LAG
    * window formulation. */
  def changes(ds: Dataset[Ev]): Dataset[Change] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(detect)
  }
}
