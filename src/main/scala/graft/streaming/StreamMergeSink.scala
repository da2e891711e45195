package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.sources.CommitLog

/** The reference's poller loop as a STREAMING sink (SURVEY EP2,
  * /root/reference/index.js:242-294: fetch the current station list,
  * conditional-put each station, append prices): a stream of records
  * merges into a [[CommitLog]] table once per micro-batch via
  * `foreachBatch` — `readStream → mergeInto(...)` IS the reference's
  * periodic import, with the trigger interval playing the cron role.
  *
  * Exactly-once table contents over at-least-once replays: every
  * micro-batch commits with `txn = (queryName, batchId)`, and the log
  * skips a batch the table has already absorbed — a restart from the
  * checkpoint can re-run batch N without double-merging it. Concurrent
  * OTHER writers (a backfill job, a second stream on the same table)
  * serialize through the log's version CAS; this sink needs no lock.
  *
  * In-batch duplicates collapse before the merge ([[dedupBy]] —
  * last-wins by a tie-break column) because the merge contract wants
  * one row per key per batch, and a micro-batch of upstream events can
  * carry several versions of one key.
  */
object StreamMergeSink {

  /** Attach the merge sink to `stream`. Start it with
    * `.option("checkpointLocation", ...)` (caller-owned) and a trigger;
    * `mode` is the table semantics — [[CommitLog.InsertIfAbsent]] for
    * the reference's station table, [[CommitLog.LastWins]] for a
    * type-1 dimension.
    *
    * `orderCol`: when set, in-batch duplicates per key keep the row
    * with the HIGHEST `orderCol` (then arbitrary-but-deterministic);
    * when None the batch must already be unique per key. */
  def mergeInto(stream: DataFrame, tableRoot: String, keys: Seq[String],
      mode: CommitLog.MergeMode = CommitLog.InsertIfAbsent,
      queryName: String = "stream-merge",
      orderCol: Option[String] = None): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode("update")
      .queryName(queryName)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val unique = orderCol.fold(batch)(dedupBy(batch, keys, _))
        CommitLog(batch.sparkSession, tableRoot)
          .upsert(unique, keys, mode, txn = Some(queryName -> batchId))
        ()
      }

  /** [[mergeInto]] against a PARTITIONED commit-log table
    * ([[CommitLog.upsertPartitioned]]): each micro-batch merges only
    * the partitions it touches — the natural shape when a stream
    * lands time-bucketed data into a date-partitioned table (the
    * reference's daily price snapshots): a batch touches one or two
    * partitions of an arbitrarily large table and the merge cost
    * follows the batch, not the table. Same per-(queryName, batchId)
    * idempotency; `partCol` must be one of `keys` (enforced by the
    * log). */
  def mergeIntoPartitioned(stream: DataFrame, tableRoot: String,
      keys: Seq[String], partCol: String,
      mode: CommitLog.MergeMode = CommitLog.InsertIfAbsent,
      queryName: String = "stream-merge-part",
      orderCol: Option[String] = None): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode("update")
      .queryName(queryName)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val unique = orderCol.fold(batch)(dedupBy(batch, keys, _))
        CommitLog(batch.sparkSession, tableRoot)
          .upsertPartitioned(unique, keys, mode, partCol,
            txn = Some(queryName -> batchId))
        ()
      }

  /** Last-wins within the batch: keep each key's max-`orderCol` row. */
  private def dedupBy(batch: DataFrame, keys: Seq[String], orderCol: String): DataFrame =
    graft.operators.Dedup.lastWins(batch, keys, Seq(orderCol))
}
