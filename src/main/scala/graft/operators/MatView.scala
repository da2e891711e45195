package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.CommitLog

/** INCREMENTAL MATERIALIZED-VIEW maintenance: keep a persisted
  * per-key aggregate (count + sums) in sync with a source table by
  * applying its CHANGE FEED, never recomputing from the base — the
  * classic delta-maintenance rule for distributive aggregates
  * (inserts add, deletes subtract; Gupta & Mumick's incremental view
  * maintenance, as a commit-log consumer).
  *
  * Scale shape: one batch of changes aggregates DOWN to its touched
  * keys before touching the view (map-side combined — the shuffle
  * carries per-key deltas, not change rows), then a keyed outer merge
  * rewrites the view. At 100 TB the view is key-domain-sized and the
  * per-trigger cost is proportional to the BATCH, not the base table —
  * the entire point versus recompute. Count-zero rows drop, so a fully
  * retracted key leaves the view (delete+insert pairs from rewriting
  * merges cancel exactly; the count can never go negative on a
  * consistent feed).
  *
  * Works batch (apply a [[CommitLog.readChanges]] range) and streaming
  * (`foreachBatch` over a `graft-cdc` stream with the sink's
  * txn-epoch idempotency — exactly-once view contents over replays).
  *
  * Determinism: counts and Long/decimal sums are exact, so the
  * maintained view is bit-identical to the direct aggregate of the
  * final base state (spec-pinned and oracle-checked) regardless of how
  * the feed was batched. */
object MatView {

  /** Apply one batch of change rows (with `_change_type`) to the view
    * table at `viewRoot`: per-key `n` adjusts by signed counts, each
    * `sum_<col>` by signed sums. Creates the view on first call.
    * Returns the committed version; `txn` forwards to the log for
    * streaming replay-safety. */
  def applyDelta(spark: org.apache.spark.sql.SparkSession, viewRoot: String,
      changes: DataFrame, keys: Seq[String], sumCols: Seq[String],
      txn: Option[(String, Long)] = None): Long = {
    require(keys.nonEmpty, "materialized view needs at least one key column")
    val log = CommitLog(spark, viewRoot)
    // r18: a lineage feed's update pair applies as retract+assert —
    // postimage adds like an insert, preimage retracts like a delete
    val sign = when(col("_change_type").isin("insert", "update_postimage"), 1L)
      .otherwise(-1L)
    val delta = changes
      .groupBy(keys.map(col): _*)
      .agg(sum(sign).as("__dn"),
        sumCols.map(c => sum(col(c) * sign).as(s"__d_$c")): _*)
    val cur = log.snapshot()
    val merged =
      if (cur.version < 0)
        delta.select(keys.map(col) ++ Seq(col("__dn").as("n")) ++
          sumCols.map(c => col(s"__d_$c").as(s"sum_$c")): _*)
      else {
        // NULL-SAFE key merge: groupBy puts null keys in one group, so
        // the view legitimately carries null-keyed rows — an EqualTo
        // join would never match them (null = null is null), leaving a
        // stale row the retraction can't reach AND dropping the delta;
        // <=> treats null as a value, like the grouping did
        val c = log.read().alias("c")
        val d = delta.alias("d")
        val cond = keys.map(k => col(s"c.$k") <=> col(s"d.$k")).reduce(_ && _)
        c.join(d, cond, "full_outer")
          .select(keys.map(k => coalesce(col(s"c.$k"), col(s"d.$k")).as(k)) ++ Seq(
            (coalesce(col("c.n"), lit(0L)) + coalesce(col("d.__dn"), lit(0L))).as("n")) ++
            sumCols.map(cc =>
              (coalesce(col(s"c.sum_$cc"), lit(0L).cast(changes.schema(cc).dataType))
                + coalesce(col(s"d.__d_$cc"),
                    lit(0L).cast(changes.schema(cc).dataType))).as(s"sum_$cc")): _*)
      }
    log.replaceAll(merged.filter(col("n") > 0), txn)
  }

  /** Catch the view up with the base table's feed in bounded steps:
    * applies `(fromVersion, toVersion]` in slices of `step` versions —
    * the batch form of the streaming consumer (each slice is one
    * [[applyDelta]]; the result is independent of `step`, spec-pinned).
    * IDEMPOTENT over re-runs: each slice commits with a txn epoch = its
    * base to-version, so re-running after a mid-loop crash skips the
    * slices the view already absorbed instead of double-applying them
    * (re-run with the SAME fromVersion and step — the epochs are the
    * slice boundaries). Returns the last applied base version. */
  def catchUp(spark: org.apache.spark.sql.SparkSession, viewRoot: String,
      base: CommitLog, keys: Seq[String], sumCols: Seq[String],
      fromVersion: Long, step: Long = Long.MaxValue): Long = {
    require(step >= 1, s"step=$step must be >= 1")
    val head = base.snapshot().version
    var from = fromVersion
    while (from < head) {
      val to = if (from > head - step) head else from + step
      applyDelta(spark, viewRoot, base.readChanges(from, to), keys, sumCols,
        txn = Some("graft-matview-catchup" -> to))
      from = to
    }
    head
  }
}
