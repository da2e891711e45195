package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.AsOf
import graft.sources.CommitLog

/** STREAMING RESAMPLE MAINTENANCE: keep a persisted resample GRID
  * table (the [[AsOf.resampleFfill]]/[[AsOf.resampleInterpolate]]
  * output shape) in sync with an observation commit-log table by
  * consuming its `graft-cdc` change feed — the streaming closure of
  * the reference's as-of poller (/root/reference/index.js:41-59): the
  * reference re-reads prices on a timer; this maintains the full
  * evaluated grid incrementally, the [[graft.operators.MatView]]
  * pattern applied to a non-distributive computation.
  *
  * A resample is PER-KEY decomposable (a key's grid rows depend only
  * on that key's observations), so the delta rule is key-granular:
  * per trigger, collapse the batch to its TOUCHED KEYS, re-resample
  * only those keys from the base table's current state, and swap
  * exactly their grid rows in ONE atomic commit
  * ([[CommitLog.deleteAndAppend]], r12 — a reader at any version sees
  * either the pre-swap or post-swap grid, never the touched keys
  * missing, which the r11 delete-merge + append two-commit shape
  * exposed for one trigger). Per-trigger cost follows the BATCH's key
  * set, never the corpus — the point versus recomputation; a key
  * whose observations were fully retracted leaves the grid entirely
  * (its re-resample yields no rows).
  *
  * Replay-safe WITHOUT txn epochs: the recompute reads the base's
  * CURRENT state, so re-running a batch re-deletes the touched keys
  * and re-appends identical rows — the net effect is idempotent.
  * After any quiescent point the grid table is EXACTLY the one-shot
  * batch resample of the base's final state (StreamingSpec pins it,
  * q163 hash-gates the batch catch-up form against DuckDB).
  *
  * Precondition (inherited from the batch operators, which refuse
  * loudly): the base table holds at most one observation per
  * (keys, ts) — maintain it through keyed upserts. */
object ResampleSync {

  /** Apply one change-feed batch: re-resample the touched keys from
    * the CURRENT base state and swap their grid rows. `interpolate`
    * picks [[AsOf.resampleInterpolate]] (gridded linear blend, null
    * outside the observed range) over [[AsOf.resampleFfill]]
    * (hold-last). Exposed for batch catch-up and testing; [[start]]
    * calls this per trigger. */
  def applyChanges(spark: SparkSession, baseRoot: String, gridRoot: String,
      batch: DataFrame, keys: Seq[String], tsCol: String, valCol: String,
      start: String, end: String, step: Column,
      interpolate: Boolean): Unit = {
    require(keys.nonEmpty, "ResampleSync needs >= 1 key column")
    // the touched-key set is batch-bounded and stays DISTRIBUTED — it
    // drives a semi-join (base read) and a keyed merge-delete (grid
    // swap), so a backfill batch touching millions of keys never
    // funnels through the driver
    val touched = batch.select(keys.map(col): _*).distinct()
      .localCheckpoint() // three consumers below: one pass
    if (touched.isEmpty) return
    val obs = CommitLog(spark, baseRoot).read()
      .join(touched, keys, "left_semi")
    val grid =
      if (interpolate)
        AsOf.resampleInterpolate(obs, keys, tsCol, valCol, start, end, step)
      else AsOf.resampleFfill(obs, keys, tsCol, start, end, step)
    // one atomic swap: the touched keys' old grid rows retire and the
    // re-resampled rows land in the SAME versioned commit — no
    // between-commits window, one write job. (A single keyed
    // update-or-insert ANSI merge was A/B-pinned SLOWER in r11 — its
    // dup-check/envelope/full-outer machinery over (keys, grid_ts)
    // costs more than this anti-join + union rewrite.)
    CommitLog(spark, gridRoot).deleteAndAppend(touched, keys, grid)
  }

  /** Catch the grid up with the base's feed in bounded version slices
    * — the batch form of the streaming consumer (each slice is one
    * [[applyChanges]]); the result is slice-size-independent because
    * every slice recomputes its touched keys from the base's final
    * state. Returns the last applied base version. */
  def catchUp(spark: SparkSession, baseRoot: String, gridRoot: String,
      keys: Seq[String], tsCol: String, valCol: String,
      start: String, end: String, step: Column, interpolate: Boolean,
      fromVersion: Long = -1L, sliceVersions: Long = Long.MaxValue): Long = {
    require(sliceVersions >= 1, s"sliceVersions=$sliceVersions must be >= 1")
    val base = CommitLog(spark, baseRoot)
    val head = base.snapshot().version
    var from = fromVersion
    while (from < head) {
      val to = if (from > head - sliceVersions) head else from + sliceVersions
      applyChanges(spark, baseRoot, gridRoot, base.readChanges(from, to),
        keys, tsCol, valCol, start, end, step, interpolate)
      from = to
    }
    head
  }

  /** The streaming consumer: a `graft-cdc` read of `baseRoot` driving
    * [[applyChanges]] per trigger. The caller owns the lifecycle. */
  def start(spark: SparkSession, baseRoot: String, gridRoot: String,
      checkpointDir: String, keys: Seq[String], tsCol: String,
      valCol: String, startTs: String, endTs: String, step: Column,
      interpolate: Boolean, startingVersion: Long = -1L,
      maxVersionsPerTrigger: Option[Int] = None): StreamingQuery = {
    val reader = spark.readStream.format("graft-cdc")
      .option("path", baseRoot)
      .option("startingVersion", startingVersion.toString)
    val stream = maxVersionsPerTrigger
      .fold(reader)(n => reader.option("maxVersionsPerTrigger", n.toString))
      .load()
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyChanges(spark, baseRoot, gridRoot, batch, keys, tsCol, valCol,
          startTs, endTs, step, interpolate)
      }
      .start()
  }
}
