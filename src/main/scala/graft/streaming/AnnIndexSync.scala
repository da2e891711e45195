package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Similarity

/** Keep a persisted [[Similarity.buildIvfPqIndex]] root in sync with a
  * commit-log BASE table by following its change feed — the streaming
  * composition of the index-maintenance pieces (append: q136, delete:
  * q150) that a production vector store actually runs: embeddings land
  * in the base table through any write path (append, upsert, SQL
  * MERGE, OPTIMIZE), and the index follows incrementally instead of
  * rebuilding (the reference's poller loop,
  * /root/reference/index.js:41-59, pointed at index maintenance).
  *
  * Per micro-batch (a version range of the `graft-cdc` feed):
  *
  *  1. NET-EFFECT collapse per id — the feed is a FILE-level diff, so
  *     one batch can carry delete+insert pairs for rewritten-unchanged
  *     rows (a merge or OPTIMIZE restating a file) and multi-version
  *     histories of one id (insert at v5, delete at v6). The final
  *     state per id is its LAST event in (version, delete<insert)
  *     order — the same "apply deletes before inserts within a
  *     version" rule [[graft.sources.CommitLog.readChanges]] documents.
  *  2. One [[Similarity.syncIvfPqIndex]] — EVERY touched id's stale
  *     postings retire AND the net-live rows' fresh encodings (with
  *     the PERSISTED codebooks — quantizers are fixed at build; the
  *     append-parity contract) land in ONE atomic postings commit
  *     ([[graft.sources.CommitLog.deleteAndAppend]], r12 — the r11
  *     delete-then-append pair exposed a one-trigger window where a
  *     searcher missed the batch's re-inserted ids).
  *
  * Cost per trigger ∝ batch (feed volume is bounded by changed files,
  * the swap touches only victim cells + appends new postings) — never
  * corpus, never index size. A concurrent searcher sees the index
  * before or after the trigger, never between. Restart safety rides
  * the streaming checkpoint: offsets are log versions, and replaying
  * a batch re-runs the same swap against state it already produced —
  * the replayed trigger converges to the same index state.
  *
  * OPTIMIZE-class rewrites restate rows the index already holds; the
  * net-effect apply handles them correctly but still pays
  * delete+re-append for every restated row — partition-scope
  * maintenance of the base table (the [[graft.sources.CommitLog]]
  * discipline) keeps that churn local. */
object AnnIndexSync {

  /** Apply one change-feed batch (columns: base schema +
    * `_change_type`, `_commit_version`) to the index at `indexRoot`.
    * Exposed for batch catch-up and testing; [[start]] calls this per
    * trigger. */
  def applyChanges(spark: SparkSession, indexRoot: String, batch: DataFrame,
      cId: String, vecCol: String): Unit = {
    // last event wins: version desc, then an EXPLICIT change-type rank
    // (insert=1 outranks delete=0 within one version — not the lexical
    // accident 'insert' > 'delete', which a new feed type would break);
    // an unknown change type fails loudly rather than sorting arbitrarily.
    // Precondition: ids are unique within one (version, change_type) —
    // readChanges emits net effects per version, so a remaining tie
    // would mean a malformed feed, not a real ordering choice.
    val typeRank = when(col("_change_type")
        .isin("insert", "update_postimage"), 1)
      .when(col("_change_type").isin("delete", "update_preimage"), 0)
      .otherwise(raise_error(concat(
        lit("AnnIndexSync: unknown _change_type "), col("_change_type"))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(cId))
      .orderBy(col("_commit_version").desc, col("__tr").desc)
    val last = batch
      .withColumn("__tr", typeRank)
      .withColumn("__rn", row_number().over(w))
      .drop("__tr")
      .filter(col("__rn") === 1)
      .localCheckpoint() // touched + live both consume it: one pass
    val touched = last.select(col(cId))
    if (!touched.isEmpty) {
      val live = last.filter(col("_change_type")
        .isin("insert", "update_postimage"))
        .drop("__rn", "_change_type", "_commit_version", "_row_id")
      // ONE atomic postings commit (r12): stale postings of every
      // touched id retire and the re-encoded rows land together — a
      // concurrent searcher never sees the touched ids missing (the
      // delete-then-append pair exposed that state for one trigger)
      Similarity.syncIvfPqIndex(spark, indexRoot, touched, live, cId, vecCol)
    }
  }

  /** Start the sync stream: `graft-cdc` over `baseRoot` →
    * [[applyChanges]] per trigger. The caller owns the lifecycle
    * (`processAllAvailable`/`stop`, or a trigger policy on a real
    * cluster). `maxVersionsPerTrigger` is the backfill throttle —
    * set it when starting from `startingVersion = -1` against a long
    * history. */
  def start(spark: SparkSession, baseRoot: String, indexRoot: String,
      cId: String, vecCol: String, checkpointDir: String,
      startingVersion: Long = -1L,
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
        applyChanges(spark, indexRoot, batch, cId, vecCol)
      }
      .start()
  }
}
