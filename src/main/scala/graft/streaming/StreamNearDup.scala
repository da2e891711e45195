package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.NearDup

/** Continuous incremental near-dup: dedup an incoming document STREAM
  * against a fixed retained corpus — the always-on form of the
  * before-append check an ingestion pipeline runs on every crawl
  * increment (reference analog: the conditional-put-before-write at
  * `/root/reference/index.js:265-283`, generalized from exact-key to
  * near-duplicate matching).
  *
  * Shape: the corpus side ([[NearDup.buildCorpusIndex]]) is shingled,
  * signed, banded, and hot-bucket-scanned ONCE, outside the stream;
  * each micro-batch then runs [[NearDup.crossDupPairsIndexed]] — cost
  * proportional to the batch, never the corpus — and hands the verified
  * (inc_id, corp_id, jaccard) pairs to `sink`. foreachBatch is the
  * honest vehicle here: the candidate join needs a per-batch aggregation
  * + self-contained verify join that Structured Streaming's incremental
  * planner cannot express as one continuous plan, and the batch-local
  * semantics (each increment vs the corpus, not vs other increments) are
  * exactly what foreachBatch gives. Batch-to-batch duplicates are the
  * caller's policy: append accepted batches to the corpus and rebuild
  * the index on whatever cadence the pipeline compacts. */
object StreamNearDup {

  /** Start the stream: `incoming` is a streaming (id, text) DataFrame;
    * pairs for each micro-batch go to `sink(pairs, epochId)`. */
  def start(incoming: DataFrame, ix: NearDup.CorpusIndex, id: String,
      textCol: String, checkpointDir: String, n: Int = 3, k: Int = 8,
      bands: Int = 4, r: Int = 2, tau: Double = 0.5,
      mode: NearDup.HashMode = NearDup.XxHash)(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    incoming.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        sink(NearDup.crossDupPairsIndexed(
          batch, ix, id, textCol, n, k, bands, r, tau, mode), epochId)
      }
      .start()
}
