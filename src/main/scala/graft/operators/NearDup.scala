package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Near-duplicate detection via MinHash + LSH banding (SURVEY §2.C C2;
  * Broder, "On the resemblance and containment of documents", 1997; the
  * banding analysis follows Leskovec/Rajaraman/Ullman, Mining of Massive
  * Datasets ch. 3) — the scale path for fuzzy dedup over billions of
  * documents.
  *
  * Pipeline: shingle (word n-grams) → k minhashes → band keys → bucket
  * self-join on band key (candidate generation — the only join, and it
  * only pairs docs that collide in a band) → exact Jaccard verification.
  * Candidate generation is O(collisions), not O(n²): that is the whole
  * point at 100 TB.
  *
  * Two hash families:
  *  - [[XxHash]]: Spark-native `xxhash64` (codegen'd, fast) — production.
  *  - [[Md5Hash]]: md5-hex minima — bit-identical in any engine with md5,
  *    used for the DuckDB-oracled correctness query.
  */
object NearDup {

  sealed trait HashMode
  case object XxHash extends HashMode
  case object Md5Hash extends HashMode

  private def hashOne(g: Column, seed: Int, mode: HashMode): Column = mode match {
    case Md5Hash => md5(concat(lit(s"$seed:"), g))
    case XxHash  => xxhash64(lit(seed), g)
  }

  /** k-element MinHash signature of a shingle array (elementwise minima of
    * k hash families — strings compare lexicographically for Md5Hash).
    * Md5Hash uses the fused native [[graft.functions.MinHashMd5Sig]]
    * expression (bit-identical to the per-seed HOF formulation). */
  def minhashSignature(grams: Column, k: Int, mode: HashMode): Column = mode match {
    case Md5Hash =>
      org.apache.spark.sql.functions.call_function("minhash_md5_" + k, grams)
    case XxHash =>
      array((0 until k).map(i => array_min(transform(grams, g => hashOne(g, i, mode)))): _*)
  }

  /** Register `minhash_md5_<k>` for a session (done by Sessions.local for
    * the default k). */
  def registerMd5Sig(spark: org.apache.spark.sql.SparkSession, k: Int): Unit =
    graft.functions.FnRegistry.once(spark, s"minhash_md5_$k")(
      exprs => graft.functions.MinHashMd5Sig(exprs.head, k))

  /** One key per band: hash of the band's signature slice (+ band index so
    * keys never collide across bands). */
  def bandKeys(sig: Column, bands: Int, r: Int): Column =
    array((0 until bands).map { j =>
      val slice = (0 until r).map(i => element_at(sig, j * r + i + 1).cast("string"))
      md5(concat_ws("|", lit(j.toString) +: slice: _*))
    }: _*)

  /** Default in-bucket size cap: a band bucket larger than this is a
    * degenerate LSH key (empty shingles, constant text, hash pileup) —
    * its O(n_bucket²) pair expansion would dominate the job while
    * contributing pairs that are almost never true near-dups of each
    * OTHER bucket member specifically. 10k² = 50M pairs per bucket is
    * already past the point where one hot key stalls a 1000-executor
    * job on a single task. */
  val DefaultMaxBucket: Int = 10000

  /** Observation-name PREFIX under which capped operators report
    * overflow: `dropped_buckets`, `dropped_rows`, `largest_bucket`. No
    * silent caps. Each operator instance appends a unique suffix —
    * Spark rejects two CollectMetrics nodes with the same name but
    * different subtrees in one plan (DUPLICATED_METRICS_NAME), and
    * composed pipelines (e.g. CleanCorpus feeding another dedup) nest
    * several capped stages in one query. Read results back with
    * [[bucketCapMetrics]] (or match the prefix in a
    * QueryExecutionListener on a cluster). */
  val BucketCapMetric = "graft.lsh.bucket_cap"

  private val metricSeq = new java.util.concurrent.atomic.AtomicLong()

  /** Fresh instance-unique observation name under [[BucketCapMetric]]. */
  def nextBucketCapMetricName(): String =
    s"$BucketCapMetric.${metricSeq.incrementAndGet()}"

  /** All bucket-cap observations recorded by `df`'s last execution, in
    * name order (one per capped LSH stage in the plan). */
  def bucketCapMetrics(df: DataFrame): Seq[org.apache.spark.sql.Row] =
    df.queryExecution.observedMetrics.toSeq
      .filter(_._1.startsWith(BucketCapMetric)).sortBy(_._1).map(_._2)

  /** Candidate pairs (aId < bId) from LSH bucket collisions.
    *
    * Implemented as groupBy(band key) + in-bucket pair expansion rather
    * than a band-key self-join: the signature subtree is evaluated ONCE
    * (a self-join would recompute the k hash minima on both sides), and
    * the shuffle moves only (band key, id) pairs. Bucket sizes are
    * bounded by LSH design for well-behaved inputs; pathological buckets
    * (all-identical or empty shingle sets) are dropped at `maxBucket`
    * with the overflow reported on [[BucketCapMetric]] — never silently. */
  def candidatePairs(withSig: DataFrame, id: String, sigCol: String,
      bands: Int, r: Int, maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val bk = withSig.select(col(id), explode(bandKeys(col(sigCol), bands, r)).as("__bk"))
    val n = size(col("__ids"))
    bk.groupBy(col("__bk"))
      .agg(sort_array(collect_list(col(id))).as("__ids"))
      .filter(n > 1)
      .observe(nextBucketCapMetricName(),
        sum(when(n > maxBucket, 1L).otherwise(0L)).as("dropped_buckets"),
        sum(when(n > maxBucket, n.cast("long")).otherwise(0L)).as("dropped_rows"),
        coalesce(max(n.cast("long")), lit(0L)).as("largest_bucket"))
      .filter(n <= maxBucket)
      .select(explode(flatten(transform(col("__ids"), (x, i) =>
        transform(slice(col("__ids"), i + lit(2), size(col("__ids"))),
          y => struct(x.as("a_id"), y.as("b_id")))))).as("p"))
      .select(col("p.a_id"), col("p.b_id"))
      .distinct()
  }

  /** Shared head of the pipeline: (id, __grams, __sig) — shingles plus
    * the k-element MinHash signature. Public so overflow accounting
    * ([[overflowBuckets]]) and custom candidate policies can reuse the
    * exact signature the pipeline computes. */
  def withSignature(docs: DataFrame, id: String, textCol: String,
      n: Int = 3, k: Int = 8, mode: HashMode = XxHash): DataFrame =
    docs.select(
        col(id),
        TextFunctions.wordNGrams(TextFunctions.words(col(textCol)), n).as("__grams"))
      .withColumn("__sig", minhashSignature(col("__grams"), k, mode))

  /** Standalone overflow accounting: the band buckets `candidatePairs`
    * would drop at `maxBucket`, as (band_key, n_ids) rows. Unlike the
    * in-plan [[BucketCapMetric]] observation — which AQE erases when
    * empty-relation propagation collapses the query (e.g. every bucket
    * was degenerate) — this is an independent query that can be counted,
    * logged, or sunk next to the dedup output for audit. */
  def overflowBuckets(withSig: DataFrame, id: String, sigCol: String,
      bands: Int, r: Int, maxBucket: Int = DefaultMaxBucket): DataFrame =
    withSig.select(col(id), explode(bandKeys(col(sigCol), bands, r)).as("band_key"))
      .groupBy(col("band_key"))
      .agg(count(lit(1)).as("n_ids"))
      .filter(col("n_ids") > maxBucket)

  /** Incremental (cross-corpus) near-dup: match an incoming BATCH
    * against the retained corpus without self-joining either side — the
    * op an ingestion pipeline runs on every new crawl before appending.
    * Band keys of both sides equi-join (batch side is typically small
    * enough to broadcast; Spark picks that up from size estimates, or
    * hint the caller's `incoming`), so corpus text/signatures never
    * shuffle — only (band key, id) pairs and the candidate ids do.
    * Degenerate corpus buckets are dropped at `maxBucket` via an
    * anti-join against the (tiny) hot-bucket list — audit them with
    * [[overflowBuckets]]. Returns (inc_id, corp_id, jaccard) for every
    * verified pair ≥ tau. */
  def crossDupPairs(incoming: DataFrame, corpus: DataFrame, id: String,
      textCol: String, n: Int = 3, k: Int = 8, bands: Int = 4, r: Int = 2,
      tau: Double = 0.5, mode: HashMode = XxHash,
      maxBucket: Int = DefaultMaxBucket): DataFrame =
    crossDupPairsIndexed(incoming,
      // one-shot: LAZY index (no localCheckpoint) — a single batch reads
      // each corpus-side plan once, so eager materialization would only
      // add three blocking jobs and pin corpus-sized arrays in executor
      // storage; repeated callers build the index once via
      // [[buildCorpusIndex]] instead
      corpusIndex(corpus, id, textCol, n, k, bands, r, mode, maxBucket,
        materialize = false),
      id, textCol, n, k, bands, r, tau, mode)

  /** The prebuilt (materialized) corpus side of the incremental
    * near-dup: band keys, sorted gram sets, and the hot-bucket list.
    * Build it ONCE per retained corpus and run every incoming batch (or
    * every streaming micro-batch — [[graft.streaming.StreamNearDup]])
    * against it; rebuilding per batch would re-shingle and re-sign the
    * full corpus each time, which at corpus scale dwarfs the batch work
    * itself. */
  final case class CorpusIndex private[operators] (
      bk: DataFrame, grams: DataFrame, hot: DataFrame)

  /** Shingle, sign, band, and hot-bucket-scan `corpus` once, lineage
    * truncated ([[CorpusIndex]]).
    *
    * Materialization is `localCheckpoint`, i.e. executor-local storage:
    * right for a batch session that runs many batches against one
    * index, but NON-RELIABLE — losing an executor invalidates the
    * index, and a long-running streaming query
    * ([[graft.streaming.StreamNearDup]]) holding it would fail
    * mid-stream and need a restart (which rebuilds the index). For a
    * 100 TB corpus on a real cluster, persist the three frames to a
    * reliable store (parquet/`spark.checkpoint`) instead and read them
    * back — same shape, restartable. */
  def buildCorpusIndex(corpus: DataFrame, id: String, textCol: String,
      n: Int = 3, k: Int = 8, bands: Int = 4, r: Int = 2,
      mode: HashMode = XxHash,
      maxBucket: Int = DefaultMaxBucket): CorpusIndex =
    corpusIndex(corpus, id, textCol, n, k, bands, r, mode, maxBucket,
      materialize = true)

  private def corpusIndex(corpus: DataFrame, id: String, textCol: String,
      n: Int, k: Int, bands: Int, r: Int, mode: HashMode, maxBucket: Int,
      materialize: Boolean): CorpusIndex = {
    def mat(df: DataFrame): DataFrame =
      if (materialize) df.localCheckpoint() else df
    val bk = mat(withSignature(corpus, id, textCol, n, k, mode)
      .select(col(id).as("corp_id"),
        explode(bandKeys(col("__sig"), bands, r)).as("__bk")))
    val grams = mat(corpus.select(
      col(id).as("corp_id"),
      array_sort(
        TextFunctions.wordNGrams(TextFunctions.words(col(textCol)), n))
        .as("__g_corp")))
    val hot = mat(bk.groupBy(col("__bk")).agg(count(lit(1)).as("__n"))
      .filter(col("__n") > maxBucket).select(col("__bk")))
    CorpusIndex(bk, grams, hot)
  }

  /** [[crossDupPairs]] against a prebuilt [[CorpusIndex]]: only the
    * incoming side is shingled/signed here, so per-batch cost is
    * proportional to the batch, not the corpus. */
  def crossDupPairsIndexed(incoming: DataFrame, ix: CorpusIndex,
      id: String, textCol: String, n: Int = 3, k: Int = 8, bands: Int = 4,
      r: Int = 2, tau: Double = 0.5, mode: HashMode = XxHash): DataFrame = {
    val incBk = withSignature(incoming, id, textCol, n, k, mode)
      .select(col(id).as("inc_id"),
        explode(bandKeys(col("__sig"), bands, r)).as("__bk"))
    val incGrams = incoming.select(
      col(id).as("inc_id"),
      array_sort(
        TextFunctions.wordNGrams(TextFunctions.words(col(textCol)), n))
        .as("__g_inc"))
    val cands = incBk.join(broadcast(ix.hot), Seq("__bk"), "left_anti")
      .join(ix.bk, "__bk")
      .select(col("inc_id"), col("corp_id")).distinct()
    cands
      .join(incGrams, "inc_id")
      .join(ix.grams, "corp_id")
      .withColumn("jaccard",
        TextFunctions.jaccardSorted(col("__g_inc"), col("__g_corp")))
      .filter(col("jaccard") >= tau)
      .select(col("inc_id"), col("corp_id"), col("jaccard"))
  }

  /** Full near-dup pipeline over (id, text): LSH candidates, then exact
    * Jaccard ≥ tau verification. Returns (a_id, b_id, jaccard). */
  def nearDupPairs(docs: DataFrame, id: String, textCol: String,
      n: Int = 3, k: Int = 8, bands: Int = 4, r: Int = 2,
      tau: Double = 0.5, mode: HashMode = XxHash,
      maxBucket: Int = DefaultMaxBucket): DataFrame = {
    // grams sorted once per ROW: the ≥-tau verify then merge-counts each
    // candidate pair with zero allocation (same jaccard value)
    val grams = docs.select(
      col(id),
      array_sort(
        TextFunctions.wordNGrams(TextFunctions.words(col(textCol)), n)).as("__grams"))
    val withSig = withSignature(docs, id, textCol, n, k, mode)
    val cands = candidatePairs(withSig, id, "__sig", bands, r, maxBucket)
    cands
      .join(grams.select(col(id).as("a_id"), col("__grams").as("__ga")), "a_id")
      .join(grams.select(col(id).as("b_id"), col("__grams").as("__gb")), "b_id")
      .withColumn("jaccard", TextFunctions.jaccardSorted(col("__ga"), col("__gb")))
      .filter(col("jaccard") >= tau)
      .select(col("a_id"), col("b_id"), col("jaccard"))
  }
}
