package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** End-to-end corpus cleaning for a training-data pipeline (SURVEY §2.C
  * composition): the standard pre-training prep chain
  *
  *   language filter → quality filter → exact dedup → near-dup dedup
  *
  * composed from the engine's own primitives (q42's stopword language
  * heuristic, q58's quality score, q45's canonical fingerprint, q47's
  * MinHash-LSH pairs), each stage a narrow codegen'd projection or a
  * single keyed shuffle — the whole pipeline is 4 shuffles regardless of
  * corpus size.
  *
  * Near-dup policy is GREEDY KEEP-LOWEST-ID: every (a < b) pair with
  * jaccard ≥ tau drops b. This is the standard single-pass industrial
  * policy, not transitive-closure clustering (no iterative connected
  * components); its useful invariant — asserted in CleanCorpusSpec — is
  * that no ≥ tau pair survives among the kept documents.
  */
object CleanCorpus {

  /** Per-doc stage columns: predicted language and quality score, exactly
    * the q42/q58 formulas. */
  def annotated(docs: DataFrame, textCol: String): DataFrame = {
    val ws = TextFunctions.words(col(textCol))
    val nWords = size(ws).cast("double")
    val swRatio =
      TextFunctions.stopwordHits(ws, TextFunctions.EN_STOP).cast("double") / nWords
    val esHits = TextFunctions.stopwordHits(ws, TextFunctions.ES_STOP)
    val punctRatio =
      size(regexp_extract_all(col(textCol), lit("[^a-z0-9 ]"), lit(0))).cast("double") /
        length(col(textCol)).cast("double")
    docs
      .withColumn("__predicted",
        when(TextFunctions.stopwordHits(ws, TextFunctions.EN_STOP) >= esHits,
          lit("en")).otherwise(lit("es")))
      .withColumn("__quality",
        when(nWords.between(20.0, 2000.0), 0.4).otherwise(0.0) +
          least(swRatio * 4.0, lit(0.4)) +
          when(punctRatio <= 0.1, 0.2).otherwise(0.0))
  }

  /** The cleaned corpus: input rows (original columns) that survive all
    * four stages. Deterministic for a fixed `mode`; `Md5Hash` makes every
    * stage replayable in ANSI SQL (q75's oracle). */
  def clean(docs: DataFrame, id: String, textCol: String,
      targetLang: String = "en", minQuality: Double = 0.5,
      n: Int = 3, k: Int = 8, bands: Int = 4, r: Int = 2, tau: Double = 0.5,
      mode: NearDup.HashMode = NearDup.XxHash,
      maxBucket: Int = NearDup.DefaultMaxBucket): DataFrame = {
    // stages 1+2: one codegen'd pass, no shuffle
    val kept = annotated(docs, textCol)
      .filter(col("__predicted") === targetLang && col("__quality") >= minQuality)
      .drop("__predicted", "__quality")
    // stage 3: exact dedup — keep the lowest id per canonical fingerprint
    // (one keyed shuffle; the window sorts per fingerprint group only)
    val exact = Dedup.keepOne(
      kept.withColumn("__fp", TextFunctions.canonicalFingerprint(col(textCol))),
      Seq("__fp"), Seq(col(id).asc)).drop("__fp")
    // stage 4: near-dup dedup — drop the higher id of every ≥ tau pair
    val dupIds = NearDup.nearDupPairs(exact, id, textCol,
        n = n, k = k, bands = bands, r = r, tau = tau, mode = mode,
        maxBucket = maxBucket)
      .select(col("b_id").as(id)).distinct()
    exact.join(dupIds, Seq(id), "left_anti")
  }

  /** Stage-by-stage retention counts — the pipeline's RunReport analog
    * (stage, n_docs), computed with the same definitions as [[clean]].
    * Four actions over progressively-filtered frames; cache `docs`
    * upstream if the scan is expensive. */
  def stageCounts(docs: DataFrame, id: String, textCol: String,
      targetLang: String = "en", minQuality: Double = 0.5,
      mode: NearDup.HashMode = NearDup.XxHash): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ann = annotated(docs, textCol)
    val lang = ann.filter(col("__predicted") === targetLang)
    val qual = lang.filter(col("__quality") >= minQuality)
    val cleaned = clean(docs, id, textCol, targetLang, minQuality, mode = mode)
    Seq(
      ("0_input", docs.count()),
      ("1_lang", lang.count()),
      ("2_quality", qual.count()),
      ("3_exact_dedup", qual
        .withColumn("__fp", TextFunctions.canonicalFingerprint(col(textCol)))
        .select("__fp").distinct().count()),
      ("4_near_dedup", cleaned.count()))
      .toDF("stage", "n_docs")
  }
}
