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
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      s"minhash_md5_$k", exprs => graft.functions.MinHashMd5Sig(exprs.head, k), "built-in")

  /** One key per band: hash of the band's signature slice (+ band index so
    * keys never collide across bands). */
  def bandKeys(sig: Column, bands: Int, r: Int): Column =
    array((0 until bands).map { j =>
      val slice = (0 until r).map(i => element_at(sig, j * r + i + 1).cast("string"))
      md5(concat_ws("|", lit(j.toString) +: slice: _*))
    }: _*)

  /** Candidate pairs (aId < bId) from LSH bucket collisions.
    *
    * Implemented as groupBy(band key) + in-bucket pair expansion rather
    * than a band-key self-join: the signature subtree is evaluated ONCE
    * (a self-join would recompute the k hash minima on both sides), and
    * the shuffle moves only (band key, id) pairs. Bucket sizes are
    * bounded by LSH design, so the in-bucket combination expansion is
    * small; pathological buckets would surface in `n_bucket` and can be
    * capped upstream. */
  def candidatePairs(withSig: DataFrame, id: String, sigCol: String,
      bands: Int, r: Int): DataFrame = {
    val bk = withSig.select(col(id), explode(bandKeys(col(sigCol), bands, r)).as("__bk"))
    bk.groupBy(col("__bk"))
      .agg(sort_array(collect_list(col(id))).as("__ids"))
      .filter(size(col("__ids")) > 1)
      .select(explode(flatten(transform(col("__ids"), (x, i) =>
        transform(slice(col("__ids"), i + lit(2), size(col("__ids"))),
          y => struct(x.as("a_id"), y.as("b_id")))))).as("p"))
      .select(col("p.a_id"), col("p.b_id"))
      .distinct()
  }

  /** Full near-dup pipeline over (id, text): LSH candidates, then exact
    * Jaccard ≥ tau verification. Returns (a_id, b_id, jaccard). */
  def nearDupPairs(docs: DataFrame, id: String, textCol: String,
      n: Int = 3, k: Int = 8, bands: Int = 4, r: Int = 2,
      tau: Double = 0.5, mode: HashMode = XxHash): DataFrame = {
    val grams = docs.select(
      col(id),
      TextFunctions.wordNGrams(TextFunctions.words(col(textCol)), n).as("__grams"))
    val withSig = grams.withColumn("__sig", minhashSignature(col("__grams"), k, mode))
    val cands = candidatePairs(withSig, id, "__sig", bands, r)
    cands
      .join(grams.select(col(id).as("a_id"), col("__grams").as("__ga")), "a_id")
      .join(grams.select(col(id).as("b_id"), col("__grams").as("__gb")), "b_id")
      .withColumn("jaccard", TextFunctions.jaccard(col("__ga"), col("__gb")))
      .filter(col("jaccard") >= tau)
      .select(col("a_id"), col("b_id"), col("jaccard"))
  }
}
