package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Benchmark-contamination detection: for every evaluation ("test")
  * document, the fraction of its distinct word n-grams that appear
  * anywhere in the training corpus — the standard n-gram-overlap
  * decontamination check run before training on web-scale data
  * (cf. the GPT-3 appendix-C / PaLM style 13-gram checks; here the n is
  * a parameter).
  *
  * Scale shape: grams never ride the shuffle as strings — both sides
  * hash each gram to a 60-bit md5-derived key first, so the semi-join
  * moves fixed-width longs. The train side collapses to its DISTINCT
  * gram vocabulary (map-side combinable) before joining; the test side
  * shuffles one row per (doc, distinct gram). No driver state, no
  * broadcast of anything corpus-sized. Collisions (2^-60 per pair) can
  * only inflate overlap, deterministically and identically in any
  * engine with md5 — which is what makes the DuckDB oracle replay
  * bit-exact.
  */
object Contamination {

  /** 60-bit gram key: md5 is replayable in the oracle; the production
    * swap-in would be xxhash64 (same shape, cheaper). */
  def gramHash(g: Column): Column =
    conv(substring(md5(g), 1, 15), 16, 10).cast("long")

  /** Per-test-doc overlap scores vs the train corpus:
    * (id, n_grams, n_overlap, contamination). Both inputs are (id, text)
    * relations; grams are distinct word n-grams of `textCol`. */
  def overlapScores(test: DataFrame, train: DataFrame, idCol: String,
      textCol: String, n: Int = 3): DataFrame = {
    def grams(df: DataFrame): DataFrame = df.select(
      col(idCol),
      explode(TextFunctions.wordNGrams(TextFunctions.words(col(textCol)), n)).as("__g"))
      .select(col(idCol), gramHash(col("__g")).as("__h"))
    val testGrams = grams(test)
    val vocab = grams(train).select(col("__h")).distinct()
    val tot = testGrams.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"))
    val hit = testGrams.join(vocab, Seq("__h"), "left_semi")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_overlap"))
    tot.join(hit, Seq(idCol), "left")
      .select(col(idCol),
        col("n_grams"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        (coalesce(col("n_overlap"), lit(0L)).cast("double") /
          col("n_grams").cast("double")).as("contamination"))
  }
}
