package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-trained bigram language-model scoring — the LM-perplexity
  * quality filter of a training-data pipeline (CCNet-style "score each
  * document under a small LM, drop the tail"; complements the unigram
  * surprisal of q93 with actual left-context). The model is the MLE
  * bigram model of the corpus itself: P(w_i | w_{i-1}) =
  * c(w_{i-1} w_i) / c(w_{i-1} ·), with the context count taken over
  * bigram starts so the distribution sums to 1 exactly and every
  * observed bigram has non-zero probability (no smoothing needed when
  * scoring the training corpus under itself).
  *
  * Scale shape: tokens and bigrams never ride a shuffle as strings —
  * each bigram occurrence is reduced to two 60-bit md5 longs
  * ([[Contamination.gramHash]]): the bigram key and its context key.
  * From there the corpus is passed ONCE: per-(doc, bigram) counts are
  * materialized (lineage-truncated), the model itself is a vocab-sized
  * aggregate + window over that table (context counts never touch the
  * corpus again), and scoring is one long-key join back. No broadcast of
  * anything corpus-sized, no driver state; collisions (2^-60) merge two
  * counts deterministically and identically in the oracle, which replays
  * the same hash.
  */
object LangModel {

  /** Per-doc bigram NLL under the corpus MLE bigram model:
    * (idCol, n_bi, n_distinct_bi, avg_nll), avg_nll rounded to 6 dp
    * (NULL for docs with < 2 tokens, which have no bigrams). */
  def bigramSurprisal(df: DataFrame, idCol: String, textCol: String,
      model: Tokenize.Model = Tokenize.Whitespace): DataFrame = {
    // Tokenization is STAGED into its own column before the lambda:
    // higher-order-function lambdas are interpreted without common
    // subexpression elimination, so referencing the raw split expression
    // would re-tokenize the document once per element_at — O(tokens ×
    // doc_len) per row instead of O(doc_len).
    val ws = col("__ws")
    // one struct per bigram occurrence: (h_ctx, h_bi) as 60-bit longs.
    // The size guard matters: sequence(1, 0) would count DOWN in Spark,
    // so a 1-token doc must yield NULL (explodes to zero rows), not a
    // descending index range.
    val bigrams = when(size(ws) >= 2,
      transform(
        sequence(lit(1), size(ws) - 1),
        i => struct(
          Contamination.gramHash(element_at(ws, i)).as("h_ctx"),
          Contamination.gramHash(
            concat_ws(" ", element_at(ws, i), element_at(ws, i + 1))).as("h_bi"))))
    // Per-(doc, bigram) counts, materialized once: dt feeds both the
    // model counts and the scoring join — without the checkpoint Spark
    // would re-scan and re-explode the corpus for each consumer (the
    // Components/NearDup lineage-truncation pattern).
    val dt = Spread.byKey(df, idCol)
      .select(col(idCol), model.tokens(col(textCol)).as("__ws"))
      .select(col(idCol), explode(bigrams).as("b"))
      .groupBy(col(idCol), col("b.h_ctx").as("h_ctx"), col("b.h_bi").as("h_bi"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint()
    // h_bi determines h_ctx absent collisions (same bigram string ⇒
    // same first token), so the model collapses to ONE vocab-sized
    // aggregate; context counts are a window over that vocab, not a
    // second pass over the corpus. The model key is the PAIR
    // (h_ctx, h_bi) — the oracle must group by the same pair so that a
    // bigram-hash collision across different contexts (p ≈ 2^-60)
    // still merges identically on both sides.
    val cb = dt.groupBy(col("h_ctx"), col("h_bi")).agg(sum(col("c")).as("c_bi"))
    val cv = cb.withColumn("c_ctx",
      sum(col("c_bi")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("h_ctx"))))
    val scored = dt.join(cv, Seq("h_ctx", "h_bi"))
      .groupBy(col(idCol))
      .agg(sum(col("c")).cast("long").as("n_bi"),
        count(lit(1)).as("n_distinct_bi"),
        sum(col("c") * (log(col("c_ctx").cast("double"))
          - log(col("c_bi").cast("double")))).as("__nll"))
      .select(col(idCol), col("n_bi"), col("n_distinct_bi"),
        round(col("__nll") / col("n_bi").cast("double"), 6).as("avg_nll"))
    // totality: docs with no bigrams still get a row
    df.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bi"), lit(0L)).as("n_bi"),
        coalesce(col("n_distinct_bi"), lit(0L)).as("n_distinct_bi"),
        col("avg_nll"))
  }
}
