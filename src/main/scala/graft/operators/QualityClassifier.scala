package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based quality filtering (SURVEY §2.C C5): a fasttext-shaped
  * LINEAR text classifier — mean-pooled hashed bag-of-words features
  * against a fixed weight vector, sigmoid to a keep probability — the
  * filter family CCNet/DCLM-style pipelines run after the heuristic
  * battery (q58's ratios are the rules; this is the model).
  *
  * The weight vector here is md5-DERIVED — a deterministic stand-in
  * for offline-trained weights, exactly like [[Similarity.hashPlanes]]
  * stands in for trained hyperplanes — so the DuckDB oracle replays
  * feature hashing, pooling, and scoring bit-for-bit (q119). In
  * production the weights would arrive as a broadcast constant table;
  * the plan shape is identical.
  *
  * Scale shape: score = one codegen-friendly projection per row (token
  * hash → bucket → weight, summed in token order) — no shuffle, no
  * join, no UDF; the 100 TB cost is the scan itself. The weight
  * "table" never materializes anywhere: w(b) is a pure expression of
  * the bucket id, so there is nothing to broadcast at all.
  *
  * Reference tie-in: the reference keeps only rows whose key fields
  * are non-null (/root/reference/index.js:126-131) — a degenerate
  * quality rule; this operator is that hook generalized to a scored,
  * thresholded filter.
  */
object QualityClassifier {

  /** 60-bit md5 of one token, mod `buckets` — the shared gram-hash
    * discipline (`('0x'||substr(md5(t),1,15))::BIGINT % B` in SQL). */
  private def bucket(tok: Column, buckets: Int): Column =
    conv(substring(md5(tok), 1, 15), 16, 10).cast("long") % buckets

  /** Deterministic MILLI-weight in [-1000, 1000] for one bucket id:
    * the md5 of "w:<bucket>" folded to an INTEGER. Weights stay
    * integer through the whole pool — w(b) = milliWeight(b)/1000 only
    * conceptually — so the score arithmetic is exact (see [[score]]):
    * a float mean-pool summed per-engine differed by 1 ulp on long
    * docs and flipped round(·, 6) on boundary-straddling sums. */
  private def milliWeight(b: Column): Column =
    (conv(substring(md5(concat(lit("w:"), b.cast("string"))), 1, 15), 16, 10)
      .cast("long") % 2001) - 1000

  /** Per-doc quality score. logit = w_bias + mean over tokens of
    * w(bucket(token)) = score_num / (1000·n_tok), where score_num =
    * mw_bias·n + Σ mw(token) is an exact 64-bit integer (|mw| ≤ 1000
    * — no overflow this side of 9·10¹⁵ tokens per doc). score_num and
    * keep (= score_num >= 0, i.e. prob >= 0.5 — the threshold lives
    * where arithmetic is exact) are the ORACLE-CHECKABLE columns;
    * logit and prob are floating-point conveniences for library users
    * (one IEEE division is engine-identical, but DECIMAL ROUNDING of
    * it is not: a 7th-decimal tie rounds differently under Spark's
    * BigDecimal HALF_UP vs DuckDB's binary-double rounding — observed
    * 2/5000 rows at sf0.1 — and exp() may differ in the last ulp, so
    * oracles must check score_num/keep, never round(logit)/prob). */
  def score(df: DataFrame, id: String, textCol: String,
      buckets: Int = 1024): DataFrame = {
    val mwBias = milliWeight(lit("bias").cast("string"))
    // passthrough: every input column survives (pipeline composition —
    // q120 filters on keep and still needs text/source downstream).
    // Per-row cost is ~2 md5 per token, so a one-split local scan
    // would run the whole corpus on one task ([[Spread]]; no-op at
    // real scale where splits ≥ shuffle width)
    Spread.byKey(df, id)
      .withColumn("__t", Tokenize.tokens(col(textCol)))
      // null text propagates as null outputs on BOTH engines — without
      // the guard, legacy size(null) = -1 would emit a nonsense token
      // count and diverge from SQL's NULL
      .withColumn("n_tok",
        when(col("__t").isNull, lit(null).cast("long"))
          .otherwise(size(col("__t")).cast("long")))
      .withColumn("score_num",
        mwBias * col("n_tok") +
          aggregate(col("__t"), lit(0L),
            (a, t) => a + milliWeight(bucket(t, buckets))))
      .withColumn("logit",
        when(col("n_tok") === 0, mwBias.cast("double") / 1000.0)
          .otherwise(col("score_num").cast("double") / (col("n_tok") * 1000.0)))
      .withColumn("prob", lit(1.0) / (lit(1.0) + exp(-col("logit"))))
      .withColumn("keep",
        when(col("n_tok") === 0, mwBias >= 0).otherwise(col("score_num") >= 0))
      .drop("__t")
  }
}
