package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{BlockDedup, FuzzyJoin, LangModel, Quantize}
import graft.sources.Tables

/** Round-6 additions to the LLM training-data pipeline family (SURVEY
  * §2.C): bigram-LM quality scoring, sub-document block dedup, and
  * embedding int8 quantization. Each is a scale-shaped operator AND
  * fully DuckDB-oracled. */
object CorpusQueries2 {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  /** C5 bigram-LM surprisal ([[graft.operators.LangModel]]): per-doc
    * NLL under the corpus's own MLE bigram model — the LM-perplexity
    * quality filter with real left-context (q93 is the unigram
    * degenerate case). Bigrams ride every shuffle as 60-bit md5 longs;
    * the oracle replays the hash. */
  private val q98 = Q(
    "q98_bigram_surprisal",
    (s, dir) =>
      LangModel.bigramSurprisal(
        t(s, dir, "documents").select(col("doc_id"), col("text")),
        "doc_id", "text")
        .orderBy(col("doc_id")),
    Some("""WITH w AS (SELECT doc_id, string_split(lower(text),' ') AS ws FROM documents),
      b AS (SELECT doc_id, unnest(list_transform(range(1, len(ws)),
          i -> struct_pack(hc := ('0x' || substr(md5(ws[i]), 1, 15))::BIGINT,
                           hb := ('0x' || substr(md5(ws[i] || ' ' || ws[i+1]), 1, 15))::BIGINT))) AS g
        FROM w),
      dt AS (SELECT doc_id, g.hc AS h_ctx, g.hb AS h_bi, COUNT(*) AS c
        FROM b GROUP BY doc_id, g.hc, g.hb),
      cb AS (SELECT h_ctx, h_bi, CAST(SUM(c) AS BIGINT) AS c_bi
        FROM dt GROUP BY h_ctx, h_bi),
      cc AS (SELECT h_ctx, CAST(SUM(c) AS BIGINT) AS c_ctx FROM dt GROUP BY h_ctx),
      agg AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bi,
          COUNT(*) AS n_distinct_bi,
          round(SUM(c * (ln(CAST(c_ctx AS DOUBLE)) - ln(CAST(c_bi AS DOUBLE))))
            / CAST(SUM(c) AS DOUBLE), 6) AS avg_nll
        FROM dt JOIN cb USING (h_ctx, h_bi) JOIN cc USING (h_ctx) GROUP BY doc_id)
      SELECT d.doc_id,
        CAST(coalesce(n_bi, 0) AS BIGINT) AS n_bi,
        CAST(coalesce(n_distinct_bi, 0) AS BIGINT) AS n_distinct_bi,
        avg_nll
      FROM documents d LEFT JOIN agg USING (doc_id) ORDER BY doc_id"""))

  /** C2 sub-document block dedup ([[graft.operators.BlockDedup]]): C4's
    * line-level dedup over fixed 10-token blocks — per doc, how many of
    * its blocks are the global first occurrence (kept) vs boilerplate
    * seen earlier (dropped). Winner election is min(struct) per 60-bit
    * block hash; the oracle replays the hash and elects with a window. */
  private val q99 = Q(
    "q99_block_dedup",
    (s, dir) =>
      BlockDedup.blockStats(
        t(s, dir, "documents").select(col("doc_id"), col("text")),
        "doc_id", "text", blockTokens = 10)
        .orderBy(col("doc_id")),
    Some("""WITH w AS (SELECT doc_id, string_split(lower(text),' ') AS ws FROM documents),
      bl AS (SELECT doc_id, p,
          ('0x' || substr(md5(array_to_string(ws[(p*10+1):(p*10+10)], ' ')), 1, 15))::BIGINT AS h
        FROM (SELECT doc_id, ws, unnest(range(0, CAST(ceil(len(ws) / 10.0) AS BIGINT))) AS p
              FROM w WHERE len(ws) > 0)),
      k AS (SELECT doc_id, p, h,
          ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, p) AS rn FROM bl),
      st AS (SELECT doc_id, COUNT(*) AS n_blocks,
          CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        FROM k GROUP BY doc_id)
      SELECT d.doc_id,
        CAST(coalesce(n_blocks, 0) AS BIGINT) AS n_blocks,
        CAST(coalesce(n_kept, 0) AS BIGINT) AS n_kept,
        round(1.0 - CAST(n_kept AS DOUBLE) / CAST(n_blocks AS DOUBLE), 6)
          AS dup_block_ratio
      FROM documents d LEFT JOIN st USING (doc_id) ORDER BY doc_id"""))

  /** C3/C4 embedding int8 quantization ([[graft.operators.Quantize]]):
    * per-vector scale, code checksum, and reconstruction MSE — a pure
    * codegen-resident projection (no shuffle). The oracle recomputes
    * the same double-math per element; the half-up rounding is
    * floor(v + 0.5) on both sides, so no engine rounding-mode leaks in. */
  private val q100 = Q(
    "q100_int8_quantize",
    (s, dir) =>
      Quantize.int8Report(t(s, dir, "embeddings"), "vec_id", "embedding")
        .orderBy(col("vec_id")),
    Some("""WITH s AS (SELECT vec_id, embedding,
          list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS s0
        FROM embeddings),
      q AS (SELECT vec_id, embedding, s0,
          list_transform(embedding, x -> CASE WHEN s0 = 0 THEN 0
            ELSE CAST(floor(CAST(x AS DOUBLE) / s0 + 0.5) AS BIGINT) END) AS qs
        FROM s)
      SELECT vec_id,
        CAST(len(embedding) AS BIGINT) AS dim,
        round(sqrt(list_sum(list_transform(embedding,
          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS norm,
        round(s0, 9) AS scale,
        CAST(list_sum(qs) AS BIGINT) AS q_sum,
        round(list_sum(list_transform(range(1, len(embedding) + 1),
            i -> (CAST(embedding[i] AS DOUBLE) - qs[i] * s0)
               * (CAST(embedding[i] AS DOUBLE) - qs[i] * s0)))
          / CAST(len(embedding) AS DOUBLE), 12) AS mse
      FROM q ORDER BY vec_id"""))

  /** B5/B10 fuzzy self-join ([[graft.operators.FuzzyJoin]]): every
    * customer-name pair within levenshtein distance 1, via FastSS
    * deletion-neighborhood candidates + exact verify. The oracle is the
    * BRUTE-FORCE all-pairs join — hash equality proves the neighborhood
    * method has 100% recall on this corpus, the q47 pattern. */
  private val q101 = Q(
    "q101_fuzzy_join",
    (s, dir) =>
      FuzzyJoin.selfPairs(
        t(s, dir, "customer").select(col("c_custkey"), col("c_name")),
        "c_custkey", "c_name", maxDist = 1)
        .select(col("a_id"), col("b_id"), col("dist").cast("long").as("dist"))
        .orderBy(col("a_id"), col("b_id")),
    Some("""SELECT a.c_custkey AS a_id, b.c_custkey AS b_id,
        levenshtein(a.c_name, b.c_name) AS dist
      FROM customer a JOIN customer b
        ON a.c_custkey < b.c_custkey AND levenshtein(a.c_name, b.c_name) <= 1
      ORDER BY a_id, b_id"""))

  /** C3 quantized similarity search
    * ([[graft.operators.Similarity.quantizedTopK]]): top-5 cosine over
    * int8 codes via asymmetric distance — the scale cancels, so the
    * oracle replays code generation (q100's arithmetic) and the scoring
    * exactly; like q49/q50, even the approximate answer is
    * hash-checked, not recall-bounded. */
  private val q102 = Q(
    "q102_quantized_topk",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      graft.operators.Similarity.quantizedTopK(
          emb.filter(col("vec_id") < 8), emb, "vec_id", "vec_id",
          "embedding", 5)
        .orderBy(col("q_id"), col("rank"))
    },
    Some("""WITH cq AS (SELECT vec_id, embedding,
          list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS s0
        FROM embeddings),
      codes AS (SELECT vec_id,
          list_transform(embedding, x -> CASE WHEN s0 = 0 THEN 0
            ELSE CAST(floor(CAST(x AS DOUBLE) / s0 + 0.5) AS BIGINT) END) AS cc
        FROM cq),
      cn AS (SELECT vec_id, cc,
          sqrt(list_sum(list_transform(cc, q -> CAST(q AS DOUBLE) * CAST(q AS DOUBLE)))) AS cnorm
        FROM codes),
      qn AS (SELECT vec_id, embedding,
          sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS qnorm
        FROM embeddings WHERE vec_id < 8),
      scored AS (SELECT q.vec_id AS q_id, c.vec_id AS c_id,
          list_sum(list_transform(range(1, len(q.embedding) + 1),
            i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.cc[i] AS DOUBLE)))
            / (q.qnorm * c.cnorm) AS approx_cosine
        FROM qn q JOIN cn c ON c.vec_id <> q.vec_id AND c.cnorm > 0)
      SELECT q_id, rank, c_id, approx_cosine FROM (
        SELECT q_id, c_id, approx_cosine,
          ROW_NUMBER() OVER (PARTITION BY q_id
            ORDER BY approx_cosine DESC, c_id) AS rank
        FROM scored)
      WHERE rank <= 5 ORDER BY q_id, rank"""))

  /** C2 block-dedup RECONSTRUCTION ([[BlockDedup.dropDuplicateBlocks]]):
    * q99 hash-checks the stats; this hash-checks the rewritten corpus
    * itself — md5 of each doc's deduped text (kept blocks, original
    * order). The oracle rebuilds with an ordered filtered string_agg. */
  private val q103 = Q(
    "q103_block_dedup_rewrite",
    (s, dir) =>
      BlockDedup.dropDuplicateBlocks(
        t(s, dir, "documents").select(col("doc_id"), col("text")),
        "doc_id", "text", blockTokens = 10)
        .select(col("doc_id"),
          length(col("text")).cast("long").as("n_chars_after"),
          md5(col("text")).as("text_fp"))
        .orderBy(col("doc_id")),
    Some("""WITH w AS (SELECT doc_id, string_split(lower(text),' ') AS ws FROM documents),
      bl AS (SELECT doc_id, p,
          array_to_string(ws[(p*10+1):(p*10+10)], ' ') AS b,
          ('0x' || substr(md5(array_to_string(ws[(p*10+1):(p*10+10)], ' ')), 1, 15))::BIGINT AS h
        FROM (SELECT doc_id, ws, unnest(range(0, CAST(ceil(len(ws) / 10.0) AS BIGINT))) AS p
              FROM w WHERE len(ws) > 0)),
      k AS (SELECT doc_id, p, b,
          ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, p) AS rn FROM bl),
      rec AS (SELECT doc_id,
          coalesce(string_agg(b, ' ' ORDER BY p) FILTER (WHERE rn = 1), '') AS t2
        FROM k GROUP BY doc_id)
      SELECT d.doc_id,
        length(coalesce(t2, d.text)) AS n_chars_after,
        md5(coalesce(t2, d.text)) AS text_fp
      FROM documents d LEFT JOIN rec USING (doc_id) ORDER BY doc_id"""))

  /** B6 at scale: EXACT global quantiles via multi-pass histogram
    * narrowing ([[graft.operators.ExactQuantile]]) — no per-group value
    * buffer, O(bins) task memory, ~3 levels at this SF. The driver holds
    * only the 3 results; the selection itself is distributed. */
  private val q104 = Q(
    "q104_exact_global_quantiles",
    (s, dir) => {
      val qs = graft.operators.ExactQuantile.quantiles(
        t(s, dir, "lineitem"), "l_extendedprice", Seq(0.5, 0.9, 0.99))
      import s.implicits._
      qs.toDF("p", "value")
        .select(col("p"), round(col("value"), 6).as("value"))
        .orderBy(col("p"))
    },
    Some("""SELECT CAST(0.5 AS DOUBLE) AS p,
        round(CAST(quantile_cont(l_extendedprice, 0.5) AS DOUBLE), 6) AS value FROM lineitem
      UNION ALL SELECT CAST(0.9 AS DOUBLE),
        round(CAST(quantile_cont(l_extendedprice, 0.9) AS DOUBLE), 6) FROM lineitem
      UNION ALL SELECT CAST(0.99 AS DOUBLE),
        round(CAST(quantile_cont(l_extendedprice, 0.99) AS DOUBLE), 6) FROM lineitem
      ORDER BY p"""))

  /** C3 IVF-SQ ([[graft.operators.Similarity.ivfTopKQuantizedFixedCodebook]]):
    * inverted-file probe (q59's fixed codebook) + int8 ADC scoring
    * (q102's arithmetic) — both scale levers in one plan, and the
    * oracle replays assignment, probing, quantization, and scoring
    * exactly, so the composed approximate pipeline is hash-checked. */
  private val q105 = Q(
    "q105_ivf_quantized",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      graft.operators.Similarity.ivfTopKQuantizedFixedCodebook(
          emb.filter(col("vec_id") < 50), emb, "vec_id", "vec_id",
          "embedding", k = 3, nlist = 16, nprobe = 4)
        .orderBy(col("q_id"), col("rank"))
    },
    Some("""WITH cb AS (
        SELECT vec_id AS cell, embedding AS cbv
        FROM embeddings ORDER BY vec_id LIMIT 16),
      d2 AS (
        SELECT e.vec_id, cb.cell,
          SUM((e.embedding[CAST(i AS INT) + 1]::DOUBLE - cb.cbv[CAST(i AS INT) + 1]::DOUBLE)
            * (e.embedding[CAST(i AS INT) + 1]::DOUBLE - cb.cbv[CAST(i AS INT) + 1]::DOUBLE)) AS d2
        FROM embeddings e CROSS JOIN cb, (SELECT unnest(range(64)) AS i)
        GROUP BY 1, 2),
      asg AS (
        SELECT vec_id AS c_id, cell FROM (
          SELECT vec_id, cell,
            ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn
          FROM d2)
        WHERE rn = 1),
      probes AS (
        SELECT vec_id AS q_id, cell FROM (
          SELECT vec_id, cell,
            ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn
          FROM d2 WHERE vec_id < 50)
        WHERE rn <= 4),
      cq AS (SELECT vec_id, embedding,
          list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS s0
        FROM embeddings),
      cn AS (SELECT vec_id, cc,
          sqrt(list_sum(list_transform(cc, q -> CAST(q AS DOUBLE) * CAST(q AS DOUBLE)))) AS cnorm
        FROM (SELECT vec_id,
            list_transform(embedding, x -> CASE WHEN s0 = 0 THEN 0
              ELSE CAST(floor(CAST(x AS DOUBLE) / s0 + 0.5) AS BIGINT) END) AS cc
          FROM cq)),
      qn AS (SELECT vec_id, embedding,
          sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS qnorm
        FROM embeddings WHERE vec_id < 50),
      scored0 AS (
        SELECT p.q_id, a.c_id,
          list_sum(list_transform(range(1, len(q.embedding) + 1),
            i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.cc[i] AS DOUBLE)))
            / (q.qnorm * c.cnorm) AS approx_cosine
        FROM probes p
        JOIN asg a ON a.cell = p.cell AND a.c_id <> p.q_id
        JOIN qn q ON q.vec_id = p.q_id
        JOIN cn c ON c.vec_id = a.c_id
        WHERE c.cnorm > 0),
      scored AS (
        SELECT q_id, c_id, approx_cosine,
          ROW_NUMBER() OVER (PARTITION BY q_id
            ORDER BY approx_cosine DESC, c_id) AS rank
        FROM scored0)
      SELECT q_id, rank, c_id, approx_cosine FROM scored
      WHERE rank <= 3 ORDER BY q_id, rank"""))

  val qs: Seq[Q] = Seq(q98, q99, q100, q101, q102, q103, q104, q105)
}
