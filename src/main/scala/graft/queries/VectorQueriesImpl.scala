package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Multimodal, Similarity}
import graft.sources.Tables

/** SURVEY §2.C vector-similarity (C3) + multimodal (C4) queries.
  *
  * Oracle-parity caveat (applies to every FP oracle below — q49/q50/q59's
  * dots, d2 argmins, and sign tests): "replays bit-identically" is an
  * EMPIRICAL guarantee, not an algebraic one. The engine computes each
  * dot/norm/d2 as a left-to-right sequential fold; SQL `SUM` has
  * unspecified accumulation order, so a near-zero dot (the `dp > 0` sign
  * test) or a near-tied argmin could in principle flip under a different
  * DuckDB version, thread count, or data draw. Validated bit-exact at
  * sf0.01 and sf0.1 on DuckDB as shipped here; a future mismatch on one
  * of these queries should be triaged as possible summation-order skew
  * before being treated as an engine bug. */
object VectorQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  /** C3 exact brute-force cosine top-5 for 8 query vectors. DuckDB's
    * list_cosine_similarity over DOUBLE[] is bit-identical to our
    * sequential-fold HOF cosine (verified empirically). */
  private val q49 = Q(
    "q49_cosine_topk",
    (s, dir) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      Similarity.bruteForceTopK(
          emb.filter($"vec_id" < 8), emb, "vec_id", "vec_id", "embedding", 5)
        .orderBy($"q_id", $"rank")
    },
    Some("""SELECT q_id, rank, c_id, cosine FROM (
      SELECT q.vec_id AS q_id, c.vec_id AS c_id,
        list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) AS cosine,
        ROW_NUMBER() OVER (PARTITION BY q.vec_id
          ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC, c.vec_id) AS rank
      FROM (SELECT * FROM embeddings WHERE vec_id < 8) q
      JOIN embeddings c ON c.vec_id <> q.vec_id)
      WHERE rank <= 5 ORDER BY q_id, rank"""))

  /** C3 scale path: random-hyperplane LSH bucketed approximate top-3.
    * Planes are md5-derived ([[Similarity.hashPlanes]]) so the oracle
    * regenerates them in SQL and replays the ENTIRE approximate pipeline
    * — plane weights, sign-bit buckets, multi-table candidate union,
    * exact re-rank — making even the approximate answer hash-checked
    * (not just recall-bounded). */
  private val q50 = Q(
    "q50_cosine_lsh",
    (s, dir) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      val tables = Similarity.hashPlanes(tables = 10, bits = 4, dim = 64)
      Similarity.lshTopK(
          emb.filter($"vec_id" < 50), emb, "vec_id", "vec_id", "embedding", 3, tables)
        .orderBy($"q_id", $"rank")
    },
    Some("""WITH planes AS (
        SELECT l, j, d,
          (('0x' || substr(md5(l || ':' || j || ':' || d), 1, 15))::BIGINT)::DOUBLE
            / 576460752303423488.0 - 1.0 AS w
        FROM (SELECT unnest(range(10)) AS l),
             (SELECT unnest(range(4)) AS j),
             (SELECT unnest(range(64)) AS d)),
      nv AS (
        -- engine parity: a wrong-length vector or a null element zeroes
        -- every bucket (LshBuckets' HOF null-poisoning semantics)
        SELECT e.vec_id,
          (len(e.embedding) <> 64)
            OR BOOL_OR(e.embedding[CAST(i.i AS INT) + 1] IS NULL) AS bad
        FROM embeddings e, (SELECT unnest(range(64)) AS i) i
        GROUP BY e.vec_id, len(e.embedding)),
      dots AS (
        SELECT e.vec_id, p.l, p.j,
          SUM(e.embedding[CAST(p.d AS INT) + 1]::DOUBLE * p.w) AS dp
        FROM embeddings e CROSS JOIN planes p
        GROUP BY 1, 2, 3),
      buckets AS (
        SELECT dots.vec_id, l,
          CAST(CASE WHEN MAX(nv.bad::INT) = 1 THEN 0
            ELSE SUM(CASE WHEN dp > 0 THEN (1::BIGINT << CAST(j AS INT)) ELSE 0 END)
          END AS BIGINT) AS bucket
        FROM dots JOIN nv ON nv.vec_id = dots.vec_id
        GROUP BY 1, 2),
      cand AS (
        SELECT DISTINCT q.vec_id AS q_id, c.vec_id AS c_id
        FROM buckets q JOIN buckets c ON q.l = c.l AND q.bucket = c.bucket
        WHERE q.vec_id < 50 AND c.vec_id <> q.vec_id),
      scored AS (
        SELECT cand.q_id, cand.c_id,
          list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) AS cosine,
          ROW_NUMBER() OVER (PARTITION BY cand.q_id
            ORDER BY list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) DESC,
              cand.c_id) AS rank
        FROM cand
        JOIN embeddings a ON a.vec_id = cand.q_id
        JOIN embeddings b ON b.vec_id = cand.c_id)
      SELECT q_id, rank, c_id, cosine FROM scored
      WHERE rank <= 3 ORDER BY q_id, rank"""))

  /** C4 multimodal join: relational metadata ⋈ embedding vectors sharing
    * an id space, plus binary payload length. */
  private val q51 = Q(
    "q51_multimodal_join",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .join(t(s, dir, "embeddings"), $"doc_id" === $"vec_id")
        .select(
          $"doc_id", $"lang", $"source", $"label",
          $"n_chars",
          octet_length($"text").cast("long").as("byte_len"),
          size($"embedding").cast("long").as("dim"))
        .orderBy($"doc_id")
    },
    Some("""SELECT doc_id, lang, source, label, n_chars,
      CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
      CAST(len(embedding) AS BIGINT) AS dim
      FROM documents JOIN embeddings ON doc_id = vec_id
      ORDER BY doc_id"""))

  /** C4 blob feature extraction: binary column → partition-parallel
    * mapPartitions "decode" (stubbed byte histogram; see Multimodal).
    * The feature array is exploded to one (doc, bin) row per bucket so
    * every cell is scalar, and the histogram itself is oracled: DuckDB
    * recomputes it byte-by-byte from hex(encode(text)). count/n double
    * division is exact-parity on both engines. */
  private val q52 = Q(
    "q52_blob_features",
    (s, dir) => {
      import s.implicits._
      val blobs = Multimodal.withBlob(t(s, dir, "documents"), "doc_id", "text")
      Multimodal.extractFeatures(blobs, "doc_id", bins = 16)
        .select($"doc_id", $"byte_len",
          posexplode($"features").as(Seq("bin", "feature")))
        .withColumn("bin", $"bin".cast("long"))
        .orderBy($"doc_id", $"bin")
    },
    Some("""WITH d AS (
        SELECT doc_id, octet_length(encode(text)) AS n, hex(encode(text)) AS h
        FROM documents),
      bytes AS (
        SELECT doc_id, ('0x' || substr(h, 2 * CAST(i AS INT) + 1, 2))::INT AS b
        FROM (SELECT doc_id, h, unnest(range(n)) AS i FROM d)),
      cnt AS (
        SELECT doc_id, (b * 16) // 256 AS bin, COUNT(*)::DOUBLE AS c
        FROM bytes GROUP BY 1, 2),
      grid AS (
        SELECT doc_id, n, unnest(range(16)) AS bin FROM d)
      SELECT g.doc_id, CAST(g.n AS BIGINT) AS byte_len, CAST(g.bin AS BIGINT) AS bin,
        COALESCE(c.c, 0.0) / GREATEST(g.n, 1) AS feature
      FROM grid g LEFT JOIN cnt c ON g.doc_id = c.doc_id AND g.bin = c.bin
      ORDER BY g.doc_id, g.bin"""))

  /** C4 frame sampling: fixed-size windows at a fixed stride over the
    * blob (the video/audio frame-extraction shape), one row per frame
    * with offset/length/feature. The per-frame byte mean is recomputed
    * byte-by-byte by the DuckDB oracle — integer sum over double
    * division, exact parity. Stride (128) > frame size (64) keeps frames
    * disjoint so the oracle's i//stride bucketing is exact. */
  private val q69 = Q(
    "q69_blob_frames",
    (s, dir) => {
      import s.implicits._
      val blobs = Multimodal.withBlob(t(s, dir, "documents"), "doc_id", "text")
      Multimodal.sampleFrames(blobs, "doc_id", frameSize = 64, stride = 128)
        .orderBy($"doc_id", $"frame_idx")
    },
    Some("""WITH d AS (
        SELECT doc_id, octet_length(encode(text)) AS n, hex(encode(text)) AS h
        FROM documents),
      bytes AS (
        SELECT doc_id, CAST(i AS INT) AS i,
          ('0x' || substr(h, 2 * CAST(i AS INT) + 1, 2))::INT AS b
        FROM (SELECT doc_id, h, unnest(range(n)) AS i FROM d)),
      fb AS (
        SELECT doc_id, i // 128 AS f, SUM(b) AS s, COUNT(*) AS c
        FROM bytes WHERE i % 128 < 64 GROUP BY 1, 2),
      grid AS (
        SELECT doc_id, unnest(range(GREATEST((n + 127) // 128, 1))) AS f FROM d)
      SELECT g.doc_id,
        CAST(g.f AS BIGINT) AS frame_idx,
        CAST(g.f * 128 AS BIGINT) AS frame_off,
        CAST(COALESCE(fb.c, 0) AS BIGINT) AS frame_len,
        COALESCE(fb.s, 0)::DOUBLE / GREATEST(COALESCE(fb.c, 0), 1) AS frame_mean
      FROM grid g LEFT JOIN fb ON g.doc_id = fb.doc_id AND g.f = fb.f
      ORDER BY g.doc_id, frame_idx"""))

  /** B15 scalar UDF surface: extract the numeric id from c_name. (The
    * codegen'd-expression preference is demonstrated by SimHash64; this
    * query pins the plain-UDF path.) */
  private val q53 = Q(
    "q53_udf_scalar",
    (s, dir) => {
      import s.implicits._
      val custId = udf((name: String) =>
        "([0-9]+)$".r.findFirstIn(name).map(_.toLong).getOrElse(-1L))
      t(s, dir, "customer")
        .select($"c_custkey", $"c_name", custId($"c_name").as("parsed_id"))
        .orderBy($"c_custkey")
    },
    Some("""SELECT c_custkey, c_name,
      CAST(regexp_extract(c_name, '([0-9]+)$', 1) AS BIGINT) AS parsed_id
      FROM customer ORDER BY c_custkey"""))

  /** B15/B8: custom bounded-heap top-k AGGREGATE (map-side combine, no
    * window sort) — same result as the window formulation, different
    * (shuffle-light) physical plan. */
  private val q54 = Q(
    "q54_topk_agg",
    (s, dir) => {
      import s.implicits._
      val fn = graft.functions.TopKAgg.register(s, 3)
      t(s, dir, "part")
        .groupBy($"p_brand")
        .agg(expr(s"$fn(p_retailprice)").as("__top"))
        .select($"p_brand",
          // try_element_at: NULL (not an ANSI error) when a group has
          // fewer than 3 rows — matching the oracle's lst[2]/lst[3]
          try_element_at($"__top", lit(1)).as("top1"),
          try_element_at($"__top", lit(2)).as("top2"),
          try_element_at($"__top", lit(3)).as("top3"))
        .orderBy($"p_brand")
    },
    Some("""SELECT p_brand, lst[1] AS top1, lst[2] AS top2, lst[3] AS top3
      FROM (SELECT p_brand,
        (list(p_retailprice ORDER BY p_retailprice DESC, p_partkey))[1:3] AS lst
        FROM part GROUP BY p_brand)
      ORDER BY p_brand"""))

  /** C3 IVF approximate top-k with a fixed sampled codebook (the 16
    * lowest-id vectors): inverted-file assignment, nprobe=4 probing,
    * exact re-rank — every step deterministic relational algebra, so the
    * DuckDB oracle replays the WHOLE approximate search (assignment
    * argmin, probe ranking, cosine top-3) and hash-matches it. The
    * KMeans-trained codebook variant ([[Similarity.ivfTopK]]) is the
    * production quantizer, recall-tested in CTierSpec. */
  private val q59 = Q(
    "q59_cosine_ivf",
    (s, dir) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      Similarity.ivfTopKFixedCodebook(
          emb.filter($"vec_id" < 50), emb, "vec_id", "vec_id", "embedding",
          k = 3, nlist = 16, nprobe = 4)
        .orderBy($"q_id", $"rank")
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
      scored AS (
        SELECT p.q_id, a.c_id,
          list_cosine_similarity(qa.embedding::DOUBLE[], ca.embedding::DOUBLE[]) AS cosine,
          ROW_NUMBER() OVER (PARTITION BY p.q_id
            ORDER BY list_cosine_similarity(qa.embedding::DOUBLE[], ca.embedding::DOUBLE[]) DESC,
              a.c_id) AS rank
        FROM probes p
        JOIN asg a ON a.cell = p.cell AND a.c_id <> p.q_id
        JOIN embeddings qa ON qa.vec_id = p.q_id
        JOIN embeddings ca ON ca.vec_id = a.c_id)
      SELECT q_id, rank, c_id, cosine FROM scored
      WHERE rank <= 3 ORDER BY q_id, rank"""))

  /** C2/C3 embedding-cosine near-dup at a HIGH-RECALL LSH working
    * point: 32 tables × 3 bits (q67 is the cost-tuned 24×3 point; the
    * seeded table stream makes q65's first 24 tables identical to
    * q67's, so its candidate set is a strict superset and recall can
    * only be higher). The ORACLE is still the exact all-pairs join —
    * but no DECLARED query runs all-pairs anymore (VERDICT r7 #9):
    * the brute-force form survives only as the oracle SQL and as
    * [[Similarity.cosineNearDupPairs]], the spec-side baseline
    * (CTierSpec) recall is measured against. Same data-coupled-gate
    * caveat as q67: hash-green ⇔ 100% recall on this fixture. */
  private val q65 = Q(
    "q65_cosine_neardup",
    (s, dir) => {
      import s.implicits._
      val tables = Similarity.hyperplaneTables(tables = 32, bitsPerTable = 3, dim = 64)
      Similarity.lshNearDupPairs(
          t(s, dir, "embeddings"), "vec_id", "embedding", tau = 0.45, tables)
        .orderBy($"a_id", $"b_id")
    },
    Some("""SELECT a_id, b_id, cosine FROM (
      SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) AS cosine
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
      WHERE cosine >= 0.45 ORDER BY a_id, b_id"""))

  /** C2/C3 LSH-candidates + exact-verify near-dup: the corpus-scale form
    * of q65. 3-bit buckets × 24 tables push the miss rate of a ≥0.45-
    * cosine pair to ~5e-4 (16 tables measurably missed 1/144 pairs at
    * sf0.1); the oracle is the EXACT all-pairs SQL — the query only
    * hash-matches if LSH recall is 100% on this data, which it is
    * (verified at sf0.01 AND sf0.1; CTierSpec asserts it at sf0.001).
    *
    * Data-coupled gate: 100% recall is a probabilistic property of THIS
    * fixture, not of the algorithm — a regenerated embeddings table or a
    * new SF could legitimately miss a pair (expected ~5e-4 of true pairs)
    * with no code bug. If this query ever hash-mismatches, first diff the
    * engine output against the oracle rows: missing pairs only ⇒ recall
    * loss (retune tables/bits or accept), anything else ⇒ real bug. */
  private val q67 = Q(
    "q67_lsh_neardup",
    (s, dir) => {
      import s.implicits._
      val tables = Similarity.hyperplaneTables(tables = 24, bitsPerTable = 3, dim = 64)
      Similarity.lshNearDupPairs(
          t(s, dir, "embeddings"), "vec_id", "embedding", tau = 0.45, tables)
        .orderBy($"a_id", $"b_id")
    },
    Some("""SELECT a_id, b_id, cosine FROM (
      SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) AS cosine
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
      WHERE cosine >= 0.45 ORDER BY a_id, b_id"""))

  /** C2/C3 semantic dedup ([[Similarity.semanticDedup]], SemDeDup):
    * coarse-quantize the embedding space (fixed 16-vector codebook, the
    * q59 bootstrap), then near-dup ONLY within each Voronoi cell — the
    * corpus-scale shape where all-pairs work drops to Σ|cell|². The
    * oracle replays assignment argmin, in-cell pairs, the keep-first
    * rule, and the best-duplicate choice exactly. */
  private val q90 = Q(
    "q90_semantic_dedup",
    (s, dir) => {
      import s.implicits._
      Similarity.semanticDedup(
          t(s, dir, "embeddings"), "vec_id", "embedding", tau = 0.45, nlist = 16)
        .orderBy($"vec_id")
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
        SELECT vec_id, cell FROM (
          SELECT vec_id, cell,
            ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn
          FROM d2)
        WHERE rn = 1),
      pairs AS (
        SELECT aa.vec_id AS a_id, bb.vec_id AS b_id,
          list_cosine_similarity(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[]) AS cosine
        FROM asg aa JOIN asg bb ON aa.cell = bb.cell AND aa.vec_id > bb.vec_id
        JOIN embeddings ea ON ea.vec_id = aa.vec_id
        JOIN embeddings eb ON eb.vec_id = bb.vec_id),
      best AS (
        SELECT a_id, b_id AS dup_of, cosine FROM (
          SELECT a_id, b_id, cosine,
            ROW_NUMBER() OVER (PARTITION BY a_id ORDER BY cosine DESC, b_id) AS rn
          FROM pairs WHERE cosine >= 0.45)
        WHERE rn = 1)
      SELECT e.vec_id, asg.cell, best.dup_of IS NULL AS is_kept,
        best.dup_of, best.cosine
      FROM embeddings e
      JOIN asg ON asg.vec_id = e.vec_id
      LEFT JOIN best ON best.a_id = e.vec_id
      ORDER BY e.vec_id"""))

  /** C3 dimensionality reduction: mean-center the corpus, then
    * Johnson-Lindenstrauss-project 64 → 16 dims with the md5-derived
    * matrix trick of q50 (uniform [−1,1) entries any engine can
    * regenerate), and run top-5 search IN THE PROJECTED SPACE with the
    * centered full-space cosine beside it — the memory/compute trade of
    * vector search (4× smaller vectors, approximately preserved
    * geometry). Centering matters: these embeddings have a nonzero mean,
    * and without it every projection shares one dominant common
    * component and all projected cosines collapse toward 1.
    *
    * Scale shape: the per-dim mean is one tiny aggregate broadcast as a
    * single 64-value row; centering + projection are then one
    * projection pass per row — no shuffle; search reuses the
    * brute-force top-k shape. Oracle replays matrix, means, centering,
    * projection, ranking, and both cosines (q50-class empirical FP
    * parity, validated at both SFs). */
  private val q95 = Q(
    "q95_jl_projection",
    (s, dir) => {
      import s.implicits._
      val emb = t(s, dir, "embeddings")
      val matR = Similarity.hashPlanes(tables = 1, bits = 16, dim = 64)(0)
      val means = emb.agg(array((0 until 64).map(d =>
        avg($"embedding"(d).cast("double"))): _*).as("__m"))
      val centered = emb.crossJoin(broadcast(means))
        .select($"vec_id",
          zip_with($"embedding", $"__m", (x, m) => x.cast("double") - m).as("cvec"))
      val proj = centered.select($"vec_id",
        // native dot (r19): 16 interpreted HOF folds per row → 16 fused
        // loops; cvec and the literal rows are double arrays, so the
        // cast-first native fold is bit-identical to Similarity.dot
        array(matR.map(row => Similarity.dotD($"cvec", typedlit(row.toSeq))): _*).as("pvec"))
      val topk = Similarity.bruteForceTopK(proj.filter($"vec_id" < 8), proj,
        "vec_id", "vec_id", "pvec", 5)
      topk.join(centered.select($"vec_id".as("q_id"), $"cvec".as("__qe")), "q_id")
        .join(centered.select($"vec_id".as("c_id"), $"cvec".as("__ce")), "c_id")
        .select($"q_id", $"rank", $"c_id",
          round($"cosine", 6).as("cosine_proj"),
          round(Similarity.cosineHof($"__qe", $"__ce"), 6).as("cosine_full"))
        .orderBy($"q_id", $"rank")
    },
    Some("""WITH r AS (
        SELECT j AS k, d,
          (('0x' || substr(md5('0:' || j || ':' || d), 1, 15))::BIGINT)::DOUBLE
            / 576460752303423488.0 - 1.0 AS w
        FROM (SELECT unnest(range(16)) AS j), (SELECT unnest(range(64)) AS d)),
      m AS (
        SELECT d, AVG(embedding[CAST(d AS INT) + 1]::DOUBLE) AS mu
        FROM embeddings, (SELECT unnest(range(64)) AS d) GROUP BY d),
      cv AS (
        SELECT e.vec_id, m.d,
          e.embedding[CAST(m.d AS INT) + 1]::DOUBLE - m.mu AS x
        FROM embeddings e CROSS JOIN m),
      cvl AS (SELECT vec_id, list(x ORDER BY d) AS cvec FROM cv GROUP BY vec_id),
      p AS (
        SELECT cv.vec_id, r.k, SUM(cv.x * r.w) AS y
        FROM cv JOIN r ON r.d = cv.d GROUP BY 1, 2),
      pv AS (SELECT vec_id, list(y ORDER BY k) AS pvec FROM p GROUP BY vec_id),
      scored AS (
        SELECT q.vec_id AS q_id, c.vec_id AS c_id,
          list_cosine_similarity(q.pvec, c.pvec) AS cp,
          ROW_NUMBER() OVER (PARTITION BY q.vec_id
            ORDER BY list_cosine_similarity(q.pvec, c.pvec) DESC, c.vec_id) AS rank
        FROM pv q JOIN pv c ON q.vec_id < 8 AND c.vec_id <> q.vec_id)
      SELECT q_id, rank, c_id, round(cp, 6) AS cosine_proj,
        round(list_cosine_similarity(a.cvec, b.cvec), 6) AS cosine_full
      FROM scored
      JOIN cvl a ON a.vec_id = q_id
      JOIN cvl b ON b.vec_id = c_id
      WHERE rank <= 5 ORDER BY q_id, rank"""))

  def qs: Seq[Q] = Seq(q49, q50, q51, q52, q53, q54, q59, q65, q67, q69, q90, q95)
}
