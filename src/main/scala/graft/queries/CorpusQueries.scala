package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Components, NearDup}
import graft.sources.Tables

/** Round-3 additions to the LLM training-data pipeline family (SURVEY
  * §2.C): cluster-level dedup, contamination checks, PII redaction,
  * sequence packing, repetition scoring, weighted sampling. Each one is
  * a scale-shaped operator AND fully DuckDB-oracled. */
object CorpusQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  /** Shared md5-mode MinHash-LSH signature SQL (bit-identical to q47's
    * pipeline — n=3, k=8, bands=4, r=2). */
  private val sigCte =
    """w AS (SELECT doc_id, string_split(lower(text),' ') AS words FROM documents),
      g AS (SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(words)-1, 2)), i -> array_to_string(words[i:i+2],' '))) AS grams FROM w),
      sig AS (SELECT doc_id, grams, [
        list_min(list_transform(grams, x -> md5('0:' || x))),
        list_min(list_transform(grams, x -> md5('1:' || x))),
        list_min(list_transform(grams, x -> md5('2:' || x))),
        list_min(list_transform(grams, x -> md5('3:' || x))),
        list_min(list_transform(grams, x -> md5('4:' || x))),
        list_min(list_transform(grams, x -> md5('5:' || x))),
        list_min(list_transform(grams, x -> md5('6:' || x))),
        list_min(list_transform(grams, x -> md5('7:' || x)))] AS sig FROM g),
      bk AS (SELECT doc_id, unnest([
        md5('0|' || sig[1] || '|' || sig[2]),
        md5('1|' || sig[3] || '|' || sig[4]),
        md5('2|' || sig[5] || '|' || sig[6]),
        md5('3|' || sig[7] || '|' || sig[8])]) AS bk FROM sig)"""

  /** Self-join pair CTEs (tau=0.5) on top of [[sigCte]]. */
  private val pairsCte =
    s"""$sigCte,
      cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
        FROM bk a JOIN bk b ON a.bk = b.bk AND a.doc_id < b.doc_id),
      pairs AS (SELECT a_id, b_id FROM (
        SELECT a_id, b_id,
          CAST(len(list_intersect(ga.grams, gb.grams)) AS DOUBLE)
            / CAST(len(list_distinct(list_concat(ga.grams, gb.grams))) AS DOUBLE) AS jaccard
        FROM cand JOIN g ga ON ga.doc_id = a_id JOIN g gb ON gb.doc_id = b_id)
        WHERE jaccard >= 0.5)"""

  /** Cross-corpus (batch vs corpus) verified-pair CTEs on [[sigCte]]:
    * incoming = doc_id % 7 == 1, corpus = the rest. */
  private val pairsCte2 =
    s"""$sigCte,
      ibk AS (SELECT doc_id AS inc_id, bk FROM bk WHERE doc_id % 7 = 1),
      cbk AS (SELECT doc_id AS corp_id, bk FROM bk WHERE doc_id % 7 <> 1),
      cand AS (SELECT DISTINCT inc_id, corp_id FROM ibk JOIN cbk USING (bk)),
      ver AS (SELECT inc_id, corp_id, jaccard FROM (
        SELECT inc_id, corp_id,
          CAST(len(list_intersect(gi.grams, gc.grams)) AS DOUBLE)
            / CAST(len(list_distinct(list_concat(gi.grams, gc.grams))) AS DOUBLE) AS jaccard
        FROM cand JOIN g gi ON gi.doc_id = inc_id JOIN g gc ON gc.doc_id = corp_id)
        WHERE jaccard >= 0.5)"""

  /** C2 completion: near-dup PAIRS → dedup CLUSTERS via connected
    * components ([[Components.clusterDedup]], min-label propagation —
    * diameter-bounded rounds of (node,label) shuffles). Every document
    * gets its cluster id (smallest member), the cluster size, and the
    * canonical-keeper bit. The oracle replays the full pipeline: q47's
    * md5 LSH pairs, then transitive closure as a recursive CTE. */
  private val q81 = Q(
    "q81_neardup_clusters",
    (s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val pairs = NearDup.nearDupPairs(docs, "doc_id", "text",
        n = 3, k = 8, bands = 4, r = 2, tau = 0.5, mode = NearDup.Md5Hash)
      Components.clusterDedup(docs.select($"doc_id"), "doc_id",
          pairs, "a_id", "b_id")
        .select($"doc_id", $"cluster_id", $"cluster_size".cast("long").as("cluster_size"),
          $"is_canonical")
        .orderBy($"doc_id")
    },
    Some(s"""WITH RECURSIVE $pairsCte,
      edges AS (SELECT a_id AS u, b_id AS v FROM pairs
        UNION SELECT b_id, a_id FROM pairs),
      reach(id, r) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT re.id, e.v FROM reach re JOIN edges e ON re.r = e.u),
      lab AS (SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id),
      sz AS (SELECT cluster_id, COUNT(*) AS cluster_size FROM lab GROUP BY cluster_id)
      SELECT doc_id, cluster_id, cluster_size, doc_id = cluster_id AS is_canonical
      FROM lab JOIN sz USING (cluster_id) ORDER BY doc_id"""))

  /** Benchmark-decontamination check ([[graft.operators.Contamination]]):
    * docs with doc_id % 5 == 3 play the eval set, the rest the training
    * corpus; score = fraction of each eval doc's distinct 3-grams found
    * anywhere in train. Grams cross the shuffle as 60-bit md5-derived
    * longs (never strings); the oracle replays the hashing bit-exactly. */
  private val q82 = Q(
    "q82_contamination",
    (s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val test = docs.filter($"doc_id" % 5 === 3)
      val train = docs.filter($"doc_id" % 5 =!= 3)
      graft.operators.Contamination
        .overlapScores(test, train, "doc_id", "text", n = 3)
        .withColumn("flagged", $"contamination" >= 0.8)
        .orderBy($"doc_id")
    },
    Some("""WITH w AS (SELECT doc_id, string_split(lower(text),' ') AS words FROM documents),
      g AS (SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(words)-1, 2)), i -> array_to_string(words[i:i+2],' '))) AS grams FROM w),
      te AS (SELECT doc_id, ('0x' || substr(md5(gram), 1, 15))::BIGINT AS h
        FROM (SELECT doc_id, unnest(grams) AS gram FROM g WHERE doc_id % 5 = 3)),
      tr AS (SELECT DISTINCT ('0x' || substr(md5(gram), 1, 15))::BIGINT AS h
        FROM (SELECT doc_id, unnest(grams) AS gram FROM g WHERE doc_id % 5 <> 3)),
      tot AS (SELECT doc_id, COUNT(*) AS n_grams FROM te GROUP BY doc_id),
      hit AS (SELECT doc_id, COUNT(*) AS n_overlap FROM te
        WHERE h IN (SELECT h FROM tr) GROUP BY doc_id)
      SELECT doc_id, n_grams, COALESCE(n_overlap, 0) AS n_overlap,
        CAST(COALESCE(n_overlap, 0) AS DOUBLE) / CAST(n_grams AS DOUBLE) AS contamination,
        CAST(COALESCE(n_overlap, 0) AS DOUBLE) / CAST(n_grams AS DOUBLE) >= 0.8 AS flagged
      FROM tot LEFT JOIN hit USING (doc_id) ORDER BY doc_id"""))

  /** C5 PII scrub ([[graft.functions.TextFunctions.redactPii]]): the
    * pre-training redaction pass. The corpus is synthetic (no real PII),
    * so deterministic doc_id-derived emails/phones/IPs/account numbers
    * are appended to two-thirds of the docs first — both engines replay
    * the injection, the per-pattern counts, and the ordered
    * regexp_replace battery identically (patterns restricted to the
    * Java-regex ∩ RE2 dialect). */
  private val q83 = Q(
    "q83_pii_redaction",
    (s, dir) => {
      import s.implicits._
      import graft.functions.{TextFunctions => TF}
      val str = (c: org.apache.spark.sql.Column) => c.cast("string")
      val withPii = t(s, dir, "documents").withColumn("text2",
        when($"doc_id" % 3 === 2, $"text").otherwise(concat(
          $"text",
          lit(" contact user"), str($"doc_id"), lit("@mail.example.org"),
          lit(" phone 555-"), lpad(str($"doc_id" % 1000), 3, "0"),
          lit("-"), lpad(str(($"doc_id" * 7) % 10000), 4, "0"),
          lit(" ip 10."), str($"doc_id" % 256), lit(".0."), str(($"doc_id" * 13) % 256),
          lit(" acct "), lpad(str(($"doc_id" * 99991) % 1000000000), 10, "0"))))
      withPii.select(
          $"doc_id",
          TF.piiCount($"text2", TF.PII_PATTERNS(0)._1).as("n_emails"),
          TF.piiCount($"text2", TF.PII_PATTERNS(1)._1).as("n_phones"),
          TF.piiCount($"text2", TF.PII_PATTERNS(2)._1).as("n_ips"),
          TF.piiCount($"text2", TF.PII_PATTERNS(3)._1).as("n_nums"),
          md5(TF.redactPii($"text2")).as("redacted_fp"))
        .orderBy($"doc_id")
    },
    Some("""WITH p AS (SELECT doc_id,
        CASE WHEN doc_id % 3 = 2 THEN text ELSE text
          || ' contact user' || doc_id || '@mail.example.org'
          || ' phone 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
          || '-' || lpad(CAST((doc_id * 7) % 10000 AS VARCHAR), 4, '0')
          || ' ip 10.' || (doc_id % 256) || '.0.' || ((doc_id * 13) % 256)
          || ' acct ' || lpad(CAST((doc_id * 99991) % 1000000000 AS VARCHAR), 10, '0')
        END AS text2 FROM documents)
      SELECT doc_id,
        CAST(len(regexp_extract_all(text2, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}')) AS BIGINT) AS n_emails,
        CAST(len(regexp_extract_all(text2, '\d{3}-\d{3}-\d{4}')) AS BIGINT) AS n_phones,
        CAST(len(regexp_extract_all(text2, '\b\d{1,3}(\.\d{1,3}){3}\b')) AS BIGINT) AS n_ips,
        CAST(len(regexp_extract_all(text2, '\d{9,}')) AS BIGINT) AS n_nums,
        md5(regexp_replace(regexp_replace(regexp_replace(regexp_replace(text2,
          '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
          '\d{3}-\d{3}-\d{4}', '<PHONE>', 'g'),
          '\b\d{1,3}(\.\d{1,3}){3}\b', '<IP>', 'g'),
          '\d{9,}', '<NUM>', 'g')) AS redacted_fp
      FROM p ORDER BY doc_id"""))

  /** Token-budget sequence packing ([[graft.operators.Packing]]):
    * concat-and-chunk block assignment at budget=512 whitespace tokens,
    * built on the two-phase distributed prefix sum (NOT a global
    * single-partition window). The oracle states the same thing as one
    * flat window — the two formulations must agree exactly, which is
    * precisely the partition-independence property the operator
    * guarantees. */
  private val q84 = Q(
    "q84_sequence_packing",
    (s, dir) => {
      import s.implicits._
      val d = t(s, dir, "documents")
        .select($"doc_id", graft.operators.Tokenize.count($"text").as("n_tok"))
      graft.operators.Packing.packBlocks(d, "doc_id", "n_tok", budget = 512L)
        .orderBy($"doc_id")
    },
    Some("""WITH d AS (SELECT doc_id,
        CAST(len(string_split(lower(text),' ')) AS BIGINT) AS n_tok FROM documents),
      c AS (SELECT doc_id, n_tok,
        CAST(COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_tok FROM d)
      SELECT doc_id, n_tok, start_tok,
        CAST(start_tok // 512 AS BIGINT) AS first_block,
        CAST((start_tok + n_tok - 1) // 512 AS BIGINT) AS last_block,
        (start_tok // 512) <> ((start_tok + n_tok - 1) // 512) AS straddles
      FROM c ORDER BY doc_id"""))

  /** C5 repetition / boilerplate scoring: per-doc duplicate-gram ratio
    * (1 - distinct/total 3-grams) and the modal gram's share — the
    * compression-proxy signals used to drop template/boilerplate pages.
    * Shape: explode NON-distinct grams → (doc, gram) count → per-doc
    * agg; two map-side-combinable shuffles, no per-row O(d·t) HOF mode
    * search. Grams ride the shuffle as 60-bit
    * [[graft.operators.Contamination.gramHash]] longs, never strings —
    * at corpus scale the (doc, gram) aggregation is the dominant
    * shuffle, and fixed-width keys make it ~10× narrower; a 2^-60
    * collision could only merge two gram counts, deterministically and
    * identically in the oracle, which replays the same md5 hash. */
  private val q85 = Q(
    "q85_repetition_score",
    (s, dir) => {
      import s.implicits._
      // tokens staged into a column: the slice lambda gets no CSE in
      // interpreted HOFs and would re-split the doc once per gram
      val ws = $"__ws"
      val rawGrams = transform(
        sequence(lit(0), greatest(size(ws) - 3, lit(0))),
        i => graft.operators.Contamination.gramHash(
          concat_ws(" ", slice(ws, i + lit(1), lit(3)))))
      val perGram = t(s, dir, "documents")
        .select($"doc_id", split(lower($"text"), " ").as("__ws"))
        .select($"doc_id", explode(rawGrams).as("h"))
        .groupBy($"doc_id", $"h").agg(count(lit(1)).as("c"))
      perGram.groupBy($"doc_id")
        .agg(sum($"c").as("n_grams"), count(lit(1)).as("n_distinct"),
          max($"c").as("max_gram_n"))
        .select($"doc_id", $"n_grams", $"n_distinct", $"max_gram_n",
          (lit(1.0) - $"n_distinct".cast("double") / $"n_grams".cast("double"))
            .as("dup_ratio"),
          ($"max_gram_n".cast("double") / $"n_grams".cast("double"))
            .as("rep_score"))
        .orderBy($"doc_id")
    },
    Some("""WITH w AS (SELECT doc_id, string_split(lower(text),' ') AS words FROM documents),
      raw AS (SELECT doc_id, ('0x' || substr(md5(g), 1, 15))::BIGINT AS h FROM
        (SELECT doc_id, unnest(list_transform(
          range(1, greatest(len(words) - 1, 2)),
          i -> array_to_string(words[i:i+2], ' '))) AS g FROM w)),
      pg AS (SELECT doc_id, h, COUNT(*) AS c FROM raw GROUP BY doc_id, h)
      SELECT doc_id,
        CAST(SUM(c) AS BIGINT) AS n_grams,
        COUNT(*) AS n_distinct,
        CAST(MAX(c) AS BIGINT) AS max_gram_n,
        1.0 - CAST(COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS dup_ratio,
        CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS rep_score
      FROM pg GROUP BY doc_id ORDER BY doc_id"""))

  /** Deterministic weighted sampling
    * ([[graft.operators.WeightedSample]]): 5 docs per source, weighted
    * by n_chars, via Efraimidis-Spirakis exponential keys over
    * md5-derived uniforms — reruns and the DuckDB oracle pick the SAME
    * rows (ranks compare on round(key,9) + id tie-break; q76-class FP
    * caveat, validated at both SFs). */
  private val q86 = Q(
    "q86_weighted_sample",
    (s, dir) => {
      import s.implicits._
      graft.operators.WeightedSample.samplePerGroup(
          t(s, dir, "documents").select($"doc_id", $"source", $"n_chars"),
          "doc_id", "n_chars", Seq("source"), k = 5, seed = "wsamp")
        .select($"source", $"rk".cast("long").as("rk"), $"doc_id", $"n_chars", $"skey")
        .orderBy($"source", $"rk")
    },
    Some("""WITH keyed AS (SELECT source, doc_id, n_chars,
        round(-ln((('0x' || substr(md5('wsamp:' || doc_id), 1, 15))::BIGINT + 1.0)
          / 1152921504606846976.0) / n_chars, 9) AS skey
        FROM documents),
      ranked AS (SELECT *, ROW_NUMBER() OVER (
        PARTITION BY source ORDER BY skey, doc_id) AS rk FROM keyed)
      SELECT source, rk, doc_id, n_chars, skey FROM ranked
      WHERE rk <= 5 ORDER BY source, rk"""))

  /** Incremental ingestion dedup ([[NearDup.crossDupPairs]]): docs with
    * doc_id % 7 == 1 play the incoming crawl batch, the rest the
    * retained corpus; every batch doc gets its keep/drop decision with
    * the best corpus match (max jaccard, id tie-break). No self-join on
    * either side; the md5 oracle replays signatures, banding, the
    * cross-join candidates, and the verify. */
  private val q87 = Q(
    "q87_incremental_dedup",
    (s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val inc = docs.filter($"doc_id" % 7 === 1)
      val corp = docs.filter($"doc_id" % 7 =!= 1)
      val pairs = NearDup.crossDupPairs(inc, corp, "doc_id", "text",
        n = 3, k = 8, bands = 4, r = 2, tau = 0.5, mode = NearDup.Md5Hash)
      val best = graft.operators.Dedup.keepOne(pairs, Seq("inc_id"),
        Seq($"jaccard".desc, $"corp_id".asc))
      inc.select($"doc_id".as("inc_id")).join(best, Seq("inc_id"), "left")
        .select($"inc_id", $"corp_id".isNotNull.as("is_dup"),
          $"corp_id", $"jaccard")
        .orderBy($"inc_id")
    },
    Some(s"""WITH $pairsCte2
      SELECT inc_id, corp_id IS NOT NULL AS is_dup, corp_id, jaccard
      FROM (SELECT doc_id AS inc_id FROM documents WHERE doc_id % 7 = 1) d
      LEFT JOIN (SELECT inc_id AS m_id, corp_id, jaccard FROM (
          SELECT inc_id, corp_id, jaccard, ROW_NUMBER() OVER (
            PARTITION BY inc_id ORDER BY jaccard DESC, corp_id) AS rn FROM ver)
        WHERE rn = 1) b ON d.inc_id = b.m_id
      ORDER BY inc_id"""))

  /** Corpus mixture balancing ([[graft.operators.Mixture]]): hit a
    * global token budget at declared per-source proportions — the "data
    * mixture" step of training-set assembly. Weights are derived from
    * the live source domain (no hardcoded strata — the q71 advisory),
    * integer-valued so every FP quantity in the keep-decision chain is
    * exact and the md5-Bernoulli fractional copy replays bit-identically
    * in DuckDB. Per-doc output: how many copies of each doc the mixture
    * takes (0 = dropped, ≥2 = upsampled). */
  private val q89 = Q(
    "q89_mixture_balance",
    (s, dir) => {
      import s.implicits._
      val d = t(s, dir, "documents")
        .select($"doc_id", $"source",
          graft.operators.Tokenize.count($"text").as("n_tok"))
      // Driver-side distinct over the tiny source domain (the mixture
      // config is per-source by definition; |sources| ~ dozens).
      val weights = d.select($"source").distinct().collect()
        .map(_.getString(0))
        .map(src => src -> (("""\d+""".r.findFirstIn(src).map(_.toInt).getOrElse(0) % 4) + 1).toDouble)
        .toMap
      graft.operators.Mixture
        .balance(d, "doc_id", "source", "n_tok", weights,
          budget = 100000L, seed = "mix")
        .select($"doc_id", $"source", $"n_tok", $"n_copies")
        .orderBy($"doc_id")
    },
    Some("""WITH d AS (SELECT doc_id, source,
        CAST(len(string_split(lower(text),' ')) AS BIGINT) AS n_tok FROM documents),
      w AS (SELECT source,
          CAST((COALESCE(TRY_CAST(regexp_extract(source, '[0-9]+') AS INT), 0) % 4) + 1 AS DOUBLE) AS wt,
          SUM(n_tok) AS avail_tok
        FROM d GROUP BY source),
      tw AS (SELECT SUM(wt) AS total_w FROM w),
      r AS (SELECT source, wt, avail_tok,
          ((100000.0 * wt) / (SELECT total_w FROM tw)) / CAST(avail_tok AS DOUBLE) AS rate
        FROM w)
      SELECT doc_id, source, n_tok,
        CAST(FLOOR(rate) + CASE WHEN
            CAST(('0x' || substr(md5('mix:' || doc_id), 1, 15))::BIGINT AS DOUBLE)
              / 1152921504606846976.0 < rate - FLOOR(rate)
          THEN 1 ELSE 0 END AS BIGINT) AS n_copies
      FROM d JOIN r USING (source) ORDER BY doc_id"""))

  /** Sliding-window chunking ([[graft.operators.Chunking]]): 64-token
    * chunks, 16-token overlap — the context-window prep step. Pure
    * integer layout arithmetic + md5 chunk fingerprints, so the oracle
    * replays every chunk boundary and hash exactly. No shuffle: one
    * projection + generator per row. */
  private val q91 = Q(
    "q91_chunk_overlap",
    (s, dir) => {
      import s.implicits._
      graft.operators.Chunking.chunk(
          t(s, dir, "documents"), "doc_id", "text",
          chunkTokens = 64, overlap = 16)
        .orderBy($"doc_id", $"chunk_idx")
    },
    Some("""WITH w AS (SELECT doc_id, string_split(lower(text),' ') AS words FROM documents),
      c AS (SELECT doc_id, words,
          GREATEST(1, (CAST(len(words) AS BIGINT) - 16 + 47) // 48) AS n_chunks FROM w),
      x AS (SELECT doc_id, words, unnest(range(n_chunks)) AS chunk_idx FROM c)
      SELECT doc_id, chunk_idx, chunk_idx * 48 AS start_tok,
        CAST(len(words[CAST(chunk_idx*48+1 AS INT):CAST(chunk_idx*48+64 AS INT)]) AS BIGINT) AS chunk_tok,
        md5(array_to_string(words[CAST(chunk_idx*48+1 AS INT):CAST(chunk_idx*48+64 AS INT)], ' ')) AS chunk_fp
      FROM x ORDER BY doc_id, chunk_idx"""))

  /** Per-source hard token cap ([[graft.operators.Caps]]): each source
    * keeps its docs in doc_id priority order until 5000 tokens, drops
    * the rest — the "domain cap" curation stage. Exact integer window
    * arithmetic; one shuffle. */
  private val q92 = Q(
    "q92_source_token_cap",
    (s, dir) => {
      import s.implicits._
      val d = t(s, dir, "documents")
        .select($"doc_id", $"source",
          graft.operators.Tokenize.count($"text").as("n_tok"))
      graft.operators.Caps.capPerGroup(d, Seq("source"), Seq($"doc_id"),
          "n_tok", cap = 5000L)
        .select($"doc_id", $"source", $"n_tok", $"cum_tok", $"is_kept")
        .orderBy($"doc_id")
    },
    Some("""WITH d AS (SELECT doc_id, source,
        CAST(len(string_split(lower(text),' ')) AS BIGINT) AS n_tok FROM documents)
      SELECT doc_id, source, n_tok,
        CAST(SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tok,
        CAST(SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) <= 5000 AS is_kept
      FROM d ORDER BY doc_id"""))

  /** Unigram-LM surprisal scoring: each doc's average negative
    * log-likelihood under the corpus's own unigram distribution — the
    * perplexity-proxy quality signal (KenLM-style filtering, CCNet /
    * Wenzek et al. 2020, with the n-gram LM reduced to its unigram
    * backbone so the score is pure relational algebra). High avg_nll =
    * rare-token soup (OCR noise, gibberish); low = repetitive boilerplate.
    *
    * Scale shape: two hash aggregations (doc×term, then term) — the
    * (term → count) model relation is built once and joined back on the
    * already-aggregated term key; the global token total rides a one-row
    * broadcast. No windows over raw tokens.
    *
    * FP caveat (q76 class): ln() and double-SUM accumulation order may
    * differ between engines by ulps; both sides round the final score to
    * 6 decimals — a flip needs a boundary-straddling sum. Validated
    * empirically at both SFs. */
  private val q93 = Q(
    "q93_unigram_surprisal",
    (s, dir) => {
      import s.implicits._
      val toks = t(s, dir, "documents")
        .select($"doc_id", explode(graft.operators.Tokenize.tokens($"text")).as("term"))
        .filter(length($"term") > 0)
      val dt = toks.groupBy($"doc_id", $"term").agg(count(lit(1)).as("c_dt"))
      val ct = dt.groupBy($"term").agg(sum($"c_dt").cast("long").as("c_t"))
      val tot = ct.agg(sum($"c_t").cast("long").as("t_tok"))
      dt.join(ct, "term").crossJoin(broadcast(tot))
        .groupBy($"doc_id")
        .agg(sum($"c_dt").cast("long").as("n_tok"),
          count(lit(1)).as("n_terms"),
          sum($"c_dt" * (log($"t_tok".cast("double")) - log($"c_t".cast("double"))))
            .as("__nll"))
        .select($"doc_id", $"n_tok", $"n_terms",
          round($"__nll" / $"n_tok".cast("double"), 6).as("avg_nll"))
        .orderBy($"doc_id")
    },
    Some("""WITH toks AS (SELECT doc_id, unnest(string_split(lower(text),' ')) AS term FROM documents),
      dt AS (SELECT doc_id, term, COUNT(*) AS c_dt FROM toks
        WHERE length(term) > 0 GROUP BY doc_id, term),
      ct AS (SELECT term, CAST(SUM(c_dt) AS BIGINT) AS c_t FROM dt GROUP BY term),
      tot AS (SELECT CAST(SUM(c_t) AS BIGINT) AS t_tok FROM ct)
      SELECT doc_id, CAST(SUM(c_dt) AS BIGINT) AS n_tok, COUNT(*) AS n_terms,
        round(SUM(c_dt * (ln(CAST(t_tok AS DOUBLE)) - ln(CAST(c_t AS DOUBLE))))
          / CAST(SUM(c_dt) AS DOUBLE), 6) AS avg_nll
      FROM dt JOIN ct USING (term) CROSS JOIN tot
      GROUP BY doc_id ORDER BY doc_id"""))

  /** C5 shared tokenizer, regex (BPE-style pre-split) model
    * ([[graft.operators.Tokenize.Regex]]): per-doc token count, distinct
    * count, and an order-free xor checksum over the 60-bit md5 token ids
    * (q82's hash construction) — the id stream itself, verified without
    * shuffling a single token string. The xor fold is a per-row codegen'd
    * HOF, not an aggregate: the only shuffle is the final orderBy. */
  private val q96 = Q(
    "q96_regex_tokenize",
    (s, dir) => {
      import s.implicits._
      import graft.operators.Tokenize
      val m = Tokenize.Regex()
      // token array staged once: the three consumers would otherwise
      // each run the regex extraction per row (no CSE across the
      // codegen/interpreted-HOF boundary)
      t(s, dir, "documents")
        .select($"doc_id", Tokenize.tokens($"text", m).as("__tk"))
        .select(
          $"doc_id",
          size($"__tk").cast("long").as("n_tok"),
          size(array_distinct($"__tk")).cast("long").as("n_unique"),
          aggregate(
            transform($"__tk",
              tok => graft.operators.Contamination.gramHash(tok)),
            lit(0L), (acc, x) => acc.bitwiseXOR(x)).as("tok_xor"))
        .orderBy($"doc_id")
    },
    Some("""WITH tk AS (SELECT doc_id,
        unnest(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS tok
        FROM documents),
      h AS (SELECT doc_id, tok, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS hid FROM tk),
      agg AS (SELECT doc_id, COUNT(*) AS n_tok,
        CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_unique,
        bit_xor(hid) AS tok_xor FROM h GROUP BY doc_id)
      SELECT d.doc_id, COALESCE(n_tok, 0) AS n_tok,
        COALESCE(n_unique, 0) AS n_unique, COALESCE(tok_xor, 0) AS tok_xor
      FROM documents d LEFT JOIN agg USING (doc_id) ORDER BY d.doc_id"""))

  /** C5 vocabulary token ids ([[graft.operators.Tokenize.idsWithVocab]]):
    * rank the corpus's 256 most frequent whitespace tokens into a
    * (token, id) vocabulary — count desc, token asc, exactly replayable —
    * then map every doc through it; OOV tokens get the negated 60-bit
    * hash id. Output: per-doc token count, OOV count, and the xor
    * checksum of the full id sequence.
    *
    * Scale shape: vocab build is one token-count aggregate (the ranking
    * window runs over vocab-sized data, not the corpus); the doc→id
    * mapping is [[graft.operators.Tokenize.idsWithVocab]]'s broadcast
    * join. The checksum xor is a per-row fold over the id array. */
  private val q97 = Q(
    "q97_vocab_token_ids",
    (s, dir) => {
      import s.implicits._
      import graft.operators.Tokenize
      val docs = t(s, dir, "documents")
      val counts = docs
        .select(explode(Tokenize.tokens($"text")).as("token"))
        .groupBy($"token").agg(count(lit(1)).as("c"))
      // orderBy+limit plans as TakeOrderedAndProject — a DISTRIBUTED
      // top-k over the token-count relation (per-partition heaps, driver
      // merge of 256-row tops); ids are then assigned on the driver from
      // the already-sorted 256 survivors (no partition-less rank window,
      // whose WARN would be indistinguishable from a real scale bug).
      val vocab = counts
        .orderBy($"c".desc, $"token").limit(256)
        .select($"token").as[String].collect()
        .zipWithIndex.toSeq
        .toDF("token", "__i")
        .select($"token", $"__i".cast("long").as("id"))
      Tokenize.idsWithVocab(docs.select($"doc_id", $"text"), "doc_id", "text",
          vocab, "tids")
        .select($"doc_id",
          size($"tids").cast("long").as("n_tok"),
          size(filter($"tids", t => t < 0L)).cast("long").as("n_oov"),
          aggregate($"tids", lit(0L), (acc, x) => acc.bitwiseXOR(x)).as("tok_xor"))
        .orderBy($"doc_id")
    },
    Some("""WITH tk AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
        FROM documents),
      vocab AS (SELECT tok AS token,
        CAST(ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, tok) - 1 AS BIGINT) AS id
        FROM tk GROUP BY tok QUALIFY id < 256),
      ids AS (SELECT doc_id,
        COALESCE(v.id, -(('0x' || substr(md5(tok), 1, 15))::BIGINT)) AS tid
        FROM tk LEFT JOIN vocab v ON v.token = tk.tok)
      SELECT doc_id, COUNT(*) AS n_tok,
        CAST(COUNT(*) FILTER (WHERE tid < 0) AS BIGINT) AS n_oov,
        bit_xor(tid) AS tok_xor
      FROM ids GROUP BY doc_id ORDER BY doc_id"""))

  /** C-tier: contrastive TRIPLET generation — the training-pair prep
    * for embedding/retrieval models: anchor = any doc with a verified
    * near-dup (q47's md5 LSH pairs), positive = its lowest-id
    * near-dup partner, negative = a deterministic pseudo-random doc
    * via hash-bucket lookup (bucket-min table: 64 rows, broadcast —
    * no corpus-wide sampling shuffle, negatives are a pure function
    * of the anchor id so the dataset is stable across reruns).
    * Triplets whose negative collides with the anchor or positive are
    * dropped (deterministic on both engines). Everything — LSH pairs,
    * bucket assignment, the lookup — is md5 arithmetic the oracle
    * replays. */
  private val q131 = Q(
    "q131_contrastive_triplets",
    (s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val pairs = NearDup.nearDupPairs(docs, "doc_id", "text",
          n = 3, k = 8, bands = 4, r = 2, tau = 0.5, mode = NearDup.Md5Hash)
        .select($"a_id", $"b_id")
      val anchors = pairs.select($"a_id".as("anchor_id"), $"b_id".as("partner"))
        .union(pairs.select($"b_id".as("anchor_id"), $"a_id".as("partner")))
        .groupBy($"anchor_id").agg(min($"partner").as("positive_id"))
      val h = graft.operators.Contamination.gramHash(_: org.apache.spark.sql.Column)
      val bucketMin = broadcast(
        docs.select(pmod(h($"doc_id".cast("string")), lit(64)).as("bucket"),
            $"doc_id")
          .groupBy($"bucket").agg(min($"doc_id").as("negative_id")))
      anchors
        .withColumn("bucket",
          pmod(h(concat(lit("neg:"), $"anchor_id".cast("string"))), lit(64)))
        .join(bucketMin, "bucket")
        .filter($"negative_id" =!= $"anchor_id" &&
          $"negative_id" =!= $"positive_id")
        .select($"anchor_id", $"positive_id", $"negative_id")
        .orderBy($"anchor_id")
    },
    Some(s"""WITH $pairsCte,
      anchors AS (SELECT anchor_id, MIN(partner) AS positive_id FROM (
          SELECT a_id AS anchor_id, b_id AS partner FROM pairs
          UNION ALL SELECT b_id, a_id FROM pairs)
        GROUP BY anchor_id),
      bmin AS (SELECT
          ('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,15))::BIGINT % 64 AS bucket,
          MIN(doc_id) AS negative_id
        FROM documents GROUP BY 1)
      SELECT anchor_id, positive_id, negative_id
      FROM anchors
      JOIN bmin ON bmin.bucket =
        ('0x'||substr(md5('neg:' || CAST(anchor_id AS VARCHAR)),1,15))::BIGINT % 64
      WHERE negative_id <> anchor_id AND negative_id <> positive_id
      ORDER BY anchor_id"""))

  /** C-tier LEAKAGE-FREE split: the q151/q152 split discipline at
    * CLUSTER granularity — near-duplicate documents must land in the
    * SAME split, or eval examples leak into training as paraphrases
    * (the documented failure mode doc-level splits have on deduped-ish
    * web corpora). Composition of three engine operators: LSH near-dup
    * pairs ([[NearDup.nearDupPairs]]) → connected components
    * ([[Components.clusterDedup]]) → [[graft.operators.Sampling
    * .hashSplit]] keyed by cluster_id, so membership is a pure
    * function of (seed, cluster) and whole clusters move together by
    * construction. The oracle replays q81's recursive-CTE clusters and
    * the same md5 thresholds. */
  private val q153 = Q(
    "q153_cluster_split", {
      (s, dir) =>
        import s.implicits._
        val docs = t(s, dir, "documents")
        val pairs = NearDup.nearDupPairs(docs, "doc_id", "text",
          n = 3, k = 8, bands = 4, r = 2, tau = 0.5, mode = NearDup.Md5Hash)
        val clustered = Components.clusterDedup(docs.select($"doc_id"), "doc_id",
          pairs, "a_id", "b_id")
        graft.operators.Sampling.hashSplit(clustered, Seq("cluster_id"),
            Seq(0.8, 0.1, 0.1), Seq("train", "val", "test"), seed = "s9")
          .groupBy($"split")
          .agg(count(lit(1)).as("n_docs"),
            countDistinct($"cluster_id").as("n_clusters"),
            sum($"doc_id").as("key_sum"))
          .orderBy($"split")
    },
    Some {
      val cuts = graft.operators.Sampling.splitThresholds(Seq(0.8, 0.1, 0.1))
      s"""WITH RECURSIVE $pairsCte,
      edges AS (SELECT a_id AS u, b_id AS v FROM pairs
        UNION SELECT b_id, a_id FROM pairs),
      reach(id, r) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT re.id, e.v FROM reach re JOIN edges e ON re.r = e.u),
      lab AS (SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id),
      sp AS (SELECT doc_id, cluster_id,
        CASE WHEN ('0x' || substr(md5('s9:' || CAST(cluster_id AS VARCHAR)), 1, 15))::BIGINT < ${cuts(0)} THEN 'train'
             WHEN ('0x' || substr(md5('s9:' || CAST(cluster_id AS VARCHAR)), 1, 15))::BIGINT < ${cuts(1)} THEN 'val'
             ELSE 'test' END AS split
        FROM lab)
      SELECT split, COUNT(*) AS n_docs,
        COUNT(DISTINCT cluster_id) AS n_clusters,
        CAST(SUM(doc_id) AS BIGINT) AS key_sum
      FROM sp GROUP BY split ORDER BY split"""
    })

  def qs: Seq[Q] =
    Seq(q81, q82, q83, q84, q85, q86, q87, q89, q91, q92, q93, q96, q97,
      q131, q153)
}
