package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{SimHash64, TextFunctions => TF}
import graft.operators.NearDup
import graft.sources.Tables

/** SURVEY §2.C text-analysis + dedup queries over the documents table. */
object TextQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  /** C5 per-document stats: token counts, type-token ratio, char metrics. */
  private val q41 = Q(
    "q41_text_stats",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .withColumn("words", TF.words($"text"))
        .select(
          $"doc_id", $"lang", $"n_chars",
          size($"words").cast("long").as("n_words"),
          size(array_distinct($"words")).cast("long").as("n_unique"),
          (size(array_distinct($"words")).cast("double") /
            size($"words").cast("double")).as("ttr"),
          (length($"text").cast("double") / size($"words").cast("double"))
            .as("chars_per_word"),
          size(regexp_extract_all($"text", lit("[^a-z0-9 ]"), lit(0)))
            .cast("long").as("n_nonalnum"))
        .orderBy($"doc_id")
    },
    Some("""SELECT doc_id, lang, n_chars,
      CAST(len(string_split(lower(text),' ')) AS BIGINT) AS n_words,
      CAST(len(list_distinct(string_split(lower(text),' '))) AS BIGINT) AS n_unique,
      CAST(len(list_distinct(string_split(lower(text),' '))) AS DOUBLE)
        / CAST(len(string_split(lower(text),' ')) AS DOUBLE) AS ttr,
      CAST(length(text) AS DOUBLE) / CAST(len(string_split(lower(text),' ')) AS DOUBLE) AS chars_per_word,
      CAST(len(regexp_extract_all(text, '[^a-z0-9 ]')) AS BIGINT) AS n_nonalnum
      FROM documents ORDER BY doc_id"""))

  /** C5 language-ID heuristic: stopword-list hits per language. */
  private val q42 = Q(
    "q42_lang_id",
    (s, dir) => {
      import s.implicits._
      val en = TF.EN_STOP.map(w => s"'$w'").mkString(",")
      t(s, dir, "documents")
        .withColumn("words", TF.words($"text"))
        .select(
          $"doc_id", $"lang",
          TF.stopwordHits($"words", TF.EN_STOP).as("en_hits"),
          TF.stopwordHits($"words", TF.ES_STOP).as("es_hits"))
        .withColumn("predicted",
          when($"en_hits" >= $"es_hits", lit("en")).otherwise(lit("es")))
        .orderBy($"doc_id")
    },
    Some(s"""SELECT doc_id, lang,
      CAST(len(list_filter(string_split(lower(text),' '), w -> w IN (${TF.EN_STOP.map(w => s"'$w'").mkString(",")}))) AS BIGINT) AS en_hits,
      CAST(len(list_filter(string_split(lower(text),' '), w -> w IN (${TF.ES_STOP.map(w => s"'$w'").mkString(",")}))) AS BIGINT) AS es_hits,
      CASE WHEN len(list_filter(string_split(lower(text),' '), w -> w IN (${TF.EN_STOP.map(w => s"'$w'").mkString(",")})))
        >= len(list_filter(string_split(lower(text),' '), w -> w IN (${TF.ES_STOP.map(w => s"'$w'").mkString(",")})))
        THEN 'en' ELSE 'es' END AS predicted
      FROM documents ORDER BY doc_id"""))

  /** C5 token counting: whitespace vs BPE-ish regex tokenizer. */
  private val q43 = Q(
    "q43_token_count",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .select(
          $"doc_id",
          size(split($"text", " ")).cast("long").as("ws_tokens"),
          TF.regexTokenCount($"text").as("re_tokens"),
          (length($"text").cast("double") /
            TF.regexTokenCount($"text").cast("double")).as("chars_per_token"))
        .orderBy($"doc_id")
    },
    Some("""SELECT doc_id,
      CAST(len(string_split(text,' ')) AS BIGINT) AS ws_tokens,
      CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT) AS re_tokens,
      CAST(length(text) AS DOUBLE) / CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT) AS chars_per_token
      FROM documents ORDER BY doc_id"""))

  /** C5 fingerprints: md5, canonical sorted-word md5, rolling hash. */
  private val q44 = Q(
    "q44_fingerprint",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .select(
          $"doc_id",
          TF.fingerprintMd5($"text").as("md5_fp"),
          TF.canonicalFingerprint($"text").as("canon_fp"),
          TF.rollingHash($"text").as("roll_fp"))
        .orderBy($"doc_id")
    },
    Some("""SELECT doc_id, md5(text) AS md5_fp,
      md5(array_to_string(list_sort(list_distinct(string_split(lower(text),' '))), ' ')) AS canon_fp,
      list_reduce(list_prepend(0, list_transform(string_split(text,''), c -> CAST(ascii(c) AS BIGINT))), (a,b) -> (a*31+b) % 1000000007) AS roll_fp
      FROM documents ORDER BY doc_id"""))

  /** C1 exact dedup of documents by canonical fingerprint: one canonical
    * doc (min id) per group, with group size. */
  private val q45 = Q(
    "q45_dedup_docs_exact",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .withColumn("canon_fp", TF.canonicalFingerprint($"text"))
        .groupBy($"canon_fp")
        .agg(min($"doc_id").as("canonical_id"), count(lit(1)).as("n_docs"))
        .orderBy($"canon_fp")
    },
    Some("""SELECT md5(array_to_string(list_sort(list_distinct(string_split(lower(text),' '))), ' ')) AS canon_fp,
      MIN(doc_id) AS canonical_id, COUNT(*) AS n_docs
      FROM documents GROUP BY 1 ORDER BY canon_fp"""))

  /** C2 exact n-gram Jaccard near-dup pairs on a bounded id range (the
    * exact-verification baseline the LSH variant approximates). */
  private val q46 = Q(
    "q46_ngram_jaccard",
    (s, dir) => {
      import s.implicits._
      // grams sorted once per ROW so the O(n²) verify pays a merge
      // count, not two per-pair HashSet builds (same jaccard value)
      val grams = t(s, dir, "documents")
        .filter($"doc_id" < 300)
        .select($"doc_id",
          array_sort(TF.wordNGrams(TF.words($"text"), 3)).as("grams"))
      grams.as("a").join(grams.as("b"), $"a.doc_id" < $"b.doc_id")
        .select(
          $"a.doc_id".as("a_id"), $"b.doc_id".as("b_id"),
          TF.jaccardSorted($"a.grams", $"b.grams").as("jaccard"))
        .filter($"jaccard" >= 0.5)
        .orderBy($"a_id", $"b_id")
    },
    Some("""WITH w AS (SELECT doc_id, string_split(lower(text),' ') AS words FROM documents WHERE doc_id < 300),
      g AS (SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(words)-1, 2)), i -> array_to_string(words[i:i+2],' '))) AS grams FROM w)
      SELECT * FROM (
        SELECT a.doc_id AS a_id, b.doc_id AS b_id,
          CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) / CAST(len(list_distinct(list_concat(a.grams, b.grams))) AS DOUBLE) AS jaccard
        FROM g a JOIN g b ON a.doc_id < b.doc_id)
      WHERE jaccard >= 0.5 ORDER BY a_id, b_id"""))

  /** C2 MinHash+LSH near-dup over ALL documents (md5 hash family so the
    * DuckDB oracle reproduces signatures bit-for-bit; production path uses
    * xxhash64 — see bench query + NearDupSpec). k=8, bands=4, r=2. */
  private val q47 = Q(
    "q47_minhash_lsh",
    (s, dir) => {
      import s.implicits._
      NearDup.nearDupPairs(t(s, dir, "documents"), "doc_id", "text",
          n = 3, k = 8, bands = 4, r = 2, tau = 0.5, mode = NearDup.Md5Hash)
        .orderBy($"a_id", $"b_id")
    },
    Some("""WITH w AS (SELECT doc_id, string_split(lower(text),' ') AS words FROM documents),
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
        md5('3|' || sig[7] || '|' || sig[8])]) AS bk FROM sig),
      cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
        FROM bk a JOIN bk b ON a.bk = b.bk AND a.doc_id < b.doc_id)
      SELECT * FROM (
        SELECT a_id, b_id,
          CAST(len(list_intersect(ga.grams, gb.grams)) AS DOUBLE) / CAST(len(list_distinct(list_concat(ga.grams, gb.grams))) AS DOUBLE) AS jaccard
        FROM cand JOIN g ga ON ga.doc_id = a_id JOIN g gb ON gb.doc_id = b_id)
      WHERE jaccard >= 0.5 ORDER BY a_id, b_id"""))

  /** C2 SimHash near-dup: native codegen'd simhash expression, 15-bit
    * chunk banding (pigeonhole: hamming ≤ 3 over 4 chunks guarantees a
    * shared chunk), Hamming-distance verify. Runs the md5-mode 60-bit
    * simhash ([[graft.functions.SimHashMd5]]) so the ENTIRE pipeline —
    * token hash, bit votes, banding, xor/bit_count Hamming — is replicated
    * in the DuckDB oracle; the xxh64 production mode (simhash64) is parity
    * /recall-tested in CTierSpec. */
  private val q48 = Q(
    "q48_simhash_neardup",
    (s, dir) => {
      import s.implicits._
      graft.functions.SimHashMd5.register(s)
      val docs = t(s, dir, "documents")
        .withColumn("sh", expr("simhash_md5(split(lower(text), ' '))"))
      val chunks = docs.select($"doc_id", $"sh",
          explode(array((0 until 4).map(j =>
            struct(lit(j).as("chunk_idx"),
              shiftright($"sh", j * 15).bitwiseAND(lit(0x7fffL)).as("chunk"))): _*)).as("c"))
        .select($"doc_id", $"sh", $"c.chunk_idx", $"c.chunk")
      chunks.as("a").join(chunks.as("b"),
          $"a.chunk_idx" === $"b.chunk_idx" && $"a.chunk" === $"b.chunk" &&
            $"a.doc_id" < $"b.doc_id")
        .select($"a.doc_id".as("a_id"), $"b.doc_id".as("b_id"),
          bit_count($"a.sh".bitwiseXOR($"b.sh")).cast("long").as("hamming"))
        .distinct()
        .filter($"hamming" <= 3)
        .orderBy($"a_id", $"b_id")
    },
    Some("""WITH th AS (
        SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h
        FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
              FROM documents)),
      bits AS (
        SELECT doc_id, b,
          SUM(CASE WHEN (h >> CAST(b AS INT)) & 1 = 1 THEN 1 ELSE -1 END) AS acc
        FROM th, (SELECT unnest(range(60)) AS b) GROUP BY doc_id, b),
      sh AS (
        SELECT doc_id,
          CAST(SUM(CASE WHEN acc > 0 THEN (1::BIGINT << CAST(b AS INT)) ELSE 0 END) AS BIGINT) AS sh
        FROM bits GROUP BY doc_id),
      chunks AS (
        SELECT doc_id, sh, j, (sh >> CAST(15 * j AS INT)) & 32767 AS chunk
        FROM sh, (SELECT unnest(range(4)) AS j)),
      pairs AS (
        SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
          CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming
        FROM chunks a JOIN chunks b
          ON a.j = b.j AND a.chunk = b.chunk AND a.doc_id < b.doc_id)
      SELECT a_id, b_id, hamming FROM pairs
      WHERE hamming <= 3 ORDER BY a_id, b_id"""))

  /** C5 composite quality score: length band + stopword ratio + punct
    * ratio folded into one deterministic [0,1] score (the LLM-pipeline
    * "keep or drop this document" signal). */
  private val q58 = Q(
    "q58_quality_score",
    (s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
        .withColumn("words", TF.words($"text"))
        .withColumn("n_words", size($"words").cast("double"))
        .withColumn("sw_ratio",
          TF.stopwordHits($"words", TF.EN_STOP).cast("double") / $"n_words")
        .withColumn("punct_ratio",
          size(regexp_extract_all($"text", lit("[^a-z0-9 ]"), lit(0))).cast("double")
            / length($"text").cast("double"))
      docs.select(
          $"doc_id", $"lang",
          $"sw_ratio", $"punct_ratio",
          (when($"n_words".between(20.0, 2000.0), 0.4).otherwise(0.0) +
            least($"sw_ratio" * 4.0, lit(0.4)) +
            when($"punct_ratio" <= 0.1, 0.2).otherwise(0.0)).as("quality"))
        .orderBy($"doc_id")
    },
    Some("""SELECT doc_id, lang,
      CAST(len(list_filter(string_split(lower(text),' '), w -> w IN ('the','and','of','to','a','in','is','it','for','on'))) AS DOUBLE)
        / CAST(len(string_split(lower(text),' ')) AS DOUBLE) AS sw_ratio,
      CAST(len(regexp_extract_all(text, '[^a-z0-9 ]')) AS DOUBLE) / CAST(length(text) AS DOUBLE) AS punct_ratio,
      (CASE WHEN len(string_split(lower(text),' ')) BETWEEN 20 AND 2000 THEN 0.4 ELSE 0.0 END
        + least(CAST(len(list_filter(string_split(lower(text),' '), w -> w IN ('the','and','of','to','a','in','is','it','for','on'))) AS DOUBLE)
            / CAST(len(string_split(lower(text),' ')) AS DOUBLE) * 4.0, 0.4)
        + CASE WHEN CAST(len(regexp_extract_all(text, '[^a-z0-9 ]')) AS DOUBLE) / CAST(length(text) AS DOUBLE) <= 0.1 THEN 0.2 ELSE 0.0 END) AS quality
      FROM documents ORDER BY doc_id"""))

  def qs: Seq[Q] = Seq(q41, q42, q43, q44, q45, q46, q47, q48, q58)
}
