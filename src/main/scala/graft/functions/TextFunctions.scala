package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks (SURVEY §2.C C5): tokenization, shingling,
  * language-ID heuristics, quality metrics, fingerprints. All pure column
  * expressions (codegen'd, no UDFs) so they stay inside whole-stage codegen
  * and scale to 100 TB document tables.
  */
object TextFunctions {

  /** Tiny in-engine stopword lists for the language-ID heuristic. */
  val EN_STOP: Seq[String] = Seq("the", "and", "of", "to", "a", "in", "is", "it", "for", "on")
  val ES_STOP: Seq[String] = Seq("el", "la", "de", "que", "y", "en", "un", "los", "se", "no")

  /** Whitespace tokens, lower-cased. */
  def words(text: Column): Column = split(lower(text), " ")

  /** Distinct word n-grams ("shingles"). Short docs (< n words) yield one
    * partial shingle — the whole doc. Fused native expression
    * ([[WordNGrams]]); [[wordNGramsHof]] is the column-formulation spec. */
  def wordNGrams(ws: Column, n: Int): Column =
    call_function(s"word_ngrams_$n", ws)

  /** Reference HOF formulation of [[wordNGrams]] (interpreted; kept as
    * the executable spec the native expression is tested against). */
  def wordNGramsHof(ws: Column, n: Int): Column =
    array_distinct(
      transform(
        sequence(lit(0), greatest(size(ws) - n, lit(0))),
        i => concat_ws(" ", slice(ws, i + lit(1), lit(n)))))

  /** Register `word_ngrams_<n>` (done by Sessions.local for n=3). */
  def registerNGrams(spark: org.apache.spark.sql.SparkSession, n: Int): Unit =
    FnRegistry.once(spark, s"word_ngrams_$n")(exprs => WordNGrams(exprs.head, n))

  /** How many tokens appear in `stops`. */
  def stopwordHits(ws: Column, stops: Seq[String]): Column =
    size(filter(ws, w => array_contains(typedlit(stops), w))).cast("long")

  /** BPE-ish regex token count: letter runs, digit runs, single symbols. */
  def regexTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).cast("long")

  /** Whole-document md5 fingerprint. */
  def fingerprintMd5(text: Column): Column = md5(text)

  /** Canonical ("key collapsing") fingerprint: md5 over the sorted distinct
    * word set — equal for word-order permutations and duplications. */
  def canonicalFingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(words(text)))))

  /** Polynomial rolling hash (base 31, mod 1e9+7) over characters — kept
    * under the modulus so it is exactly reproducible in any engine with
    * 64-bit integers (no overflow wraparound semantics needed). */
  def rollingHash(text: Column): Column =
    aggregate(
      transform(split(text, ""), ch => ascii(ch).cast("long")),
      lit(0L),
      (acc, x) => (acc * 31 + x) % 1000000007L)

  /** Jaccard similarity of two string arrays (fused native expression;
    * [[jaccardHof]] is the column-formulation spec). */
  def jaccard(a: Column, b: Column): Column =
    call_function("jaccard_sim", a, b)

  /** Allocation-free Jaccard for SORTED-distinct arrays (`array_sort`
    * upstream, once per row): merge count instead of per-pair HashSets —
    * same value, built for the O(pairs) verify stage. */
  def jaccardSorted(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      JaccardSim(
        org.apache.spark.sql.graft.Bridge.expression(a),
        org.apache.spark.sql.graft.Bridge.expression(b),
        sortedInputs = true))

  /** Reference formulation of [[jaccard]]. One caveat vs the native form:
    * returns 0/0 = null for two empty arrays (native yields NaN); shingle
    * arrays are never empty. */
  def jaccardHof(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b)).cast("double")

  // --- PII redaction (C5; the pre-training scrub pass) -----------------
  // Patterns restricted to syntax with identical semantics in Java regex
  // (Spark codegen) and RE2 (DuckDB oracle): no backreferences, no
  // lookaround, \b and \d behave the same in both.

  /** (pattern, replacement) battery, applied in order. Email before the
    * digit-run rule so an address's digits are consumed as <EMAIL>. */
  val PII_PATTERNS: Seq[(String, String)] = Seq(
    "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}" -> "<EMAIL>",
    "\\d{3}-\\d{3}-\\d{4}" -> "<PHONE>",
    "\\b\\d{1,3}(\\.\\d{1,3}){3}\\b" -> "<IP>",
    "\\d{9,}" -> "<NUM>")

  /** Count of matches for one battery pattern (pre-redaction). */
  def piiCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0))).cast("long")

  /** Text with every battery pattern replaced, in declaration order. */
  def redactPii(text: Column): Column =
    PII_PATTERNS.foldLeft(text) { case (c, (p, r)) => regexp_replace(c, lit(p), lit(r)) }

  /** Markup/boilerplate strip (the WET-extraction stage of a web-corpus
    * pipeline): tags → space, entities → space, whitespace runs
    * collapsed, ends trimmed. Patterns live in the Java-regex ∩ RE2
    * dialect (the q83 discipline) so DuckDB replays them with the 'g'
    * flag. */
  def stripMarkup(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(
        regexp_replace(text, lit("<[^>]*>"), lit(" ")),
        lit("&#?[a-zA-Z0-9]{1,8};"), lit(" ")),
      lit("\\s+"), lit(" ")))
}
