package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The engine's single token model (SURVEY §2.C C5): every operator that
  * budgets or counts tokens — [[Caps]], [[Mixture]], [[Packing]],
  * [[Chunking]], the corpus queries' `n_tok` columns — tokenizes through
  * here, so "N tokens" means the same thing everywhere (the reference
  * normalizes its fields through one mapping the same way,
  * `/root/reference/index.js:123-133`; a training pipeline's token
  * budgets are meaningless unless the tokenizer is shared).
  *
  * A [[Model]] is a pure column expression (codegen'd, no UDF): the
  * whitespace default is the replayable baseline, [[Regex]] is the
  * BPE-style pre-tokenizer (letter runs / digit runs / single symbols —
  * the GPT-2-family pre-split shape). A real BPE merge table would slot
  * in as one more Model whose `tokens` maps pre-tokens through a merge
  * expression; everything downstream (counts, budgets, ids) is already
  * agnostic to it.
  *
  * Token IDS come in two forms, both shuffle-friendly fixed-width longs:
  * [[hashIds]] is vocab-free (the 60-bit md5 of [[Contamination.gramHash]],
  * replayable in any engine); [[idsWithVocab]] looks up a (token, id)
  * vocabulary via broadcast join — OOV tokens get the NEGATED hash id, so
  * they stay distinguishable from in-vocab ids (all ≥ 0) without a
  * sentinel collision.
  */
object Tokenize {

  /** A tokenizer: text column → array<string> of tokens. */
  sealed trait Model {
    def tokens(text: Column): Column

    /** The same tokens with ORIGINAL character forms preserved, aligned
      * 1:1 with `tokens` (position i of both is the same token, one
      * normalized, one raw). Callers that rewrite text (e.g.
      * [[BlockDedup.dropDuplicateBlocks]]) hash the normalized form for
      * identity but reconstruct from these, so dedup does not silently
      * case-fold the corpus. Defaults to the normalized tokens for
      * models with no raw/normalized distinction. */
    def rawTokens(text: Column): Column = tokens(text)
  }

  /** Lower-cased whitespace split — the corpus default (the one
    * definition; [[graft.functions.TextFunctions.words]] is it). */
  case object Whitespace extends Model {
    def tokens(text: Column): Column =
      graft.functions.TextFunctions.words(text)
    override def rawTokens(text: Column): Column = split(text, " ")
  }

  /** Regex pre-tokenizer: maximal letter runs, digit runs, and single
    * non-space symbols, lower-cased. The pattern is restricted to the
    * Java-regex ∩ RE2 dialect so a SQL oracle replays it verbatim. */
  final case class Regex(
      pattern: String = "[a-z]+|[0-9]+|[^a-z0-9\\s]") extends Model {
    def tokens(text: Column): Column =
      regexp_extract_all(lower(text), lit(pattern), lit(0))
    // (?i) makes letter classes (incl. negated ones) case-blind, so run
    // boundaries match the lowered extraction position for position
    override def rawTokens(text: Column): Column =
      regexp_extract_all(text, lit("(?i)" + pattern), lit(0))
  }

  /** Byte-pair-encoding model: pre-tokenize with `pre` (the GPT-2-style
    * regex pre-split), then greedily apply `merges` per pre-token —
    * canonical BPE: repeatedly find the lowest-rank adjacent symbol
    * pair and merge ALL its non-overlapping occurrences left-to-right.
    * The merge table is vocabulary-sized and ships in the UDF closure
    * (broadcast with the task), so tokenization is a per-row map with
    * no shuffle — the one Model that genuinely needs a UDF (iterative
    * data-dependent merging has no built-in column form; SURVEY B15
    * declares the UDF surface). Everything downstream (counts, budgets,
    * ids) composes unchanged, which is the point of the shared Model.
    *
    * The merge loop IS SQL-replayable despite its data-dependent
    * iteration: greedy lowest-rank-until-fixpoint equals one
    * left-to-right pass per rank in rank order whenever the table only
    * chains forward (a pair's parts are chars or lower-rank outputs —
    * always true for trained tables), because merging two symbols
    * never creates a new adjacency between pre-existing symbols. The
    * BPE queries' oracles unroll exactly that (CorpusQueries3
    * `bpeApplyCtes`); the ScalaTest spec pins exact merges besides. */
  final case class Bpe(merges: Seq[(String, String)],
      pre: Model = Regex()) extends Model {
    private val ranks: Map[(String, String), Int] =
      merges.zipWithIndex.toMap
    def tokens(text: Column): Column = {
      val r = ranks  // avoid capturing `this` in the closure
      val m = merges.toIndexedSeq
      val f = org.apache.spark.sql.functions.udf { (toks: Seq[String]) =>
        if (toks == null) null else toks.flatMap(Tokenize.bpeWord(_, r, m))
      }
      f(pre.tokens(text))
    }
  }

  /** Greedy BPE of one pre-token: chars → symbols, merge best-ranked
    * pair everywhere, repeat until no merge applies. */
  private[operators] def bpeWord(w: String,
      ranks: Map[(String, String), Int],
      merges: IndexedSeq[(String, String)]): Seq[String] = {
    var parts: Vector[String] = w.map(_.toString).toVector
    var continue = parts.size > 1
    while (continue) {
      val best = parts.iterator.zip(parts.iterator.drop(1))
        .flatMap(p => ranks.get(p))
        .minOption
      best match {
        case None => continue = false
        case Some(rank) =>
          val (a, b) = merges(rank)
          val buf = Vector.newBuilder[String]
          var i = 0
          while (i < parts.size) {
            if (i < parts.size - 1 && parts(i) == a && parts(i + 1) == b) {
              buf += (a + b); i += 2
            } else { buf += parts(i); i += 1 }
          }
          parts = buf.result()
          continue = parts.size > 1
      }
    }
    parts
  }

  /** TRAIN a BPE merge table from a corpus (Sennrich et al. 2016,
    * "Neural Machine Translation of Rare Words with Subword Units" —
    * the learn_bpe algorithm): start from characters, repeatedly take
    * the globally most frequent adjacent symbol pair (ties broken
    * (count desc, a, b) — deterministic) and merge its non-overlapping
    * occurrences left-to-right everywhere, `numMerges` times. The
    * result feeds [[Bpe]] directly: train here, tokenize anywhere.
    *
    * Scale shape — the classic WORD-FREQUENCY reduction: ONE corpus
    * scan builds the distinct-pretoken count table, and every
    * iteration runs over that vocabulary-of-words table (10⁵–10⁷ rows
    * regardless of corpus bytes), never the corpus again. Per merge:
    * one pair-count aggregation (explode adjacent pairs weighted by
    * word count, map-side combined) + a 1-ROW collect of the argmax —
    * the driver holds only the merge list itself (vocabulary-sized by
    * construction). The merge application is a codegen'd `aggregate`
    * fold over the symbol array (single left-to-right pass; a merged
    * token is strictly longer than its left part, so it can never
    * chain-merge inside the same pass — matching [[bpeWord]]'s scan),
    * no UDF anywhere in the loop. The word table localCheckpoints
    * every `checkpointEvery` merges so lineage stays flat across
    * hundreds of iterations.
    *
    * Sequentiality is inherent to canonical BPE (merge i+1's counts
    * depend on merge i — a newly formed token's pairs can outrank
    * every pre-existing pair), so the loop is O(numMerges) driver
    * round-trips by design; each is corpus-size-independent. Symbols
    * are what `split(w, "")` yields — BMP text assumed (supplementary
    * characters split into surrogate halves, same as [[bpeWord]]'s
    * per-char view, so trainer and applier agree). */
  def trainBpe(df: DataFrame, textCol: String, numMerges: Int,
      pre: Model = Regex(), checkpointEvery: Int = 8): Seq[(String, (String, String), Long)] = {
    require(numMerges >= 0, s"numMerges=$numMerges must be >= 0")
    require(checkpointEvery >= 1, s"checkpointEvery=$checkpointEvery must be >= 1")
    var words = df.select(explode(pre.tokens(col(textCol))).as("__w"))
      // functions.count, NOT this object's token-count of the same name
      .groupBy(col("__w"))
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("n"))
      .select(split(col("__w"), "").as("syms"), col("n"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, (String, String), Long)]
    var sinceCk = 0
    var done = false
    try while (merges.size < numMerges && !done) {
      val top = words.filter(size(col("syms")) > 1)
        .select(col("n"), explode(zip_with(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1),
          (a, b) => struct(a.as("a"), b.as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("n")).as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty) done = true // fully merged corpus — nothing left
      else {
        val a = top(0).getString(0)
        val b = top(0).getString(1)
        merges += ((a + b, (a, b), top(0).getLong(2)))
        words = words.withColumn("syms", applyMerge(col("syms"), a, b))
        sinceCk += 1
        if (sinceCk >= checkpointEvery) {
          val ck = words.localCheckpoint()
          // the fresh checkpoint supersedes the one the merge chain was
          // reading — release the old blocks, keep only the live table
          graft.util.Ckpt.release(words)
          words = ck; sinceCk = 0
        }
      }
    }
    // the merge list is driver-side: no checkpoint outlives the call
    finally graft.util.Ckpt.release(words)
    merges.toSeq
  }

  /** One left-to-right non-overlapping pass of merge (a, b) → ab over a
    * symbol array, as a codegen'd fold: if the accumulator's last
    * element is `a` and the current is `b`, replace the last with the
    * merged token; a just-merged token (strictly longer than `a`)
    * never re-matches as the left side within the pass. */
  private def applyMerge(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) => when(
        size(acc) > 0 && try_element_at(acc, lit(-1)) === lit(a) && x === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))

  def tokens(text: Column, model: Model = Whitespace): Column =
    model.tokens(text)

  /** The shared `n_tok`: LONG token count under `model`. */
  def count(text: Column, model: Model = Whitespace): Column =
    size(model.tokens(text)).cast("long")

  /** Vocab-free 60-bit token ids (one per token, order kept):
    * md5-derived like q82's gram keys, so ids are identical in every
    * engine with md5 and ride shuffles as fixed-width longs. */
  def hashIds(text: Column, model: Model = Whitespace): Column =
    transform(model.tokens(text), t => Contamination.gramHash(t))

  /** Adds `outCol` = array<long> of vocabulary ids for `textCol` under
    * `model`. `vocab` is a (token: STRING, id: LONG) relation, assumed
    * vocabulary-sized (≤ a few hundred thousand rows — it is broadcast);
    * OOV tokens map to -hashId (always < 0, never colliding with vocab
    * ids, which must be ≥ 0).
    *
    * Scale shape: explode to (doc, pos, token), ONE broadcast hash join
    * against the vocab (no shuffle of the corpus side beyond the
    * re-collect), then re-assemble in position order. The groupBy is the
    * one unavoidable shuffle — it moves (id, pos, long) triples, never
    * token strings. */
  def idsWithVocab(df: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame, outCol: String,
      model: Model = Whitespace): DataFrame = {
    val toks = df.select(col(idCol),
      posexplode(model.tokens(col(textCol))).as(Seq("__pos", "__tok")))
    val v = broadcast(vocab.select(col("token").as("__tok"), col("id").as("__vid")))
    val ids = toks.join(v, Seq("__tok"), "left")
      .select(col(idCol), col("__pos"),
        coalesce(col("__vid"), -Contamination.gramHash(col("__tok"))).as("__tid"))
      .groupBy(col(idCol))
      .agg(transform(
        sort_array(collect_list(struct(col("__pos"), col("__tid")))),
        s => s("__tid")).as(outCol))
    df.join(ids, Seq(idCol), "left")
  }
}
