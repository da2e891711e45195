package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EXACT-SUBSTRING dedup (Lee et al. 2022, "Deduplicating Training
  * Data Makes Language Models Better", §ExactSubstr): remove every
  * NON-FIRST occurrence of any duplicated `windowTokens`-token
  * sequence across the corpus. [[BlockDedup]]'s fixed non-overlapping
  * blocks only catch duplicates that happen to align on block
  * boundaries; the STRIDE-1 sliding windows here catch a repeated
  * passage at ANY offset — the ExactSubstr property, without the
  * suffix array (windowed hashing trades the paper's arbitrary-length
  * minimality for a fixed window length, the standard scalable
  * substitute; every duplicate of length ≥ windowTokens is still hit,
  * because it contains a duplicated window).
  *
  * Semantics, exactly: a window is a WINNER when its (id, pos) is the
  * corpus-minimum for its normalized (lower-cased) content hash; every
  * token covered by at least one NON-winning duplicated window is
  * removed; surviving tokens re-join in order, case preserved. First
  * occurrences therefore survive intact; repeats collapse to the
  * tokens no duplicated window covers. A document can empty out
  * entirely (it still appears, with empty text — the caller decides
  * whether to drop it).
  *
  * Scale shape: windows ride every shuffle as 60-bit
  * [[Contamination.gramHash]] longs (never window strings); the winner
  * election is one map-side-combinable `min(struct(id, pos))` per
  * hash; non-winning windows collapse to [start, end] INTERVALS that
  * are merged per id BEFORE any per-token explosion (r12 — the r11
  * shape exploded every non-winner window to `windowTokens` mark rows
  * first, so a heavily duplicated corpus shuffled up to windowTokens×
  * the covered-token count before `distinct()` bounded it; merged
  * intervals are disjoint, so their explosion is covered-token-bounded
  * and needs no dedup shuffle at all); reconstruction re-reads tokens
  * from the one materialized projection, not from a shuffle of
  * strings. Everything is md5/order arithmetic an oracle replays
  * exactly (q164). Null-text documents pass through as empty (zero
  * tokens, empty text) — every input id appears in the output. */
object ExactSubstr {

  /** (idCol, textCol cleaned, n_tokens, n_removed) per input document
    * — `textCol` with every non-first duplicated window's tokens
    * removed. `idCol` must be unique and orderable (it breaks winner
    * ties). */
  def dropDuplicateSpans(df: DataFrame, idCol: String, textCol: String,
      windowTokens: Int = 50,
      model: Tokenize.Model = Tokenize.Whitespace): DataFrame = {
    require(windowTokens >= 2,
      s"windowTokens=$windowTokens must be >= 2 (1 would dedup tokens)")
    val toks = df
      .select(col(idCol), coalesce(model.rawTokens(col(textCol)),
        array().cast("array<string>")).as("__ws"))
      .localCheckpoint() // windows + reconstruction both consume it
    // stride-1 windows, hashed in-row (the token array never rides a
    // shuffle; each window's normalized hash does, as one long)
    val windows = toks
      .filter(size(col("__ws")) >= windowTokens)
      .select(col(idCol), explode(transform(
        sequence(lit(0), size(col("__ws")) - windowTokens),
        p => struct(p.as("pos"), Contamination.gramHash(
          lower(concat_ws(" ",
            slice(col("__ws"), p + 1, lit(windowTokens))))).as("h")))).as("w"))
      .select(col(idCol), col("w.pos").as("__pos"), col("w.h").as("__h"))
    val winners = windows.groupBy(col("__h"))
      .agg(min(struct(col(idCol), col("__pos"))).as("w"))
      .select(col("__h"), col(s"w.$idCol").as("__wid"),
        col("w.__pos").as("__wpos"))
    // non-winning occurrences of duplicated windows → covered-token
    // INTERVALS, merged per id before any explosion: a window is one
    // (start, end) row through the shuffle, overlapping intervals
    // collapse with the classic running-max sweep, and only the
    // DISJOINT merged spans explode — so the exploded volume is
    // bounded by the covered token count (never windowTokens× it) and
    // the marks are unique by construction, no distinct() shuffle
    val byId = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("__s"))
    val prevMax = max(col("__e")).over(byId.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, -1))
    val marks = windows.join(winners, Seq("__h"))
      .filter(!(col(idCol) === col("__wid") && col("__pos") === col("__wpos")))
      .select(col(idCol), col("__pos").as("__s"),
        (col("__pos") + (windowTokens - 1)).as("__e"))
      .withColumn("__new",
        when(prevMax.isNull || col("__s") > prevMax, 1L).otherwise(0L))
      .withColumn("__g", sum(col("__new")).over(byId))
      .groupBy(col(idCol), col("__g"))
      .agg(min(col("__s")).as("__s"), max(col("__e")).as("__e"))
      .select(col(idCol),
        explode(sequence(col("__s"), col("__e"))).as("__tp"))
    val kept = toks
      .select(col(idCol), posexplode(col("__ws")).as(Seq("__tp", "__tok")))
      .join(marks, Seq(idCol, "__tp"), "left_anti")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("__nkept"),
        concat_ws(" ", transform(
          sort_array(collect_list(struct(col("__tp"), col("__tok")))),
          s => s("__tok"))).as("__clean"))
    toks.select(col(idCol), size(col("__ws")).cast("long").as("n_tokens"))
      .join(kept, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__clean"), lit("")).as(textCol),
        col("n_tokens"),
        (col("n_tokens") - coalesce(col("__nkept"), lit(0L))).as("n_removed"))
  }
}
