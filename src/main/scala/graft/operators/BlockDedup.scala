package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sub-document (block-level) exact dedup — the C4 "deduplicate at the
  * line level" operator generalized to fixed-size token blocks: split
  * each document into consecutive `blockTokens`-token blocks (final
  * partial block included), keep the globally FIRST occurrence of every
  * distinct block (ordered by (id, position)), drop repeats everywhere
  * else. Catches boilerplate shared across documents that document-level
  * dedup ([[Dedup]], [[NearDup]]) cannot, because the containing docs
  * differ.
  *
  * Scale shape: blocks ride every shuffle as 60-bit md5 longs
  * ([[Contamination.gramHash]]); the winner election is one
  * map-side-combinable `min(struct(id, pos))` per block hash, and
  * membership comes back via a long-key join — no window over the
  * corpus, no strings, no driver state. Reconstruction
  * ([[dropDuplicateBlocks]]) re-reads block text from the original row
  * (a second scan of the input, not a shuffle of block strings).
  * Collisions (2^-60 per pair) can only merge two block identities,
  * deterministically and identically in the md5-replaying oracle.
  */
object BlockDedup {

  /** array<struct<pos int, block string>> of consecutive
    * `blockTokens`-token blocks of `ws` (0-based pos). */
  private def blockArr(ws: Column, blockTokens: Int): Column =
    transform(
      sequence(lit(0),
        greatest(ceil(size(ws).cast("double") / blockTokens).cast("int") - 1,
          lit(0))),
      p => struct(p.as("pos"),
        concat_ws(" ", slice(ws, p * blockTokens + 1, lit(blockTokens))).as("block")))

  /** One row per block: (idCol, pos, __h) — materialized once
    * (localCheckpoint), since every caller feeds it to both the winner
    * election and the membership join and would otherwise re-scan and
    * re-hash the corpus per consumer. Block IDENTITY is the hash of the
    * lower-cased block (same keys the normalized oracle replays), built
    * from raw tokens so [[dropDuplicateBlocks]] can reconstruct the
    * surviving text case-preserved from the same positions. */
  private def blocks(df: DataFrame, idCol: String, textCol: String,
      blockTokens: Int, model: Tokenize.Model): DataFrame = {
    // tokens staged into a column: the slice lambda would otherwise
    // re-tokenize the doc once per block (no CSE inside interpreted HOFs)
    df.select(col(idCol), model.rawTokens(col(textCol)).as("__ws"))
      .filter(size(col("__ws")) > 0)
      .select(col(idCol), explode(blockArr(col("__ws"), blockTokens)).as("b"))
      .select(col(idCol), col("b.pos").as("pos"),
        Contamination.gramHash(lower(col("b.block"))).as("__h"))
      .localCheckpoint()
  }

  /** First-occurrence winner per distinct block hash:
    * (__h, __wid, __wpos). */
  private def winners(bl: DataFrame, idCol: String): DataFrame =
    bl.groupBy(col("__h"))
      .agg(min(struct(col(idCol), col("pos"))).as("w"))
      .select(col("__h"), col(s"w.$idCol").as("__wid"), col("w.pos").as("__wpos"))

  /** Per-doc block-dedup stats:
    * (idCol, n_blocks, n_kept, dup_block_ratio) — `n_kept` counts the
    * blocks for which this doc holds the global first occurrence. Docs
    * whose text tokenizes to nothing get (0, 0, NULL). */
  def blockStats(df: DataFrame, idCol: String, textCol: String,
      blockTokens: Int = 10,
      model: Tokenize.Model = Tokenize.Whitespace): DataFrame = {
    val bl = blocks(df, idCol, textCol, blockTokens, model)
    val stats = bl.join(winners(bl, idCol), Seq("__h"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_blocks"),
        sum((col(idCol) === col("__wid") && col("pos") === col("__wpos"))
          .cast("long")).as("n_kept"))
      .select(col(idCol), col("n_blocks"), col("n_kept"),
        round(lit(1.0) - col("n_kept").cast("double")
          / col("n_blocks").cast("double"), 6).as("dup_block_ratio"))
    df.select(col(idCol)).join(stats, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_blocks"), lit(0L)).as("n_blocks"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        col("dup_block_ratio"))
  }

  /** The dedup itself: rewrite `textCol` keeping only first-occurrence
    * blocks (in original position order); other columns pass through.
    * Documents left with zero kept blocks keep an empty string; a doc
    * that keeps EVERY block keeps its text verbatim (original case and
    * spacing). Rewritten docs are rebuilt from raw (case-preserving)
    * tokens, single-spaced — block identity is case-insensitive but the
    * surviving text is not case-folded. */
  def dropDuplicateBlocks(df: DataFrame, idCol: String, textCol: String,
      blockTokens: Int = 10,
      model: Tokenize.Model = Tokenize.Whitespace): DataFrame = {
    val bl = blocks(df, idCol, textCol, blockTokens, model)
    // per doc in ONE pass over its blocks: total count + kept positions
    // (collect_list drops the nulls of non-winning blocks); a doc can
    // have blocks yet keep none (all first-occur elsewhere), so
    // "no blocks" (no row → NULL) must stay distinct from "kept none"
    // (empty array)
    val kept = bl.join(winners(bl, idCol), Seq("__h"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("__nb"),
        sort_array(collect_list(
          when(col(idCol) === col("__wid") && col("pos") === col("__wpos"),
            col("pos")))).as("__keep"))
    df.join(kept, Seq(idCol), "left")
      .withColumn("__ws", model.rawTokens(col(textCol)))
      .withColumn(textCol,
        when(col("__keep").isNull, col(textCol))                // no blocks
          .when(size(col("__keep")) === col("__nb"), col(textCol)) // kept all → verbatim
          .otherwise(concat_ws(" ", transform(col("__keep"),
            p => concat_ws(" ",
              slice(col("__ws"), p * blockTokens + 1, lit(blockTokens)))))))
      .drop("__keep", "__nb", "__ws")
  }
}
