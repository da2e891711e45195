package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sliding-window document chunking: split each document into
  * fixed-token-budget chunks with a declared overlap — the
  * context-window prep step of both pre-training tokenization and RAG
  * indexing (each chunk must fit the model; the overlap keeps boundary
  * context from being lost).
  *
  * Chunk i covers tokens [i·stride, i·stride + chunkTokens) with
  * stride = chunkTokens − overlap; the chunk count
  * max(1, ⌈(n − overlap)/stride⌉) guarantees every token is covered and
  * the last chunk still starts inside the document (no pure-overlap
  * tail). All arithmetic is integer, so any engine replays the layout
  * exactly.
  *
  * Scale shape: one codegen'd projection + a generator (explode) per
  * row — NO shuffle, no state; output rows ≈ input tokens / stride.
  * Chunk text leaves the operator as both the token slice and an md5
  * fingerprint (downstream dedup/indexing usually wants the hash, not
  * another copy of the corpus).
  */
object Chunking {

  /** One row per (doc, chunk): doc id, chunk_idx, start_tok, chunk_tok
    * (actual token count — short for the final chunk), chunk_fp.
    * Tokenization is the shared [[Tokenize]] model so chunk budgets mean
    * the same tokens as [[Caps]]/[[Mixture]]/[[Packing]] budgets. */
  def chunk(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, overlap: Int,
      model: Tokenize.Model = Tokenize.Whitespace): DataFrame = {
    require(overlap >= 0 && overlap < chunkTokens,
      s"overlap $overlap must be in [0, $chunkTokens)")
    val stride = chunkTokens - overlap
    val ws = Tokenize.tokens(col(textCol), model)
    val nTok = size(ws).cast("long")
    // Spark's `/` on longs is double division; floor+cast restores the
    // integer ceil-div. Token counts are far under 2^53 so the double
    // round-trip is exact and matches DuckDB's `//` bit-for-bit.
    val nChunks = greatest(lit(1L),
      floor((nTok - lit(overlap.toLong) + lit(stride.toLong) - 1L)
        / lit(stride.toDouble)).cast("long"))
    val startTok = col("chunk_idx") * lit(stride.toLong)
    val toks = slice(col("__ws"), (startTok + 1L).cast("int"), lit(chunkTokens))
    df.select(col(idCol), ws.as("__ws"), nTok.as("n_tok"),
        explode(sequence(lit(0L), nChunks - 1L)).as("chunk_idx"))
      .select(col(idCol), col("chunk_idx"), startTok.as("start_tok"),
        size(toks).cast("long").as("chunk_tok"),
        md5(concat_ws(" ", toks)).as("chunk_fp"))
  }
}
