package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Round-8 additions: the persisted-ANN-index path — build the IVF-PQ
  * index as CommitLog tables once, answer searches from the index
  * alone (VERDICT r7 #1: stop re-encoding the corpus per query). */
object IndexQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  /** C3 persisted ANN index ([[graft.operators.Similarity.buildIvfPqIndex]] /
    * [[graft.operators.Similarity.searchIvfPqIndex]]): build the IVF-PQ
    * index into CommitLog tables (postings partition-tagged by cell,
    * codebooks, meta), then answer q117's exact search FROM THE INDEX —
    * the corpus embeddings are read once at build, never at search; the
    * search reads only the probed cells' postings files via
    * manifest-level pruning. Same oracle as q117: the persisted path is
    * bit-identical to the on-the-fly pipeline, so the composed
    * build+search round-trip is hash-checked at both SFs. */
  private val q133 = Q(
    "q133_ann_index_search",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      // deterministic per-SF scratch root: each run rebuilds (a new
      // committed version); delete first so repeated runs don't grow
      val root = s"${System.getProperty("java.io.tmpdir")}/graft-ann-index-" +
        dir.replaceAll("[^A-Za-z0-9.]", "_")
      val p = new org.apache.hadoop.fs.Path(root)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(p, true)
      graft.operators.Similarity.buildIvfPqIndex(
        emb, "vec_id", "embedding", root,
        nlist = 16, m = 8, ksub = 16, dim = 64)
      graft.operators.Similarity.searchIvfPqIndex(
          s, root, emb.filter(col("vec_id") < 50), "vec_id", "embedding",
          k = 3, nprobe = 4)
        .orderBy(col("q_id"), col("rank"))
    },
    // q117's oracle verbatim — the index is a storage layout, not a
    // semantics change, so the same SQL replays build+search exactly
    Some("""WITH cb AS (
        SELECT vec_id AS cell, embedding AS cbv
        FROM embeddings ORDER BY vec_id LIMIT 16),
      cdist AS (
        SELECT e.vec_id, cb.cell,
          list_sum(list_transform(range(1, 65), i ->
            (CAST(e.embedding[CAST(i AS INT)] AS DOUBLE)
               - CAST(cb.cbv[CAST(i AS INT)] AS DOUBLE))
            * (CAST(e.embedding[CAST(i AS INT)] AS DOUBLE)
               - CAST(cb.cbv[CAST(i AS INT)] AS DOUBLE)))) AS d2
        FROM embeddings e CROSS JOIN cb),
      asg AS (
        SELECT vec_id AS c_id, cell FROM (
          SELECT vec_id, cell,
            ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn
          FROM cdist)
        WHERE rn = 1),
      probes AS (
        SELECT vec_id AS q_id, cell FROM (
          SELECT vec_id, cell,
            ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn
          FROM cdist WHERE vec_id < 50)
        WHERE rn <= 4),
      pcb AS (
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS code,
          embedding AS cbv
        FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 16)),
      sub AS (SELECT CAST(unnest(range(8)) AS INT) AS j),
      cd AS (
        SELECT e.vec_id, s.j, pcb.code,
          list_sum(list_transform(range(1, 9), i ->
            (CAST(e.embedding[s.j*8 + CAST(i AS INT)] AS DOUBLE)
               - CAST(pcb.cbv[s.j*8 + CAST(i AS INT)] AS DOUBLE))
            * (CAST(e.embedding[s.j*8 + CAST(i AS INT)] AS DOUBLE)
               - CAST(pcb.cbv[s.j*8 + CAST(i AS INT)] AS DOUBLE)))) AS d2
        FROM embeddings e CROSS JOIN sub s CROSS JOIN pcb),
      codes AS (
        SELECT vec_id, j, code FROM (
          SELECT vec_id, j, code,
            ROW_NUMBER() OVER (PARTITION BY vec_id, j ORDER BY d2, code) AS rn
          FROM cd) WHERE rn = 1),
      qd AS (SELECT vec_id AS q_id, j, code, d2 FROM cd WHERE vec_id < 50),
      scored0 AS (
        SELECT p.q_id, a.c_id,
          list_sum(list(q.d2 ORDER BY q.j)) AS approx_d2
        FROM probes p
        JOIN asg a ON a.cell = p.cell AND a.c_id <> p.q_id
        JOIN codes c ON c.vec_id = a.c_id
        JOIN qd q ON q.q_id = p.q_id AND q.j = c.j AND q.code = c.code
        GROUP BY 1, 2),
      scored AS (
        SELECT q_id, c_id, approx_d2,
          ROW_NUMBER() OVER (PARTITION BY q_id
            ORDER BY approx_d2, c_id) AS rank
        FROM scored0)
      SELECT q_id, rank, c_id, approx_d2 FROM scored
      WHERE rank <= 3 ORDER BY q_id, rank"""))

  val qs: Seq[Q] = Seq(q133)
}
