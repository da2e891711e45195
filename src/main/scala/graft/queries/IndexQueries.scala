package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Round-8 additions: the persisted-index family — build the IVF-PQ
  * index as CommitLog tables once and answer searches from the index
  * alone (VERDICT r7 #1); z-order + footer-stats file skipping on
  * commit-log tables (#3); the change-feed read (#4). */
object IndexQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  /** Per-SF scratch commit-log root, rebuilt each run. */
  private def scratch(s: SparkSession, dir: String, tag: String): String = {
    val root = s"${System.getProperty("java.io.tmpdir")}/graft-$tag-" +
      dir.replaceAll("[^A-Za-z0-9.]", "_")
    val p = new org.apache.hadoop.fs.Path(root)
    p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
    root
  }

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
      val root = scratch(s, dir, "ann-index")
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
    Some(ivfPqOracle))

  /** C3 incremental index maintenance
    * ([[graft.operators.Similarity.appendToIvfPqIndex]]): build the
    * index on the first slice of the corpus, APPEND the rest encoded
    * with the persisted codebooks (cost ∝ batch — existing postings
    * untouched), search the combined index. The build slice contains
    * the lowest-id vectors, so its sampled codebooks equal the
    * full-corpus ones and incremental ≡ one-shot build — pinned by
    * q117's verbatim oracle at both SFs. */
  private val q136 = Q(
    "q136_ann_index_append",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      val root = scratch(s, dir, "ann-append")
      graft.operators.Similarity.buildIvfPqIndex(
        emb.filter(col("vec_id") < 100), "vec_id", "embedding", root,
        nlist = 16, m = 8, ksub = 16, dim = 64)
      graft.operators.Similarity.appendToIvfPqIndex(
        s, root, emb.filter(col("vec_id") >= 100), "vec_id", "embedding")
      graft.operators.Similarity.searchIvfPqIndex(
          s, root, emb.filter(col("vec_id") < 50), "vec_id", "embedding",
          k = 3, nprobe = 4)
        .orderBy(col("q_id"), col("rank"))
    },
    Some(ivfPqOracle))

  private lazy val ivfPqOracle: String = """WITH cb AS (
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
      WHERE rank <= 3 ORDER BY q_id, rank"""

  /** B2 z-order + file-stats skipping end-to-end
    * ([[graft.operators.Layout.zOrderFrame]] →
    * [[graft.sources.CommitLog.readRange]]): lineitem lands z-ordered
    * on (l_orderkey, l_suppkey) in a commit-log table whose manifest
    * carries per-file footer min/max, and the range read prunes the
    * non-overlapping files WITHOUT opening them (file-count pinned by
    * CommitLogSpec/LayoutSpec; here the oracle checks the exact
    * aggregate over the surviving rows — pruning must never change
    * results, only file counts). Closes r7's "zorder exists but the
    * log can't exploit it" gap as a declared query. */
  private val q134 = Q(
    "q134_zorder_stats_pruning",
    (s, dir) => {
      val li = t(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_suppkey"),
        col("l_extendedprice"), col("l_quantity"))
      val root = scratch(s, dir, "zorder-log")
      val log = graft.sources.CommitLog(s, root)
      log.replaceAll(graft.operators.Layout.zOrderFrame(
        li, Seq("l_orderkey", "l_suppkey"), numFiles = 16))
      log.readRange("l_orderkey", 1000L, 3000L)
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_price"))
        .orderBy(col("l_suppkey"))
    },
    Some("""SELECT l_suppkey, COUNT(*) AS n,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      FROM lineitem
      WHERE l_orderkey BETWEEN 1000 AND 3000
      GROUP BY l_suppkey ORDER BY l_suppkey"""))

  /** B2 change-feed read ([[graft.sources.CommitLog.readChanges]]):
    * seed a table (append), merge a re-priced batch (upsert/replace),
    * then read the WHOLE change feed from the table's creation — the
    * incremental-consumer view the reference's poller diffs snapshots
    * to get. The oracle reconstructs the same feed relationally:
    * v0 inserts = the seed, v1 deletes = the seed (the rewrite retires
    * it), v1 inserts = the merged table. Aggregated per (version,
    * change type) with an exact keysum so content, not just counts,
    * is hash-pinned. */
  private val q135 = Q(
    "q135_commitlog_changefeed",
    (s, dir) => {
      val o = t(s, dir, "orders").select(
        col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
      val root = scratch(s, dir, "cdc-log")
      val log = graft.sources.CommitLog(s, root)
      log.append(o.filter(col("o_orderkey") % 3 === 0))           // v0
      log.upsert(
        o.filter(col("o_orderkey") % 5 === 0)
          .select(col("o_orderkey"),
            (col("o_totalprice") * 2).as("o_totalprice"), col("o_orderstatus")),
        Seq("o_orderkey"), graft.sources.CommitLog.LastWins)      // v1
      log.readChanges(-1L)
        .groupBy(col("_commit_version"), col("_change_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("sum_price"),
          sum(col("o_orderkey")).as("key_sum"))
        .orderBy(col("_commit_version"), col("_change_type"))
    },
    Some("""WITH v0 AS (
        SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
        WHERE o_orderkey % 3 = 0),
      inc AS (
        SELECT o_orderkey, o_totalprice * 2 AS o_totalprice, o_orderstatus
        FROM orders WHERE o_orderkey % 5 = 0),
      v1 AS (
        SELECT * FROM inc
        UNION ALL
        SELECT * FROM v0 WHERE o_orderkey NOT IN (SELECT o_orderkey FROM inc)),
      feed AS (
        SELECT CAST(0 AS BIGINT) AS _commit_version, 'insert' AS _change_type, * FROM v0
        UNION ALL
        SELECT CAST(1 AS BIGINT), 'delete', * FROM v0
        UNION ALL
        SELECT CAST(1 AS BIGINT), 'insert', * FROM v1)
      SELECT _commit_version, _change_type, COUNT(*) AS n,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
      FROM feed GROUP BY 1, 2
      ORDER BY _commit_version, _change_type"""))

  /** B2 row-level DELETE ([[graft.sources.CommitLog.delete]]): lineitem
    * lands partition-tagged by return flag, then one predicate deletes
    * the low-quantity 'R' rows — manifest stats restrict the find scan
    * to the 'R' partition's files (the equality conjunct prunes on the
    * string stats), the rewrite touches only files that actually hold
    * matching rows, and every other file rides through the commit
    * untouched (file-diff pinned by CommitLogSpec; here the oracle
    * checks the surviving rows exactly — the reference's analog is a
    * conditional DeleteItem, /root/reference/index.js:368 territory,
    * done as a table rewrite the way a lakehouse DELETE works). */
  private val q137 = Q(
    "q137_commitlog_delete",
    (s, dir) => {
      val li = t(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        col("l_quantity"), col("l_extendedprice"))
      val root = scratch(s, dir, "delete-log")
      val log = graft.sources.CommitLog(s, root)
      log.appendPartitioned(li, "l_returnflag")
      log.delete(col("l_returnflag") === "R" && col("l_quantity") <= 10.0,
        partCol = Some("l_returnflag"))
      log.read()
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_price"),
          sum(col("l_orderkey") * lit(7L) + col("l_linenumber")).as("key_sum"))
        .orderBy(col("l_returnflag"))
    },
    Some("""SELECT l_returnflag, COUNT(*) AS n,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        CAST(SUM(l_orderkey * 7 + l_linenumber) AS BIGINT) AS key_sum
      FROM lineitem
      WHERE NOT (l_returnflag = 'R' AND l_quantity <= 10)
      GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** B2 row-level UPDATE ([[graft.sources.CommitLog.update]]): lineitem
    * lands partition-tagged by return flag, then one predicate-local
    * UPDATE halves the price and bumps the quantity of the low-quantity
    * 'R' rows — [[graft.sources.CommitLog.delete]]'s three pruning
    * layers verbatim (manifest stats restrict the find scan to the 'R'
    * partition, only files actually holding a match rewrite, every
    * other file rides through), with SQL's simultaneous-assignment
    * semantics (both RHS see the OLD row). The oracle replays the
    * update as a CASE projection over the base table; exact halving
    * (×0.5) and integer bump (+100) keep double arithmetic bit-equal
    * across engines. */
  private val q144 = Q(
    "q144_commitlog_update",
    (s, dir) => {
      val li = t(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        col("l_quantity"), col("l_extendedprice"))
      val root = scratch(s, dir, "update-log")
      val log = graft.sources.CommitLog(s, root)
      log.appendPartitioned(li, "l_returnflag")
      log.update(col("l_returnflag") === "R" && col("l_quantity") <= 10.0,
        Map("l_extendedprice" -> (col("l_extendedprice") * 0.5),
          "l_quantity" -> (col("l_quantity") + 100.0)),
        partCol = Some("l_returnflag"))
      log.read()
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_price"),
          sum(col("l_orderkey") * lit(7L) + col("l_linenumber")).as("key_sum"))
        .orderBy(col("l_returnflag"))
    },
    Some("""WITH upd AS (
        SELECT l_orderkey, l_linenumber, l_returnflag,
          CASE WHEN l_returnflag = 'R' AND l_quantity <= 10
               THEN l_quantity + 100.0 ELSE l_quantity END AS l_quantity,
          CASE WHEN l_returnflag = 'R' AND l_quantity <= 10
               THEN l_extendedprice * 0.5 ELSE l_extendedprice END AS l_extendedprice
        FROM lineitem)
      SELECT l_returnflag, COUNT(*) AS n,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        CAST(SUM(l_orderkey * 7 + l_linenumber) AS BIGINT) AS key_sum
      FROM upd GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** B2 RESTORE ([[graft.sources.CommitLog.restore]]): seed a table,
    * merge a re-pricing, row-delete a status — then roll the table
    * back to the seed as a NEW commit (no data copied: the restore
    * manifest restates the seed's still-on-disk files, which is why
    * [[graft.sources.CommitLog.vacuum]] keeps every retained-manifest
    * file). The read after restore must equal the seed exactly — the
    * oracle IS the seed aggregate; the intermediate versions stay
    * time-travel-reachable (spec-pinned in CommitLogSpec). */
  private val q145 = Q(
    "q145_commitlog_restore",
    (s, dir) => {
      val o = t(s, dir, "orders").select(
        col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice").cast("decimal(18,2)").as("price"))
      val root = scratch(s, dir, "restore-log")
      val log = graft.sources.CommitLog(s, root)
      log.append(o.filter(col("o_orderkey") % 3 === 0))            // v0
      log.upsert(
        o.filter(col("o_orderkey") % 5 === 0)
          .select(col("o_orderkey"), col("o_orderstatus"),
            (col("price") * 2).cast("decimal(18,2)").as("price")),
        Seq("o_orderkey"), graft.sources.CommitLog.LastWins)       // v1
      log.delete(col("o_orderstatus") === "F")                     // v2
      log.restore(0L)                                              // v3 = v0 state
      log.read()
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("price")).cast("double").as("revenue"),
          sum(col("o_orderkey")).as("key_sum"))
        .orderBy(col("o_orderstatus"))
    },
    Some("""SELECT o_orderstatus, COUNT(*) AS n,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
      FROM orders WHERE o_orderkey % 3 = 0
      GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  /** C3 kNN JOIN with a large query side
    * ([[graft.operators.Similarity.ivfKnnJoinLargeQ]]): the WHOLE
    * embeddings table queries itself — no query broadcast anywhere
    * (both sides shuffle on cell into a hash join) and the top-k is a
    * bounded partial aggregation instead of a window, so the q_id
    * shuffle carries ≤ nprobe·k rows per query. Semantics are
    * q59's IVF search; the oracle replays it for every vector as the
    * query set. */
  private val q138 = Q(
    "q138_knn_join_large",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      graft.operators.Similarity.ivfKnnJoinLargeQ(
          emb, emb, "vec_id", "vec_id", "embedding",
          k = 3, nlist = 16, nprobe = 4)
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
          FROM d2)
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

  /** B2 bloom-indexed point lookup
    * ([[graft.sources.CommitLog.withBloomIndex]] /
    * [[graft.sources.CommitLog.readPoint]]): lineitem lands as ONE
    * append of a hash-repartitioned frame — each of its 4 files holds
    * a hash-spread of order keys, so every file spans nearly the whole
    * l_orderkey range and min/max stats prune NOTHING for a point
    * probe — the per-file bloom filters (q94's md5-position sketch,
    * persisted in the manifest) are what rule files out (a given key's
    * rows hash to one file). Three point reads, each pruned
    * independently; the oracle checks the exact surviving rows
    * (pruning must never change results — no false negatives is the
    * bloom contract), and CommitLogSpec pins the file-count side. */
  private val q141 = Q(
    "q141_bloom_point_read",
    (s, dir) => {
      val li = t(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_quantity"))
      val root = scratch(s, dir, "bloom-log")
      val log = graft.sources.CommitLog(s, root)
        .withBloomIndex(Seq("l_orderkey"), bits = 8192, k = 3)
      log.append(li.repartition(4, col("l_orderkey")))
      Seq(33L, 1027L, 4963L)
        .map(k => log.readPoint("l_orderkey", k))
        .reduce(_.unionByName(_))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
    },
    Some("""SELECT l_orderkey, l_linenumber, l_partkey, l_quantity
      FROM lineitem
      WHERE l_orderkey IN (33, 1027, 4963)
      ORDER BY l_orderkey, l_linenumber, l_partkey"""))

  /** B2/B14 incremental materialized view
    * ([[graft.operators.MatView]]): a per-status (count, revenue)
    * aggregate maintained from the base table's CHANGE FEED — append,
    * re-pricing merge, and row-level delete each arrive as deltas
    * applied to the persisted view (one version per step, the
    * streaming consumer's cadence), never a recompute of the base.
    * Sums ride as decimals so delta application is exact and
    * batching-independent; the oracle aggregates the reconstructed
    * final base state directly — maintained ≡ recomputed is the
    * correctness claim. */
  private val q143 = Q(
    "q143_incremental_matview",
    (s, dir) => {
      val o = t(s, dir, "orders").select(
        col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice").cast("decimal(18,2)").as("price"))
      val root = scratch(s, dir, "mv-base")
      val viewRoot = scratch(s, dir, "mv-view")
      val base = graft.sources.CommitLog(s, root)
      base.append(o.filter(col("o_orderkey") % 3 === 0))            // v0
      base.upsert(
        o.filter(col("o_orderkey") % 5 === 0)
          .select(col("o_orderkey"), col("o_orderstatus"),
            (col("price") * 2).cast("decimal(18,2)").as("price")),
        Seq("o_orderkey"), graft.sources.CommitLog.LastWins)        // v1
      base.delete(col("o_orderstatus") === "F")                     // v2
      graft.operators.MatView.catchUp(s, viewRoot, base,
        Seq("o_orderstatus"), Seq("price"), fromVersion = -1L, step = 1L)
      graft.sources.CommitLog(s, viewRoot).read()
        .select(col("o_orderstatus"), col("n"),
          col("sum_price").cast("double").as("revenue"))
        .orderBy(col("o_orderstatus"))
    },
    Some("""WITH v0 AS (
        SELECT o_orderkey, o_orderstatus,
          CAST(o_totalprice AS DECIMAL(18,2)) AS price
        FROM orders WHERE o_orderkey % 3 = 0),
      inc AS (
        SELECT o_orderkey, o_orderstatus,
          CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 2 AS DECIMAL(18,2)) AS price
        FROM orders WHERE o_orderkey % 5 = 0),
      v1 AS (
        SELECT * FROM inc
        UNION ALL
        SELECT * FROM v0 WHERE o_orderkey NOT IN (SELECT o_orderkey FROM inc)),
      v2 AS (SELECT * FROM v1 WHERE NOT o_orderstatus = 'F')
      SELECT o_orderstatus, COUNT(*) AS n,
        CAST(SUM(price) AS DOUBLE) AS revenue
      FROM v2 GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  /** B2 full MERGE INTO ([[graft.sources.CommitLog.merge]]): orders
    * seed a commit-log table, then ONE merge applies the ANSI trio —
    * WHEN MATCHED AND s.price > 300000 THEN DELETE, WHEN MATCHED THEN
    * UPDATE (re-price + re-status), WHEN NOT MATCHED THEN INSERT — in a
    * single commit. The FIND phase is source-driven: the batch's key
    * envelope prunes against manifest stats, a semi-join picks the
    * files that actually hold a matched key, and only those rewrite
    * (file-diff pinned in CommitLogSpec; here the oracle replays the
    * clause semantics as CASE + anti-join over the base table). This
    * generalizes the reference's on-conflict put-else-update branch
    * (/root/reference/index.js:265-283) to the lakehouse form. Decimal
    * price arithmetic keeps both engines bit-equal. */
  private val q148 = Q(
    "q148_commitlog_merge",
    (s, dir) => {
      val o = t(s, dir, "orders").select(
        col("o_orderkey"), col("o_custkey"),
        col("o_totalprice").cast("decimal(18,2)").as("price"),
        col("o_orderstatus"))
      val root = scratch(s, dir, "merge-log")
      val log = graft.sources.CommitLog(s, root)
      log.append(o.filter(col("o_orderkey") % 3 =!= 0))
      val src = o.filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"), col("o_custkey"),
          (col("price") * 2).cast("decimal(18,2)").as("price"),
          lit("M").as("o_orderstatus"))
      log.merge(src, Seq("o_orderkey"), Seq(
        graft.sources.CommitLog.WhenMatchedDelete(
          Some(col("s.price") > 300000)),
        graft.sources.CommitLog.WhenMatchedUpdate(
          Map("price" -> col("s.price"), "o_orderstatus" -> col("s.o_orderstatus"))),
        graft.sources.CommitLog.WhenNotMatchedInsert()))
      log.read()
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("price")).cast("double").as("revenue"),
          sum(col("o_orderkey")).as("key_sum"))
        .orderBy(col("o_orderstatus"))
    },
    Some("""WITH tgt AS (
        SELECT o_orderkey, o_custkey,
          CAST(o_totalprice AS DECIMAL(18,2)) AS price, o_orderstatus
        FROM orders WHERE o_orderkey % 3 <> 0),
      src AS (
        SELECT o_orderkey, o_custkey,
          CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 2 AS DECIMAL(18,2)) AS price,
          'M' AS o_orderstatus
        FROM orders WHERE o_orderkey % 2 = 0),
      merged AS (
        SELECT t.o_orderkey, t.o_custkey,
          CASE WHEN s.o_orderkey IS NOT NULL THEN s.price ELSE t.price END AS price,
          CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_orderstatus
               ELSE t.o_orderstatus END AS o_orderstatus
        FROM tgt t LEFT JOIN src s ON t.o_orderkey = s.o_orderkey
        WHERE NOT (s.o_orderkey IS NOT NULL AND s.price > 300000)
        UNION ALL
        SELECT s.o_orderkey, s.o_custkey, s.price, s.o_orderstatus
        FROM src s WHERE s.o_orderkey NOT IN (SELECT o_orderkey FROM tgt))
      SELECT o_orderstatus, COUNT(*) AS n,
        CAST(SUM(price) AS DOUBLE) AS revenue,
        CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
      FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  /** B2 partitioned OPTIMIZE + Z-ORDER
    * ([[graft.sources.CommitLog.optimizePartitions]]): lineitem lands
    * partition-tagged by return flag in many small fragment commits,
    * then ONE maintenance call compacts + Z-orders ONLY the 'R'
    * partition on (l_orderkey, l_suppkey) — a `replace_parts` commit
    * that never reads or restates the other partitions' files (the
    * 100 TB form of q134's flat rewrite; file-diff pinned in
    * CommitLogSpec). The range read after the optimize prunes INSIDE
    * the partition via the fresh per-file stats; content is
    * bit-identical, which is what the oracle checks. */
  private val q149 = Q(
    "q149_optimize_partitions",
    (s, dir) => {
      val li = t(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_suppkey"), col("l_returnflag"),
        col("l_extendedprice"), col("l_quantity"))
      val root = scratch(s, dir, "optparts-log")
      val log = graft.sources.CommitLog(s, root)
      // fragmented landing: 4 interleaved slices, each spanning the
      // whole key range of every partition
      (0 until 4).foreach { i =>
        log.appendPartitioned(li.filter(col("l_orderkey") % 4 === i),
          "l_returnflag")
      }
      log.optimizePartitions("l_returnflag", targetFilesPerPartition = 4,
        partitions = Seq("R"), zorderBy = Seq("l_orderkey", "l_suppkey"))
      log.readRange("l_orderkey", 1000L, 3000L)
        .filter(col("l_returnflag") === "R")
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_price"))
        .orderBy(col("l_suppkey"))
    },
    Some("""SELECT l_suppkey, COUNT(*) AS n,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      FROM lineitem
      WHERE l_orderkey BETWEEN 1000 AND 3000 AND l_returnflag = 'R'
      GROUP BY l_suppkey ORDER BY l_suppkey"""))

  /** C3 index delete propagation
    * ([[graft.operators.Similarity.deleteFromIvfPqIndex]]): build the
    * persisted index, DELETE a slice of the corpus from it (one
    * WHEN-MATCHED-DELETE merge over the cell-tagged postings — only
    * cells holding a deleted id rewrite), then search. The deleted ids
    * sit outside the codebook sample range, so the oracle is q117's
    * SQL with the victims excluded from the CANDIDATE side only —
    * exactly what a fresh rebuild over the survivors would answer
    * (bit-parity spec-pinned in AnnIndexSpec). */
  private val q150 = Q(
    "q150_ann_index_delete",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      val root = scratch(s, dir, "ann-del")
      graft.operators.Similarity.buildIvfPqIndex(
        emb, "vec_id", "embedding", root,
        nlist = 16, m = 8, ksub = 16, dim = 64)
      graft.operators.Similarity.deleteFromIvfPqIndex(s, root,
        emb.filter(col("vec_id") % 7 === 3 && col("vec_id") >= 16)
          .select(col("vec_id")), "vec_id")
      graft.operators.Similarity.searchIvfPqIndex(
          s, root, emb.filter(col("vec_id") < 50), "vec_id", "embedding",
          k = 3, nprobe = 4)
        .orderBy(col("q_id"), col("rank"))
    },
    Some {
      val hook = "JOIN asg a ON a.cell = p.cell AND a.c_id <> p.q_id"
      val filtered = ivfPqOracle.replace(hook,
        hook + "\n          AND NOT (a.c_id % 7 = 3 AND a.c_id >= 16)")
      require(filtered != ivfPqOracle,
        "q150 oracle derivation lost its anchor in ivfPqOracle")
      filtered
    })

  /** B2 SQL DML on a PARTITION-TAGGED table (the r9 gap, closed):
    * orders land partition-tagged by status through the DSv2 catalog
    * (`merge.partcol`), then a SQL UPDATE re-prices a key-sliver of
    * one partition and ONE SQL MERGE INTO applies the ANSI trio across
    * partitions. The row-level commit re-lands the replacement content
    * through the one-job partitioned write
    * ([[graft.sources.CommitLog.commitStagedReplace]] with `partCol`),
    * so every rewritten file keeps a tag and untouched partitions ride
    * through byte-identical (file-diff pinned in SourcesSpec) — at
    * 100 TB every table is partitioned, so SQL DML that covers exactly
    * the partitioned tables is the surface that matters (the
    * reference's conditional put is keyed the same way,
    * /root/reference/index.js:352-375). The oracle replays UPDATE as a
    * CASE projection and MERGE as left-join + anti-union; decimal
    * arithmetic keeps both engines bit-equal. */
  private val q154 = Q(
    "q154_sql_dml_partitioned",
    (s, dir) => {
      val cat = "g154_" + java.lang.Integer.toHexString(dir.hashCode)
      val root = scratch(s, dir, "sqldml-wh")
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", root)
      val o = t(s, dir, "orders").select(
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice").cast("decimal(18,2)").as("price"))
      o.filter(col("o_orderkey") % 3 =!= 0)
        .writeTo(s"$cat.t")
        .tableProperty("merge.log", "true")
        .tableProperty("merge.partcol", "o_orderstatus")
        .create()
      s.sql(s"""UPDATE $cat.t SET price = CAST(price * 2 AS DECIMAL(18,2))
        WHERE o_orderstatus = 'P' AND o_orderkey % 5 = 0""")
      o.filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          (col("price") * 3).cast("decimal(18,2)").as("price"))
        .createOrReplaceTempView("q154_src")
      s.sql(s"""MERGE INTO $cat.t t USING q154_src s ON t.o_orderkey = s.o_orderkey
        WHEN MATCHED AND s.price > 400000 THEN DELETE
        WHEN MATCHED THEN UPDATE SET price = s.price
        WHEN NOT MATCHED THEN INSERT *""")
      s.table(s"$cat.t")
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("price")).cast("double").as("revenue"),
          sum(col("o_orderkey")).as("key_sum"))
        .orderBy(col("o_orderstatus"))
    },
    Some("""WITH tgt0 AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
          CAST(o_totalprice AS DECIMAL(18,2)) AS price
        FROM orders WHERE o_orderkey % 3 <> 0),
      tgt AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
          CASE WHEN o_orderstatus = 'P' AND o_orderkey % 5 = 0
               THEN CAST(price * 2 AS DECIMAL(18,2)) ELSE price END AS price
        FROM tgt0),
      src AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
          CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 3 AS DECIMAL(18,2)) AS price
        FROM orders WHERE o_orderkey % 2 = 0),
      merged AS (
        SELECT t.o_orderkey, t.o_custkey, t.o_orderstatus,
          CASE WHEN s.o_orderkey IS NOT NULL THEN s.price ELSE t.price END AS price
        FROM tgt t LEFT JOIN src s ON t.o_orderkey = s.o_orderkey
        WHERE NOT (s.o_orderkey IS NOT NULL AND s.price > 400000)
        UNION ALL
        SELECT s.o_orderkey, s.o_custkey, s.o_orderstatus, s.price
        FROM src s WHERE s.o_orderkey NOT IN (SELECT o_orderkey FROM tgt))
      SELECT o_orderstatus, COUNT(*) AS n,
        CAST(SUM(price) AS DOUBLE) AS revenue,
        CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
      FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  /** C3 persisted index with TRAINED (non-data-point) codebooks
    * ([[graft.operators.Similarity.Codebooks.Provided]], the r10
    * codebook-source surface): centroids are 4-vector AVERAGES — one
    * Lloyd-style averaging step over fixed assignments (cell j ←
    * vec_ids 4j..4j+3) — so the quantizers are genuinely synthesized
    * vectors, not corpus rows, exercising exactly the code path an
    * offline-trained codebook takes (the KMeans form of the same path
    * is spec-pinned in AnnIndexSpec; it has no SQL form, this does).
    * Bit-exactness: the element-wise mean is a FIXED-ORDER fold
    * (((0+v₀)+v₁)+v₂)+v₃ over doubles with a power-of-two divisor, so
    * both engines compute the identical codebook, and assignment /
    * probing / encoding / ADC replay as in q117. */
  private val q155 = Q(
    "q155_ann_trained_codebook",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      val root = scratch(s, dir, "ann-trained")
      val cbRows = emb.filter(col("vec_id") < 64)
        .groupBy(expr("vec_id DIV 4").as("cell"))
        .agg(sort_array(collect_list(struct(col("vec_id"), col("embedding"))))
          .as("__vs"))
        .select(col("cell"),
          aggregate(col("__vs"),
            transform(sequence(lit(1), lit(64)), _ => lit(0.0)),
            (acc, e) => zip_with(acc, e("embedding"),
              (a, x) => a + x.cast("double")),
            acc => transform(acc, a => a / lit(4.0))).as("v"))
      graft.operators.Similarity.buildIvfPqIndex(
        emb, "vec_id", "embedding", root,
        nlist = 16, m = 8, ksub = 16, dim = 64,
        codebooks = graft.operators.Similarity.Codebooks.Provided(cbRows, cbRows))
      graft.operators.Similarity.searchIvfPqIndex(
          s, root, emb.filter(col("vec_id") < 50), "vec_id", "embedding",
          k = 3, nprobe = 4)
        .orderBy(col("q_id"), col("rank"))
    },
    Some {
      // q117's pipeline over the averaged codebook: swap the two
      // codebook CTEs, keep assignment/probing/encoding/ADC verbatim
      val cbCte = """WITH cb AS (
        SELECT a.vec_id // 4 AS cell,
          list_transform(range(1, 65), i ->
            ((((0.0 + CAST(a.embedding[CAST(i AS INT)] AS DOUBLE))
               + CAST(b.embedding[CAST(i AS INT)] AS DOUBLE))
               + CAST(c.embedding[CAST(i AS INT)] AS DOUBLE))
               + CAST(d.embedding[CAST(i AS INT)] AS DOUBLE)) / 4.0) AS cbv
        FROM embeddings a
        JOIN embeddings b ON b.vec_id = a.vec_id + 1
        JOIN embeddings c ON c.vec_id = a.vec_id + 2
        JOIN embeddings d ON d.vec_id = a.vec_id + 3
        WHERE a.vec_id % 4 = 0 AND a.vec_id < 64),"""
      val pcbCte = """pcb AS (
        SELECT CAST(cell AS INT) AS code, cbv FROM cb),"""
      val body = ivfPqOracle
        .replace("""WITH cb AS (
        SELECT vec_id AS cell, embedding AS cbv
        FROM embeddings ORDER BY vec_id LIMIT 16),""", cbCte)
        .replace("""pcb AS (
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS code,
          embedding AS cbv
        FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 16)),""",
          pcbCte)
      require(body.contains("// 4 AS cell") && body.contains("CAST(cell AS INT) AS code"),
        "q155 oracle derivation lost its anchors in ivfPqOracle")
      body
    })

  /** B5/C2 q-gram prefix-filter fuzzy join
    * ([[graft.operators.FuzzyJoin.selfPairsQGram]], the r10 candidate
    * policy for the deletion neighborhood's documented break point):
    * every document-text pair within levenshtein distance 8 — a d the
    * O(len^d) deletion-variant policy cannot reach (it requires
    * d ≤ 2), over strings (48–553 chars) whose variant neighborhoods
    * would be astronomical anyway. Candidates come from each string's
    * d·q+1 RAREST distinct bigrams (global frequency order — the
    * ED-Join prefix filter), verified by exact levenshtein. The
    * oracle is the BRUTE-FORCE all-pairs join (with the
    * metric-implied |Δlen| ≤ d cut) — hash equality proves 100%
    * recall on this corpus, the q47/q101 discipline. */
  private val q156 = Q(
    "q156_qgram_fuzzy_join",
    (s, dir) =>
      // q=3: the trigram universe is ~20× the bigram one, so the rare-
      // prefix buckets (hence candidate pairs) shrink accordingly; the
      // gram-survival bound len ≥ q·(d+1) = 27 still clears the
      // corpus's 48-char minimum, so no SHORT bucket forms
      graft.operators.FuzzyJoin.selfPairsQGram(
        t(s, dir, "documents").select(col("doc_id"), col("text")),
        "doc_id", "text", maxDist = 8, q = 3)
        .select(col("a_id"), col("b_id"), col("dist").cast("long").as("dist"))
        .orderBy(col("a_id"), col("b_id")),
    Some("""SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        levenshtein(a.text, b.text) AS dist
      FROM documents a JOIN documents b
        ON a.doc_id < b.doc_id
        AND abs(length(a.text) - length(b.text)) <= 8
      WHERE levenshtein(a.text, b.text) <= 8
      ORDER BY a_id, b_id"""))

  /** C3/B14 ANN index SYNC ([[graft.streaming.AnnIndexSync]].applyChanges
    * — the change-feed-driven index maintenance the streaming form runs
    * per trigger, applied here as one batch catch-up so the oracle can
    * replay it): build the index on a base-table slice, then let the
    * base take an append, a rewriting upsert (delete+insert pairs in
    * the feed for unchanged rows — the net-effect collapse must cancel
    * them), and a delete; apply the whole feed to the index in one
    * call and search. The final index must equal an index of the final
    * base state, so the oracle is q117's pipeline with the candidate
    * side restricted to the surviving corpus (the build slice held the
    * lowest ids, so the oracle's codebook sample is unchanged). The
    * STREAMING form of the same apply (restart/replay convergence) is
    * spec-pinned in AnnIndexSpec. */
  private val q157 = Q(
    "q157_ann_index_sync",
    (s, dir) => {
      import graft.sources.CommitLog
      val emb = t(s, dir, "embeddings")
      val root = scratch(s, dir, "ann-sync")
      val base = CommitLog(s, s"$root/base")
      base.replaceAll(emb.filter(col("vec_id") < 300))
      graft.operators.Similarity.buildIvfPqIndex(
        base.read(), "vec_id", "embedding", s"$root/ix",
        nlist = 16, m = 8, ksub = 16, dim = 64)
      val v0 = base.snapshot().version
      base.append(emb.filter(col("vec_id") >= 300 && col("vec_id") < 420))
      base.upsert(emb.filter(col("vec_id") >= 100 && col("vec_id") < 140),
        Seq("vec_id"), CommitLog.LastWins)
      base.delete(col("vec_id") % 7 === 2 && col("vec_id") >= 16)
      graft.streaming.AnnIndexSync.applyChanges(
        s, s"$root/ix", base.readChanges(v0), "vec_id", "embedding")
      graft.operators.Similarity.searchIvfPqIndex(
          s, s"$root/ix", emb.filter(col("vec_id") < 50), "vec_id", "embedding",
          k = 3, nprobe = 4)
        .orderBy(col("q_id"), col("rank"))
    },
    Some {
      val hook = "JOIN asg a ON a.cell = p.cell AND a.c_id <> p.q_id"
      val synced = ivfPqOracle.replace(hook,
        hook + "\n          AND a.c_id < 420" +
          "\n          AND NOT (a.c_id % 7 = 2 AND a.c_id >= 16)")
      require(synced != ivfPqOracle,
        "q157 oracle derivation lost its anchor in ivfPqOracle")
      synced
    })

  /** B2 SQL DDL + DML over an EVOLVED schema (the r10 ALTER TABLE
    * surface under the hash gate, the way q154 gated tagged DML):
    * create a logged catalog table, `ALTER TABLE ADD COLUMNS` (a
    * metadata-only commit — pre-ALTER files read null), INSERT rows
    * that CARRY the new column, then a row-level SQL UPDATE whose
    * predicate and SET both touch the evolved column (old files hold
    * no `bonus` — the row-level scan reads them with the snapshot
    * schema, and the rewrite lands the full evolved width). The final
    * aggregate pins row counts, decimal sums, and the exact
    * null-backfill census per status. The added column's values are
    * integer-derived decimals, so both engines are bit-exact. */
  private val q159 = Q(
    "q159_sql_ddl_evolution",
    (s, dir) => {
      val cat = "g159_" + java.lang.Integer.toHexString(dir.hashCode)
      val root = scratch(s, dir, "ddl-wh")
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", root)
      val o = t(s, dir, "orders").select(
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice").cast("decimal(18,2)").as("price"))
      o.filter(col("o_orderkey") % 2 === 0)
        .writeTo(s"$cat.t")
        .tableProperty("merge.log", "true")
        .create()
      s.sql(s"ALTER TABLE $cat.t ADD COLUMNS (bonus DECIMAL(18,2))")
      o.filter(col("o_orderkey") % 2 === 1)
        .withColumn("bonus", (col("o_orderkey") % 100).cast("decimal(18,2)"))
        .createOrReplaceTempView("q159_src")
      s.sql(s"INSERT INTO $cat.t SELECT * FROM q159_src")
      s.sql(s"""UPDATE $cat.t SET bonus = CAST(0 AS DECIMAL(18,2))
        WHERE o_orderstatus = 'F' AND o_orderkey % 10 = 0 AND bonus IS NULL""")
      s.table(s"$cat.t")
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("price")).cast("double").as("revenue"),
          sum(coalesce(col("bonus"), lit(0))).cast("double").as("bonus_sum"),
          sum(when(col("bonus").isNull, 1L).otherwise(0L)).as("null_bonus"))
        .orderBy(col("o_orderstatus"))
    },
    Some("""WITH evens AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
          CAST(o_totalprice AS DECIMAL(18,2)) AS price,
          CAST(NULL AS DECIMAL(18,2)) AS bonus
        FROM orders WHERE o_orderkey % 2 = 0),
      odds AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
          CAST(o_totalprice AS DECIMAL(18,2)) AS price,
          CAST(o_orderkey % 100 AS DECIMAL(18,2)) AS bonus
        FROM orders WHERE o_orderkey % 2 = 1),
      t0 AS (SELECT * FROM evens UNION ALL SELECT * FROM odds),
      t1 AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, price,
          CASE WHEN o_orderstatus = 'F' AND o_orderkey % 10 = 0
                    AND bonus IS NULL
               THEN CAST(0 AS DECIMAL(18,2)) ELSE bonus END AS bonus
        FROM t0)
      SELECT o_orderstatus, COUNT(*) AS n,
        CAST(SUM(price) AS DOUBLE) AS revenue,
        CAST(SUM(COALESCE(bonus, 0)) AS DOUBLE) AS bonus_sum,
        CAST(SUM(CASE WHEN bonus IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS null_bonus
      FROM t1 GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  /** B5/C2 two-table fuzzy ENTITY LINKING at high d
    * ([[graft.operators.FuzzyJoin.pairsQGram]] — q156's prefix-filter
    * candidates in the cross-corpus form): link even-id documents to
    * odd-id ones within levenshtein 8. The two sides share ONE
    * union-frequency gram order (any shared total order preserves the
    * prefix proof) and block on (gram, width-d length window) with the
    * register-own-bin/probe-adjacent join. Oracle = the brute-force
    * cross join with the metric-implied |Δlen| cut — hash equality
    * proves cross-corpus recall, the q101/q156 discipline. */
  private val q160 = Q(
    "q160_qgram_entity_link",
    (s, dir) => {
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      graft.operators.FuzzyJoin.pairsQGram(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1),
        "doc_id", "text", maxDist = 8, q = 3)
        .select(col("l_id"), col("r_id"), col("dist").cast("long").as("dist"))
        .orderBy(col("l_id"), col("r_id"))
    },
    Some("""SELECT a.doc_id AS l_id, b.doc_id AS r_id,
        levenshtein(a.text, b.text) AS dist
      FROM documents a JOIN documents b
        ON a.doc_id % 2 = 0 AND b.doc_id % 2 = 1
        AND abs(length(a.text) - length(b.text)) <= 8
      WHERE levenshtein(a.text, b.text) <= 8
      ORDER BY l_id, r_id"""))

  /** B2 SQL DDL COLUMN MAPPING under the hash gate (the r11 RENAME/
    * DROP COLUMN surface — Delta-style physical-name mapping, no data
    * rewrite): create a logged catalog table, `RENAME COLUMN` (a
    * metadata-only commit — every pre-rename file reads under the new
    * name via its stable physical name), append THROUGH the renamed
    * schema (the staged-add path re-lands the batch with physical
    * names), a filter SQL DELETE (the library copy-on-write path,
    * mapping-aware), then `DROP COLUMN` + re-`ADD` of the same name —
    * the retired-physical rule means the re-added column must read
    * NULL everywhere, never resurrect the dropped bytes. The output
    * aggregates the final table AND the `VERSION AS OF 0` view (pinned
    * versions surface under CURRENT names by physical match), so hash
    * equality pins rename transparency, delete-under-mapping,
    * no-resurrection, and time travel at once. */
  private val q162 = Q(
    "q162_sql_ddl_rename",
    (s, dir) => {
      val cat = "g162_" + java.lang.Integer.toHexString(dir.hashCode)
      val root = scratch(s, dir, "rename-wh")
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", root)
      val o = t(s, dir, "orders").select(
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice").cast("decimal(18,2)").as("price"))
      o.filter(col("o_orderkey") % 2 === 0)
        .writeTo(s"$cat.t").tableProperty("merge.log", "true").create() // v0
      s.sql(s"ALTER TABLE $cat.t RENAME COLUMN price TO amount")        // v1
      o.filter(col("o_orderkey") % 2 === 1)
        .withColumnRenamed("price", "amount")
        .writeTo(s"$cat.t").append()                                    // v2
      s.sql(s"DELETE FROM $cat.t WHERE o_orderstatus = 'P'")            // v3
      s.sql(s"ALTER TABLE $cat.t DROP COLUMN o_custkey")                // v4
      s.sql(s"ALTER TABLE $cat.t ADD COLUMNS (o_custkey BIGINT)")       // v5
      // a pinned version reads with ITS OWN schema (old names), like
      // the library surface readVersion — so the v0 phase aggregates
      // the pre-rename `price` and the pre-drop `o_custkey` values
      def phaseAgg(df: DataFrame, phase: String, amountCol: String): DataFrame =
        df.groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"),
            sum(col(amountCol)).cast("double").as("amount_sum"),
            sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("ck_nulls"))
          .withColumn("phase", lit(phase))
      phaseAgg(s.table(s"$cat.t"), "current", "amount")
        .unionByName(phaseAgg(
          s.sql(s"SELECT * FROM $cat.t VERSION AS OF 0"), "v0", "price"))
        .orderBy(col("phase"), col("o_orderstatus"))
    },
    Some("""WITH base AS (
        SELECT o_orderkey, o_orderstatus,
          CAST(o_totalprice AS DECIMAL(18,2)) AS amount
        FROM orders),
      agg_cur AS (
        SELECT 'current' AS phase, o_orderstatus,
          COUNT(*) AS n, CAST(SUM(amount) AS DOUBLE) AS amount_sum,
          COUNT(*) AS ck_nulls -- re-added column: null on every row
        FROM base WHERE o_orderstatus <> 'P' GROUP BY o_orderstatus),
      agg_v0 AS (
        SELECT 'v0' AS phase, o_orderstatus, COUNT(*) AS n,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
            AS amount_sum,
          CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
            AS ck_nulls -- pinned version keeps its own (pre-drop) values
        FROM orders WHERE o_orderkey % 2 = 0 GROUP BY o_orderstatus)
      SELECT phase, o_orderstatus, n, amount_sum, ck_nulls
      FROM (SELECT * FROM agg_cur UNION ALL SELECT * FROM agg_v0)
      ORDER BY phase, o_orderstatus"""))

  /** B2 SQL ROW-LEVEL DML ON A COLUMN-MAPPED TABLE (r12 — composing
    * q154's UPDATE/MERGE surface with q162's rename): `RENAME COLUMN`,
    * then `UPDATE` and `MERGE INTO` directly against the MAPPED table
    * — no `materialize_mapping` prerequisite. The row-level scan
    * aliases the stable physical names back to the logical view, the
    * replacement content re-lands through the mapping write path, and
    * the `hi` phase aggregates through a PUSHED predicate on the
    * renamed column (the r12 mapping-aware V2 scan translates it to
    * the physical name at the parquet boundary — scan-level pushdown
    * survives the rename). Hash equality vs the DuckDB reconstruction
    * pins UPDATE-under-mapping, MERGE-under-mapping (matched update +
    * not-matched insert), and pushdown-under-mapping at once. */
  private val q165 = Q(
    "q165_sql_dml_mapped",
    (s, dir) => {
      val cat = "g165_" + java.lang.Integer.toHexString(dir.hashCode)
      val root = scratch(s, dir, "dml-mapped-wh")
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", root)
      val o = t(s, dir, "orders").select(
        col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice").cast("decimal(18,2)").as("price"))
      o.filter(col("o_orderkey") % 2 === 0)
        .writeTo(s"$cat.t").tableProperty("merge.log", "true").create() // v0
      s.sql(s"ALTER TABLE $cat.t RENAME COLUMN price TO amount")        // v1
      s.sql(s"""UPDATE $cat.t SET amount = CAST(amount * 2 AS DECIMAL(18,2))
        WHERE o_orderstatus = 'F' AND o_orderkey % 4 = 0""")            // v2
      o.filter(col("o_orderkey") % 3 === 0)
        .select(col("o_orderkey"), col("o_orderstatus"),
          (col("o_orderkey") % 50).cast("decimal(18,2)").as("amount"))
        .createOrReplaceTempView("q165_src")
      s.sql(s"""MERGE INTO $cat.t t USING q165_src s
        ON t.o_orderkey = s.o_orderkey
        WHEN MATCHED THEN UPDATE SET amount = s.amount
        WHEN NOT MATCHED THEN INSERT *""")                              // v3
      def phase(df: DataFrame, name: String): DataFrame =
        df.groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"),
            sum(col("amount")).cast("double").as("amount_sum"))
          .withColumn("phase", lit(name))
      phase(s.table(s"$cat.t"), "all")
        .unionByName(phase(
          s.table(s"$cat.t").filter(col("amount") > 500), "hi"))
        .orderBy(col("phase"), col("o_orderstatus"))
    },
    Some("""WITH base AS (
        SELECT o_orderkey, o_orderstatus,
          CAST(o_totalprice AS DECIMAL(18,2)) AS amount
        FROM orders WHERE o_orderkey % 2 = 0),
      upd AS (
        SELECT o_orderkey, o_orderstatus,
          CASE WHEN o_orderstatus = 'F' AND o_orderkey % 4 = 0
               THEN CAST(amount * 2 AS DECIMAL(18,2)) ELSE amount
          END AS amount
        FROM base),
      src AS (
        SELECT o_orderkey, o_orderstatus,
          CAST(o_orderkey % 50 AS DECIMAL(18,2)) AS amount
        FROM orders WHERE o_orderkey % 3 = 0),
      merged AS (
        SELECT u.o_orderkey, u.o_orderstatus,
          COALESCE(s.amount, u.amount) AS amount
        FROM upd u LEFT JOIN src s ON u.o_orderkey = s.o_orderkey
        UNION ALL
        SELECT o_orderkey, o_orderstatus, amount FROM src
        WHERE o_orderkey % 2 = 1),
      ph_all AS (
        SELECT 'all' AS phase, o_orderstatus, COUNT(*) AS n,
          CAST(SUM(amount) AS DOUBLE) AS amount_sum
        FROM merged GROUP BY o_orderstatus),
      ph_hi AS (
        SELECT 'hi' AS phase, o_orderstatus, COUNT(*) AS n,
          CAST(SUM(amount) AS DOUBLE) AS amount_sum
        FROM merged WHERE amount > 500 GROUP BY o_orderstatus)
      SELECT phase, o_orderstatus, n, amount_sum
      FROM (SELECT * FROM ph_all UNION ALL SELECT * FROM ph_hi)
      ORDER BY phase, o_orderstatus"""))

  /** B2 NESTED-COLUMN EVOLUTION under the hash gate (r12, VERDICT r11
    * #7): `ALTER TABLE … ADD COLUMNS (meta.score DOUBLE)` appends a
    * nullable field inside an existing STRUCT column as a metadata-only
    * commit — pre-evolution files simply lack the nested field and
    * read null there (the parquet by-name contract extended into
    * structs), and inserts through the evolved shape coexist. The
    * final aggregate groups over the struct's fields across BOTH file
    * shapes, plus a filtered phase through a nested-field predicate,
    * so hash equality pins the null-gap read, the evolved write, and
    * nested predicate evaluation over mixed files at once. */
  private val q166 = Q(
    "q166_nested_evolution",
    (s, dir) => {
      val cat = "g166_" + java.lang.Integer.toHexString(dir.hashCode)
      val root = scratch(s, dir, "nested-wh")
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", root)
      val o = t(s, dir, "orders").select(
        col("o_orderkey"), col("o_orderstatus"),
        struct(col("o_custkey").as("ck"),
          col("o_totalprice").cast("decimal(18,2)").as("price")).as("meta"))
      o.filter(col("o_orderkey") % 2 === 0)
        .writeTo(s"$cat.t").tableProperty("merge.log", "true").create() // v0
      s.sql(s"ALTER TABLE $cat.t ADD COLUMNS (meta.score DOUBLE)")      // v1
      t(s, dir, "orders").filter(col("o_orderkey") % 2 === 1)
        .select(col("o_orderkey"), col("o_orderstatus"),
          struct(col("o_custkey").as("ck"),
            col("o_totalprice").cast("decimal(18,2)").as("price"),
            ((col("o_orderkey") % 100).cast("double") / lit(4.0d))
              .as("score")).as("meta"))
        .createOrReplaceTempView("q166_src")
      s.sql(s"INSERT INTO $cat.t SELECT * FROM q166_src")               // v2
      def phase(df: DataFrame, name: String): DataFrame =
        df.groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"),
            sum(col("meta.price")).cast("double").as("price_sum"),
            sum(coalesce(col("meta.score"), lit(0d))).as("score_sum"),
            sum(when(col("meta.score").isNull, 1L).otherwise(0L))
              .as("null_scores"))
          .withColumn("phase", lit(name))
      phase(s.table(s"$cat.t"), "all")
        .unionByName(phase(
          s.table(s"$cat.t").filter(col("meta.score") > 20), "hi"))
        .orderBy(col("phase"), col("o_orderstatus"))
    },
    Some("""WITH evens AS (
        SELECT o_orderkey, o_orderstatus,
          CAST(o_totalprice AS DECIMAL(18,2)) AS price,
          CAST(NULL AS DOUBLE) AS score
        FROM orders WHERE o_orderkey % 2 = 0),
      odds AS (
        SELECT o_orderkey, o_orderstatus,
          CAST(o_totalprice AS DECIMAL(18,2)) AS price,
          CAST(o_orderkey % 100 AS DOUBLE) / 4.0 AS score
        FROM orders WHERE o_orderkey % 2 = 1),
      u AS (SELECT * FROM evens UNION ALL SELECT * FROM odds),
      ph_all AS (
        SELECT 'all' AS phase, o_orderstatus, COUNT(*) AS n,
          CAST(SUM(price) AS DOUBLE) AS price_sum,
          CAST(SUM(COALESCE(score, 0)) AS DOUBLE) AS score_sum,
          CAST(SUM(CASE WHEN score IS NULL THEN 1 ELSE 0 END) AS BIGINT)
            AS null_scores
        FROM u GROUP BY o_orderstatus),
      ph_hi AS (
        SELECT 'hi' AS phase, o_orderstatus, COUNT(*) AS n,
          CAST(SUM(price) AS DOUBLE) AS price_sum,
          CAST(SUM(COALESCE(score, 0)) AS DOUBLE) AS score_sum,
          CAST(0 AS BIGINT) AS null_scores
        FROM u WHERE score > 20 GROUP BY o_orderstatus)
      SELECT phase, o_orderstatus, n, price_sum, score_sum, null_scores
      FROM (SELECT * FROM ph_all UNION ALL SELECT * FROM ph_hi)
      ORDER BY phase, o_orderstatus"""))

  /** B2 SHALLOW CLONE under the hash gate (r12,
    * [[graft.sources.CommitLog.cloneTo]] via
    * `CALL graft.system.clone`): fork a logged catalog table WITHOUT
    * copying data — the clone's version-0 manifest references the
    * source's files by absolute path (stats/blooms/tags/mapping
    * carried). The composite then drives BOTH sides apart: an append
    * lands on the SOURCE after the fork (the clone must not see it),
    * SQL DELETE + UPDATE land on the CLONE (copy-on-write localizes
    * the touched files under the clone root; the source must not
    * move), and the clone's `VERSION AS OF 0` re-reads the fork point.
    * Hash equality over the three phase aggregates pins fork
    * correctness, bidirectional isolation, and clone time travel at
    * once — the zero-copy experiment-fork shape a 100 TB corpus table
    * needs (a full copy would be the size of the corpus; this is
    * O(files) manifest bytes). */
  private val q167 = Q(
    "q167_shallow_clone",
    (s, dir) => {
      val cat = "g167_" + java.lang.Integer.toHexString(dir.hashCode)
      val root = scratch(s, dir, "clone-wh")
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", root)
      val o = t(s, dir, "orders").select(
        col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice").cast("decimal(18,2)").as("price"))
      o.filter(col("o_orderkey") % 2 === 0)
        .writeTo(s"$cat.t").tableProperty("merge.log", "true").create() // src v0
      s.sql(s"CALL $cat.system.clone(`table` => 't', target => 'c')")   // fork
      o.filter(col("o_orderkey") % 2 === 1)
        .writeTo(s"$cat.t").append()                       // src v1 — post-fork
      s.sql(s"DELETE FROM $cat.c WHERE o_orderstatus = 'P'")            // c v1
      s.sql(s"""UPDATE $cat.c SET price = CAST(price * 2 AS DECIMAL(18,2))
        WHERE o_orderstatus = 'F' AND o_orderkey % 4 = 0""")            // c v2
      def phase(df: DataFrame, name: String): DataFrame =
        df.groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"),
            sum(col("price")).cast("double").as("price_sum"))
          .withColumn("phase", lit(name))
      phase(s.table(s"$cat.t"), "src")
        .unionByName(phase(s.table(s"$cat.c"), "clone"))
        .unionByName(phase(
          s.sql(s"SELECT * FROM $cat.c VERSION AS OF 0"), "fork"))
        .orderBy(col("phase"), col("o_orderstatus"))
    },
    Some("""WITH base AS (
        SELECT o_orderkey, o_orderstatus,
          CAST(o_totalprice AS DECIMAL(18,2)) AS price
        FROM orders),
      even AS (SELECT * FROM base WHERE o_orderkey % 2 = 0),
      cln AS (
        SELECT o_orderkey, o_orderstatus,
          CASE WHEN o_orderstatus = 'F' AND o_orderkey % 4 = 0
               THEN CAST(price * 2 AS DECIMAL(18,2)) ELSE price
          END AS price
        FROM even WHERE o_orderstatus <> 'P'),
      ph_src AS (
        SELECT 'src' AS phase, o_orderstatus, COUNT(*) AS n,
          CAST(SUM(price) AS DOUBLE) AS price_sum
        FROM base GROUP BY o_orderstatus),
      ph_clone AS (
        SELECT 'clone' AS phase, o_orderstatus, COUNT(*) AS n,
          CAST(SUM(price) AS DOUBLE) AS price_sum
        FROM cln GROUP BY o_orderstatus),
      ph_fork AS (
        SELECT 'fork' AS phase, o_orderstatus, COUNT(*) AS n,
          CAST(SUM(price) AS DOUBLE) AS price_sum
        FROM even GROUP BY o_orderstatus)
      SELECT phase, o_orderstatus, n, price_sum
      FROM (SELECT * FROM ph_src UNION ALL SELECT * FROM ph_clone
            UNION ALL SELECT * FROM ph_fork)
      ORDER BY phase, o_orderstatus"""))

  /** B2 DURABLE CHECK CONSTRAINTS under the hash gate (r12,
    * `constraint.*` table properties → [[graft.sources.CommitLog
    * .withConstraintProps]]): the property travels with the CATALOG
    * TABLE, so a violating write through any later handle must refuse
    * AND COMMIT NOTHING — this composite drives a violating INSERT and
    * a violating UPDATE into the table between valid writes, swallows
    * the (expected) refusals, and aggregates the final state. Hash
    * equality against a reconstruction built ONLY from the valid
    * writes pins refusal atomicity: a single leaked row or
    * half-applied update from a refused statement moves the hash. The
    * post-refusal valid write doubles as the liveness check (a refusal
    * must not wedge the table). */
  private val q168 = Q(
    "q168_check_constraints",
    (s, dir) => {
      val cat = "g168_" + java.lang.Integer.toHexString(dir.hashCode)
      val root = scratch(s, dir, "cons-wh")
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", root)
      val o = t(s, dir, "orders").select(
        col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice").cast("decimal(18,2)").as("price"))
      o.filter(col("o_orderkey") % 2 === 0)
        .writeTo(s"$cat.t").tableProperty("merge.log", "true")
        .tableProperty("constraint.price_pos", "price >= 0").create() // v0
      def refused(stmt: => Unit): Unit =
        try { stmt; throw new IllegalStateException(
          "q168: a constraint-violating statement was NOT refused")
        } catch {
          case e: Exception if e.getMessage != null
            && (e.getMessage.contains("price_pos")
              || Option(e.getCause).exists(c => c.getMessage != null
                && c.getMessage.contains("price_pos"))) => ()
        }
      // violating INSERT (negated prices) — must land zero rows
      refused {
        o.filter(col("o_orderkey") % 2 === 1)
          .withColumn("price", negate(col("price")))
          .createOrReplaceTempView("q168_bad")
        s.sql(s"INSERT INTO $cat.t SELECT * FROM q168_bad"): Unit
      }
      // valid append through a FRESH handle (constraint re-attached
      // from the persisted property, not instance state)
      o.filter(col("o_orderkey") % 4 === 1)
        .writeTo(s"$cat.t").append()
      // violating UPDATE (the staged row-level path) — must change nothing
      refused {
        s.sql(s"UPDATE $cat.t SET price = CAST(-1 AS DECIMAL(18,2)) " +
          "WHERE o_orderstatus = 'F'"): Unit
      }
      // valid UPDATE lands after the refusal (liveness)
      s.sql(s"""UPDATE $cat.t SET price = CAST(price * 2 AS DECIMAL(18,2))
        WHERE o_orderstatus = 'P' AND o_orderkey % 4 = 2""")
      s.table(s"$cat.t").groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("price")).cast("double").as("price_sum"),
          sum(when(col("price") < 0, 1L).otherwise(0L)).as("neg_rows"))
        .orderBy(col("o_orderstatus"))
    },
    Some("""WITH base AS (
        SELECT o_orderkey, o_orderstatus,
          CAST(o_totalprice AS DECIMAL(18,2)) AS price
        FROM orders WHERE o_orderkey % 2 = 0 OR o_orderkey % 4 = 1),
      upd AS (
        SELECT o_orderkey, o_orderstatus,
          CASE WHEN o_orderstatus = 'P' AND o_orderkey % 4 = 2
               THEN CAST(price * 2 AS DECIMAL(18,2)) ELSE price
          END AS price
        FROM base)
      SELECT o_orderstatus, COUNT(*) AS n,
        CAST(SUM(price) AS DOUBLE) AS price_sum,
        CAST(SUM(CASE WHEN price < 0 THEN 1 ELSE 0 END) AS BIGINT)
          AS neg_rows
      FROM upd GROUP BY o_orderstatus
      ORDER BY o_orderstatus"""))

  /** B2/B5 STORAGE-PARTITIONED JOIN (r12, [[graft.sources
    * .GraftLogScanBuilder]] `spjWrap`): two commit-log tables
    * partition-tagged on the same column are joined ON that column with
    * `spark.graft.spj.preserveDataGrouping=true` — the scans report
    * `KeyGroupedPartitioning` from manifest metadata and Spark plans
    * the join AND the downstream aggregation with ZERO Exchange nodes
    * (the 100 TB fact⋈fact shape: co-partitioned tables never shuffle
    * on their partition key). The query REQUIRES the exchange-free plan
    * in-body (a silent fall-back to the shuffling plan turns this
    * red), then hands the result to the ordinary gate — decimal sums
    * keep the aggregation exact in both task layouts, so the hash pins
    * value correctness independently of the plan shape. */
  private val q169 = Q(
    "q169_storage_partitioned_join",
    (s, dir) => {
      val cat = "g169_" + java.lang.Integer.toHexString(dir.hashCode)
      val root = scratch(s, dir, "spj-wh")
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", root)
      val li = t(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_returnflag"),
        col("l_quantity").cast("decimal(12,2)").as("qty"),
        col("l_extendedprice").cast("decimal(18,2)").as("price"))
      li.writeTo(s"$cat.fact").tableProperty("merge.log", "true")
        .tableProperty("merge.partcol", "l_returnflag").create()
      li.groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_orderkey")).as("n_orders"))
        .writeTo(s"$cat.dim").tableProperty("merge.log", "true")
        .tableProperty("merge.partcol", "l_returnflag").create()
      val prevBcast = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
      s.conf.set("spark.graft.spj.preserveDataGrouping", "true")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val gold = s.table(s"$cat.fact")
          .join(s.table(s"$cat.dim"), "l_returnflag")
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n_li"),
            sum(col("price")).as("sum_price"),
            max(col("n_orders")).as("n_orders"))
        val rows = gold.collect() // evaluate UNDER the SPJ flags
        val plan = gold.queryExecution.executedPlan.toString
        require(plan.contains("graft-spj"),
          s"q169: the scans did not report SPJ partitioning:\n$plan")
        val nExchange = plan.linesIterator.count(_.contains("Exchange"))
        require(nExchange == 0,
          s"q169: co-partitioned join planned $nExchange Exchange node(s):\n$plan")
        s.createDataFrame(java.util.Arrays.asList(rows: _*), gold.schema)
          .withColumn("sum_price", col("sum_price").cast("double"))
          .orderBy(col("l_returnflag"))
      } finally {
        s.conf.set("spark.graft.spj.preserveDataGrouping", "false")
        s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBcast)
      }
    },
    Some("""WITH fact AS (
        SELECT l_returnflag, CAST(l_quantity AS DECIMAL(12,2)) AS qty,
          CAST(l_extendedprice AS DECIMAL(18,2)) AS price, l_orderkey
        FROM lineitem),
      dim AS (
        SELECT l_returnflag, COUNT(DISTINCT l_orderkey) AS n_orders
        FROM fact GROUP BY l_returnflag)
      SELECT f.l_returnflag, COUNT(*) AS n_li,
        CAST(SUM(f.price) AS DOUBLE) AS sum_price,
        MAX(d.n_orders) AS n_orders
      FROM fact f JOIN dim d ON f.l_returnflag = d.l_returnflag
      GROUP BY f.l_returnflag
      ORDER BY f.l_returnflag"""))

  /** B2 RUNTIME FILE PRUNING (r13, [[graft.sources.GraftLogScanBuilder
    * .GraftScan]]'s `SupportsRuntimeV2Filtering` side): the
    * fact⋈filtered-dim shape where the pruning predicate exists in NO
    * query text — the dim filter is on a column the fact table does
    * not have (`flag_class`), so static pushdown and constraint
    * inference cannot touch the fact scan, and only Spark's
    * dynamic-partition-pruning planner (fed by the executed dim side's
    * join-key values) can skip fact files. The manifest partition tags
    * judge the arriving IN-set at file granularity — the reference's
    * DynamoDB key seek (`/root/reference/index.js:305-314`) replayed
    * as execution-time file skipping. The query REQUIRES
    * `graftRtFilesPruned > 0` in-body (a silent fall-back to the
    * full-scan plan turns this red) and hash-pins the values: decimal
    * sums keep the aggregation exact whichever files are read, so the
    * oracle catches a FALSE drop (a pruned file that held matching
    * rows) as a value mismatch. */
  private val q170 = Q(
    "q170_runtime_file_pruning",
    (s, dir) => {
      val cat = "g170_" + java.lang.Integer.toHexString(dir.hashCode)
      val root = scratch(s, dir, "rt-wh")
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", root)
      val li = t(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_returnflag"),
        col("l_extendedprice").cast("decimal(18,2)").as("price"))
      // two commits → two files per flag tag: pruning is file-granular
      li.filter(col("l_orderkey") % 2 === 0)
        .writeTo(s"$cat.fact").tableProperty("merge.log", "true")
        .tableProperty("merge.partcol", "l_returnflag").create()
      li.filter(col("l_orderkey") % 2 === 1)
        .writeTo(s"$cat.fact").append()
      // dim carries flag_class, a column the fact table lacks — the
      // selective predicate below is NOT inferable onto the fact side
      t(s, dir, "lineitem").groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_orderkey")).as("n_orders"))
        .withColumn("flag_class",
          when(col("l_returnflag") === "R", "returned").otherwise("kept"))
        .writeTo(s"$cat.dim").tableProperty("merge.log", "true").create()
      val gold = s.table(s"$cat.fact")
        .join(broadcast(s.table(s"$cat.dim")
          .filter(col("flag_class") === "returned")), "l_returnflag")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_li"), sum(col("price")).as("sum_price"),
          max(col("n_orders")).as("n_orders"))
      val rows = gold.collect() // evaluate — DPP fires at execution
      def nodes(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          nodes(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          q +: nodes(q.plan)
        case other => other +: other.children.flatMap(nodes)
      }
      val prunedFiles = nodes(gold.queryExecution.executedPlan).collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.metrics.get("graftRtFilesPruned").map(_.value).getOrElse(0L)
      }.sum
      require(prunedFiles > 0,
        s"q170: runtime filtering pruned no data files:\n" +
          gold.queryExecution.executedPlan)
      s.createDataFrame(java.util.Arrays.asList(rows: _*), gold.schema)
        .withColumn("sum_price", col("sum_price").cast("double"))
        .orderBy(col("l_returnflag"))
    },
    Some("""WITH fact AS (
        SELECT l_orderkey, l_returnflag,
          CAST(l_extendedprice AS DECIMAL(18,2)) AS price
        FROM lineitem),
      dim AS (
        SELECT l_returnflag, COUNT(DISTINCT l_orderkey) AS n_orders,
          CASE WHEN l_returnflag = 'R' THEN 'returned' ELSE 'kept' END
            AS flag_class
        FROM lineitem GROUP BY l_returnflag)
      SELECT f.l_returnflag, COUNT(*) AS n_li,
        CAST(SUM(f.price) AS DOUBLE) AS sum_price,
        MAX(d.n_orders) AS n_orders
      FROM fact f JOIN dim d ON f.l_returnflag = d.l_returnflag
      WHERE d.flag_class = 'returned'
      GROUP BY f.l_returnflag
      ORDER BY f.l_returnflag"""))

  /** B2/B5 COMPOSITE storage-partitioned join (r13, [[graft.sources
    * .PartSpec]]): both tables manifest-partitioned on the SAME
    * two-column key `(l_returnflag, l_linestatus)` — the "(tenant,
    * day)" co-location shape at 100 TB, where one identity column is
    * too coarse to balance and the full pair is the unit a write
    * retires and a join co-locates. The scan reports a two-expression
    * `KeyGroupedPartitioning`, so the join AND the aggregation on the
    * same pair plan with ZERO Exchange (required in-body). Tags encode
    * both values in one manifest string ([[graft.sources.PartSpec
    * .tagExpr]] — '/'-joined, URL-escaped); the reference analog is a
    * DynamoDB composite partition+sort key
    * (`/root/reference/index.js:305-314`). */
  private val q171 = Q(
    "q171_composite_spj",
    (s, dir) => {
      val cat = "g171_" + java.lang.Integer.toHexString(dir.hashCode)
      val root = scratch(s, dir, "cspj-wh")
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", root)
      val li = t(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_returnflag"), col("l_linestatus"),
        col("l_extendedprice").cast("decimal(18,2)").as("price"))
      li.writeTo(s"$cat.fact").tableProperty("merge.log", "true")
        .tableProperty("merge.partcol", "l_returnflag,l_linestatus").create()
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(countDistinct(col("l_orderkey")).as("n_orders"))
        .writeTo(s"$cat.dim").tableProperty("merge.log", "true")
        .tableProperty("merge.partcol", "l_returnflag,l_linestatus").create()
      val prevBcast = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
      s.conf.set("spark.graft.spj.preserveDataGrouping", "true")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val gold = s.table(s"$cat.fact")
          .join(s.table(s"$cat.dim"), Seq("l_returnflag", "l_linestatus"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n_li"),
            sum(col("price")).as("sum_price"),
            max(col("n_orders")).as("n_orders"))
        val rows = gold.collect()
        val plan = gold.queryExecution.executedPlan.toString
        require(plan.contains("graft-spj(key=l_returnflag,l_linestatus)"),
          s"q171: the scans did not report composite SPJ partitioning:\n$plan")
        val nExchange = plan.linesIterator.count(_.contains("Exchange"))
        require(nExchange == 0,
          s"q171: co-partitioned join planned $nExchange Exchange node(s):\n$plan")
        s.createDataFrame(java.util.Arrays.asList(rows: _*), gold.schema)
          .withColumn("sum_price", col("sum_price").cast("double"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      } finally {
        s.conf.set("spark.graft.spj.preserveDataGrouping", "false")
        s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBcast)
      }
    },
    Some("""WITH fact AS (
        SELECT l_orderkey, l_returnflag, l_linestatus,
          CAST(l_extendedprice AS DECIMAL(18,2)) AS price
        FROM lineitem),
      dim AS (
        SELECT l_returnflag, l_linestatus,
          COUNT(DISTINCT l_orderkey) AS n_orders
        FROM fact GROUP BY l_returnflag, l_linestatus)
      SELECT f.l_returnflag, f.l_linestatus, COUNT(*) AS n_li,
        CAST(SUM(f.price) AS DOUBLE) AS sum_price,
        MAX(d.n_orders) AS n_orders
      FROM fact f JOIN dim d
        ON f.l_returnflag = d.l_returnflag
        AND f.l_linestatus = d.l_linestatus
      GROUP BY f.l_returnflag, f.l_linestatus
      ORDER BY f.l_returnflag, f.l_linestatus"""))

  /** B2/B5 TRANSFORM storage-partitioned join (r13): both tables
    * partitioned by `days(day_ts)` — the manifest tag is the UTC
    * epoch-day, and the scan reports `KeyGroupedPartitioning(
    * days(day_ts))`, resolvable because [[graft.sources.GraftCatalog]]
    * is a `FunctionCatalog` carrying the bound `days` function
    * ([[graft.sources.GraftFunctions]]); without it Spark silently
    * drops the grouping and shuffles. The time-bucketed layout is the
    * 100 TB default (a day of events is the natural retire/co-locate
    * unit); zero Exchange is required in-body. */
  private val q172 = Q(
    "q172_days_transform_spj",
    (s, dir) => {
      val cat = "g172_" + java.lang.Integer.toHexString(dir.hashCode)
      val root = scratch(s, dir, "dspj-wh")
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", root)
      val ev = t(s, dir, "events")
        .withColumn("day_ts", date_trunc("DAY", col("ts")))
        .select(col("day_ts"), col("user_id"), col("value"))
      ev.writeTo(s"$cat.fact").tableProperty("merge.log", "true")
        .tableProperty("merge.partcol", "days(day_ts)").create()
      ev.groupBy(col("day_ts"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .writeTo(s"$cat.dim").tableProperty("merge.log", "true")
        .tableProperty("merge.partcol", "days(day_ts)").create()
      val prevBcast = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
      s.conf.set("spark.graft.spj.preserveDataGrouping", "true")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val gold = s.table(s"$cat.fact")
          .join(s.table(s"$cat.dim"), "day_ts")
          .groupBy(col("day_ts"))
          .agg(count(lit(1)).as("n_ev"),
            sum(col("value").cast("decimal(18,6)")).as("sum_value"),
            max(col("n_users")).as("n_users"))
        val rows = gold.collect()
        val plan = gold.queryExecution.executedPlan.toString
        require(plan.contains("graft-spj(key=days(day_ts))"),
          s"q172: the scans did not report days-transform SPJ:\n$plan")
        val nExchange = plan.linesIterator.count(_.contains("Exchange"))
        require(nExchange == 0,
          s"q172: day-partitioned join planned $nExchange Exchange node(s):\n$plan")
        s.createDataFrame(java.util.Arrays.asList(rows: _*), gold.schema)
          .withColumn("day", to_date(col("day_ts"))).drop("day_ts")
          .withColumn("sum_value", col("sum_value").cast("double"))
          .orderBy(col("day"))
      } finally {
        s.conf.set("spark.graft.spj.preserveDataGrouping", "false")
        s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBcast)
      }
    },
    Some("""WITH ev AS (
        SELECT date_trunc('day', ts) AS day_ts, user_id, value
        FROM events),
      dim AS (
        SELECT day_ts, COUNT(DISTINCT user_id) AS n_users
        FROM ev GROUP BY day_ts)
      SELECT CAST(f.day_ts AS DATE) AS day, COUNT(*) AS n_ev,
        CAST(SUM(CAST(f.value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
        MAX(d.n_users) AS n_users
      FROM ev f JOIN dim d ON f.day_ts = d.day_ts
      GROUP BY f.day_ts
      ORDER BY day"""))

  /** B2 MERGE-ON-READ DELETION VECTORS (r13, [[graft.sources.CommitLog]]
    * `add_dv` / [[graft.sources.GraftLogScanBuilder.DvReaderFactory]]):
    * a small-predicate SQL DELETE masks row positions behind a parquet
    * sidecar instead of rewriting data files — the fix for rewrite
    * amplification under frequent small DML at 100 TB (a 3-row delete
    * must not rewrite a multi-GB file; the reference's DynamoDB delete
    * is row-granular by nature, `/root/reference/index.js:249`). The
    * query REQUIRES in-body that the delete commits ZERO data-file
    * changes (same file list, a DV present, version bumped) and that
    * the masked scan reports `graft-dv` — then hash-pins an aggregate
    * over the masked table, so a mask that drops the wrong positions
    * (or none) is a value mismatch against the oracle. */
  private val q173 = Q(
    "q173_deletion_vectors",
    (s, dir) => {
      val cat = "g173_" + java.lang.Integer.toHexString(dir.hashCode)
      val root = scratch(s, dir, "dv-wh")
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", root)
      t(s, dir, "lineitem").select(
          col("l_orderkey"), col("l_returnflag"),
          col("l_extendedprice").cast("decimal(18,2)").as("price"))
        .repartition(4)
        .writeTo(s"$cat.t").tableProperty("merge.log", "true").create()
      val log = graft.sources.CommitLog(s, s"$root/t")
      val before = log.snapshot()
      // lift the scale-aware admission floor (256 MB of touched files
      // by default — test tables are MBs): this query gates the DV
      // MACHINERY; the floor itself is exercised by DvSpec/BenchOne
      s.conf.set("spark.graft.dv.minTouchedBytes", "0")
      s.sql(s"DELETE FROM $cat.t WHERE l_orderkey >= 100 AND l_orderkey <= 140")
      val after = log.snapshot()
      require(after.version > before.version,
        "q173: the delete committed no version")
      require(after.files == before.files,
        s"q173: merge-on-read delete rewrote data files " +
          s"(${(after.files.toSet -- before.files.toSet).size} new)")
      require(after.dvs.nonEmpty, "q173: no deletion vector was committed")
      // merge-on-read UPDATE: mask + append in ONE commit, no rewrite
      log.update(col("l_orderkey") >= 200 && col("l_orderkey") <= 220,
        Map("price" -> (col("price") * lit(2))))
      val after2 = log.snapshot()
      require(after2.version == after.version + 1
          && after.files.forall(after2.files.contains)
          && after2.files.size > after.files.size,
        "q173: MoR update must adopt new files atomically, rewriting none")
      val gold = s.table(s"$cat.t")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_li"), sum(col("price")).as("sum_price"),
          countDistinct(col("l_orderkey")).as("n_orders"))
      val rows =
        try gold.collect()
        finally s.conf.unset("spark.graft.dv.minTouchedBytes")
      val plan = gold.queryExecution.executedPlan.toString
      require(plan.contains("graft-dv("),
        s"q173: the scan did not report the DV mask:\n$plan")
      s.createDataFrame(java.util.Arrays.asList(rows: _*), gold.schema)
        .withColumn("sum_price", col("sum_price").cast("double"))
        .orderBy(col("l_returnflag"))
    },
    Some("""SELECT l_returnflag, COUNT(*) AS n_li,
        CAST(SUM(CASE WHEN l_orderkey >= 200 AND l_orderkey <= 220
          THEN CAST(l_extendedprice AS DECIMAL(18,2)) * 2
          ELSE CAST(l_extendedprice AS DECIMAL(18,2)) END) AS DOUBLE)
          AS sum_price,
        COUNT(DISTINCT l_orderkey) AS n_orders
      FROM lineitem
      WHERE NOT (l_orderkey >= 100 AND l_orderkey <= 140)
      GROUP BY l_returnflag
      ORDER BY l_returnflag"""))

  /** B2 DEEP STRUCT EVOLUTION (r13, [[graft.sources.CommitLog]]
    * nested RENAME/DROP): struct-INTERIOR fields rename and drop as
    * metadata-only commits — the [[CommitLog.PhysKey]] stable-name
    * mapping extends to any depth, so zero data files are touched
    * (required in-body), old and post-rename files mix under one
    * logical view, and a dropped interior field's re-added namesake
    * reads NULL (fresh suffixed physical name — no resurrection,
    * also required in-body). The oracle reconstructs the final
    * logical values from raw lineitem, so a mapping slip (wrong
    * interior column resolved, resurrection, lost post-rename
    * writes) is a value mismatch. */
  private val q174 = Q(
    "q174_nested_rename_drop",
    (s, dir) => {
      val cat = "g174_" + java.lang.Integer.toHexString(dir.hashCode)
      val root = scratch(s, dir, "nest-wh")
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", root)
      val li = t(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_returnflag"),
        struct(col("l_quantity").cast("decimal(12,2)").as("qty"),
          col("l_extendedprice").cast("decimal(18,2)").as("price")).as("m"))
      li.filter(col("l_orderkey") % 2 === 0)
        .writeTo(s"$cat.t").tableProperty("merge.log", "true").create()
      val log = graft.sources.CommitLog(s, s"$root/t")
      val files0 = log.snapshot().files.toSet
      s.sql(s"ALTER TABLE $cat.t RENAME COLUMN m.qty TO quantity")
      require(log.snapshot().files.toSet == files0,
        "q174: nested rename touched data files")
      // post-rename writes land under the STABLE physical name
      li.filter(col("l_orderkey") % 2 === 1)
        .withColumn("m", struct(col("m.qty").as("quantity"),
          col("m.price").as("price")))
        .writeTo(s"$cat.t").append()
      // drop the interior price, then re-add the namesake: NULL, not
      // the dropped bytes
      s.sql(s"ALTER TABLE $cat.t DROP COLUMN m.price")
      s.sql(s"ALTER TABLE $cat.t ADD COLUMNS (m.price DECIMAL(18,2))")
      val gold = s.table(s"$cat.t")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_li"),
          sum(col("m.quantity")).as("sum_qty"),
          count(col("m.price")).as("n_price"))
      val rows = gold.collect()
      require(rows.forall(_.getLong(3) == 0L),
        "q174: a re-added nested namesake resurrected dropped bytes")
      s.createDataFrame(java.util.Arrays.asList(rows: _*), gold.schema)
        .withColumn("sum_qty", col("sum_qty").cast("double"))
        .orderBy(col("l_returnflag"))
    },
    Some("""SELECT l_returnflag, COUNT(*) AS n_li,
        CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        CAST(0 AS BIGINT) AS n_price
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag"""))

  /** B2 MANIFEST-ANSWERED AGGREGATE PUSHDOWN (r14,
    * [[graft.sources.GraftLogScanBuilder]] `SupportsPushDownAggregates`):
    * a global COUNT(*)/MIN/MAX over a logged table folds from the
    * manifest's per-file exact row counts (`Snapshot.rows`, r14) and
    * footer min/max (`Snapshot.stats`) into a one-row LocalScan — at
    * 100 TB the query opens ZERO data files (the manifest plays the
    * reference's DynamoDB item metadata, `/root/reference/index.js:305-314`).
    * REQUIRED in-body: the plan is a LocalTableScan with no BatchScan
    * (both before and, for COUNT(*), after a merge-on-read DELETE —
    * the DV-adjusted count must stay exact), and the post-DV MIN must
    * NOT be manifest-answered (the mask could hide the extremal row).
    * All values hash against DuckDB computing the same aggregates from
    * raw lineitem. */
  private val q175 = Q(
    "q175_agg_pushdown",
    (s, dir) => {
      val cat = "g175_" + java.lang.Integer.toHexString(dir.hashCode)
      val root = scratch(s, dir, "aggpd-wh")
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", root)
      val li = t(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_returnflag"),
        col("l_extendedprice").as("price"),
        col("l_shipdate").cast("date").as("sd"),
        when(col("l_orderkey") % 7 === 0, lit(null))
          .otherwise(col("l_extendedprice")).as("p7"))
      li.filter(col("l_orderkey") % 3 === 0)
        .writeTo(s"$cat.t").tableProperty("merge.log", "true").create()
      li.filter(col("l_orderkey") % 3 === 1).writeTo(s"$cat.t").append()
      li.filter(col("l_orderkey") % 3 === 2).writeTo(s"$cat.t").append()
      def requireLocal(df: DataFrame, what: String): Unit = {
        val p = df.queryExecution.executedPlan.toString
        require(p.contains("LocalTableScan") && !p.contains("BatchScan"),
          s"q175: $what must be manifest-answered (LocalTableScan):\n$p")
      }
      val agg = s.table(s"$cat.t").agg(
        count(lit(1)).as("cnt"), count(col("p7")).as("c_p7"),
        min(col("l_orderkey")).as("mn_ok"), max(col("l_orderkey")).as("mx_ok"),
        min(col("price")).as("mn_p"), max(col("price")).as("mx_p"),
        min(col("l_returnflag")).as("mn_f"), max(col("l_returnflag")).as("mx_f"),
        min(col("sd")).as("mn_d"), max(col("sd")).as("mx_d"))
      requireLocal(agg, "the 10-way global aggregate (incl. COUNT(col))")
      val aggRow = agg.collect()
      // merge-on-read DELETE: COUNT(*) stays manifest-exact (row counts
      // minus DV cardinalities); MIN must fall back to a real scan
      s.conf.set("spark.graft.dv.minTouchedBytes", "0")
      val (cntRow, mnDf) =
        try {
          s.sql(s"DELETE FROM $cat.t WHERE l_orderkey >= 100 AND l_orderkey <= 140")
          require(graft.sources.CommitLog(s, s"$root/t").snapshot().dvs.nonEmpty,
            "q175: the small delete was not merge-on-read")
          val c = s.table(s"$cat.t").agg(count(lit(1)).as("cnt_dv"))
          requireLocal(c, "the post-DV COUNT(*)")
          val m = s.table(s"$cat.t").agg(min(col("l_orderkey")).as("mn_ok_dv"))
          val mp = m.queryExecution.executedPlan.toString
          require(mp.contains("BatchScan"),
            s"q175: post-DV MIN must NOT answer from pre-mask stats:\n$mp")
          (c.collect(), m.collect())
        } finally s.conf.unset("spark.graft.dv.minTouchedBytes")
      val out = s.createDataFrame(java.util.Arrays.asList(aggRow: _*), agg.schema)
        .crossJoin(s.createDataFrame(
          java.util.Arrays.asList(cntRow: _*),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("cnt_dv",
              org.apache.spark.sql.types.LongType, nullable = false)))))
        .crossJoin(s.createDataFrame(java.util.Arrays.asList(mnDf: _*),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("mn_ok_dv",
              org.apache.spark.sql.types.LongType)))))
      out.withColumn("sd_mn", col("mn_d").cast("string"))
        .withColumn("sd_mx", col("mx_d").cast("string"))
        .drop("mn_d", "mx_d")
    },
    Some("""SELECT COUNT(*) AS cnt,
        COUNT(CASE WHEN l_orderkey % 7 = 0 THEN NULL ELSE l_extendedprice END)
          AS c_p7,
        MIN(l_orderkey) AS mn_ok, MAX(l_orderkey) AS mx_ok,
        CAST(MIN(l_extendedprice) AS DOUBLE) AS mn_p,
        CAST(MAX(l_extendedprice) AS DOUBLE) AS mx_p,
        MIN(l_returnflag) AS mn_f, MAX(l_returnflag) AS mx_f,
        CAST(MIN(CAST(l_shipdate AS DATE)) AS VARCHAR) AS sd_mn,
        CAST(MAX(CAST(l_shipdate AS DATE)) AS VARCHAR) AS sd_mx,
        (SELECT COUNT(*) FROM lineitem
          WHERE NOT (l_orderkey >= 100 AND l_orderkey <= 140)) AS cnt_dv,
        (SELECT MIN(l_orderkey) FROM lineitem
          WHERE NOT (l_orderkey >= 100 AND l_orderkey <= 140)) AS mn_ok_dv
      FROM lineitem"""))

  /** B2 MANIFEST-BOUNDED LIMIT PUSHDOWN (r14,
    * [[graft.sources.GraftLogScanBuilder]] `SupportsPushDownLimit`):
    * an un-filtered LIMIT n scans only a file-list PREFIX whose
    * manifest row counts provably cover n — `LIMIT 10` on a 100k-file
    * table plans a one-file scan. Four equal single-file commits, a
    * limit of 1.5 commits' rows: REQUIRED in-body that the scan reads
    * EXACTLY the 2-file covering prefix (and the full set once the
    * pushdown is opted out). The returned count hashes against the
    * oracle's arithmetic over raw lineitem. */
  private val q176 = Q(
    "q176_limit_pushdown",
    (s, dir) => {
      val cat = "g176_" + java.lang.Integer.toHexString(dir.hashCode)
      val root = scratch(s, dir, "limpd-wh")
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", root)
      val li = t(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      val quarter = (i: Long) =>
        li.filter(col("l_orderkey") % 4 === i).coalesce(1)
      quarter(0).writeTo(s"$cat.t").tableProperty("merge.log", "true").create()
      (1L to 3L).foreach(i => quarter(i).writeTo(s"$cat.t").append())
      def scanned(df: DataFrame): Int =
        df.queryExecution.optimizedPlan.collect {
          case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
            graft.sources.GraftScans.unwrapFileScan(r.scan)
              .fileIndex.inputFiles.length
        }.sum
      // k lands strictly inside the second file's coverage: one file
      // cannot satisfy it, two provably do — the manifest's own
      // per-file counts (commit order) give the exact bound
      val log = graft.sources.CommitLog(s, s"$root/t")
      val snap = log.snapshot()
      val fileRows = snap.files.map(f => snap.rows(f))
      val k = fileRows(0) + fileRows(1) / 2
      val lim = s.table(s"$cat.t").limit(k.toInt)
      val limCnt = lim.count()
      require(scanned(lim) == 2,
        s"q176: LIMIT $k over files of ${fileRows.mkString(",")} rows " +
          s"must scan the 2-file covering prefix, scanned ${scanned(lim)}")
      s.conf.set("spark.graft.limitPushdown.enabled", "false")
      val fullScan =
        try scanned(s.table(s"$cat.t").limit(k.toInt))
        finally s.conf.unset("spark.graft.limitPushdown.enabled")
      require(fullScan == 4,
        s"q176: the opt-out must restore the 4-file scan, got $fullScan")
      import s.implicits._
      Seq((limCnt, 2, 4)).toDF("lim_cnt", "files_scanned", "files_total")
    },
    Some("""SELECT CAST(
        (SELECT COUNT(*) FROM lineitem WHERE l_orderkey % 4 = 0)
        + (SELECT COUNT(*) FROM lineitem WHERE l_orderkey % 4 = 1) // 2
        AS BIGINT) AS lim_cnt,
        2 AS files_scanned, 4 AS files_total"""))

  /** B2 MERGE-ON-READ MERGE (r14, [[graft.sources.CommitLog.merge]] /
    * `tryDvMerge`): the full ANSI MERGE trio (conditional DELETE,
    * UPDATE, INSERT) commits as ONE `add_dv` — fired matched rows
    * masked behind a deletion vector, updated versions + inserts
    * appended, ZERO touched-file rewrite (Delta's DV merge shape; at
    * 100 TB a 500-row merge must not rewrite multi-GB files). REQUIRED
    * in-body: one version, no data-file retirement, new files adopted,
    * a DV present. The post-merge aggregate hashes against DuckDB
    * reconstructing the same merge relationally from raw orders, so a
    * mask hitting the wrong positions (or a declined clause masking
    * anyway) is a value mismatch. */
  private val q177 = Q(
    "q177_mor_merge",
    (s, dir) => {
      val root = scratch(s, dir, "mormerge")
      val log = graft.sources.CommitLog(s, s"$root/t")
      val o = t(s, dir, "orders")
      log.append(o.filter(col("o_orderkey") % 3 =!= 0).select(
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice").cast("decimal(18,2)").as("price")))
      val src = o.filter(col("o_orderkey") % 20 === 0).select(
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        (col("o_totalprice").cast("decimal(18,2)") * 3)
          .cast("decimal(18,2)").as("price"))
      val before = log.snapshot()
      s.conf.set("spark.graft.dv.minTouchedBytes", "0")
      try log.merge(src, Seq("o_orderkey"), Seq(
          graft.sources.CommitLog.WhenMatchedDelete(
            Some(col("s.price") > 400000)),
          graft.sources.CommitLog.WhenMatchedUpdate(
            Map("price" -> col("s.price"))),
          graft.sources.CommitLog.WhenNotMatchedInsert()))
      finally s.conf.unset("spark.graft.dv.minTouchedBytes")
      val after = log.snapshot()
      require(after.version == before.version + 1,
        "q177: the merge must be ONE atomic commit")
      require(before.files.forall(after.files.contains),
        "q177: merge-on-read MERGE must retire no data file")
      require(after.files.size > before.files.size,
        "q177: updated + inserted rows must land as appended files")
      require(after.dvs.nonEmpty, "q177: no deletion vector was committed")
      log.read().groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("price")).cast("double").as("revenue"),
          sum(col("o_orderkey")).as("key_sum"))
        .orderBy(col("o_orderstatus"))
    },
    Some("""WITH tgt AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
          CAST(o_totalprice AS DECIMAL(18,2)) AS price
        FROM orders WHERE o_orderkey % 3 <> 0),
      src AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
          CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 3 AS DECIMAL(18,2)) AS price
        FROM orders WHERE o_orderkey % 20 = 0),
      merged AS (
        SELECT t.o_orderkey, t.o_custkey, t.o_orderstatus,
          CASE WHEN s.o_orderkey IS NOT NULL THEN s.price ELSE t.price END AS price
        FROM tgt t LEFT JOIN src s ON t.o_orderkey = s.o_orderkey
        WHERE s.o_orderkey IS NULL OR s.price <= 400000
        UNION ALL
        SELECT s.o_orderkey, s.o_custkey, s.o_orderstatus, s.price
        FROM src s LEFT JOIN tgt t ON s.o_orderkey = t.o_orderkey
        WHERE t.o_orderkey IS NULL)
      SELECT o_orderstatus, COUNT(*) AS n,
        CAST(SUM(price) AS DOUBLE) AS revenue,
        CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
      FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  /** B2 GROUPED MANIFEST AGGREGATE PUSHDOWN (r14): `SELECT part,
    * COUNT(*)/MIN/MAX … GROUP BY part` over a partition-tagged logged
    * table folds per-tag from the manifest (tags + row counts + footer
    * stats) into a rows-per-partition LocalScan — the Iceberg-style
    * "metadata aggregation" that answers partition profiles on a
    * 100 TB table without opening a file. REQUIRED in-body: the
    * grouped plan is a LocalTableScan with no BatchScan, and after a
    * merge-on-read DELETE masks one ENTIRE partition its group
    * disappears from a still-manifest-answered COUNT (SQL group
    * semantics under DV masking). Values hash against DuckDB grouping
    * raw orders. */
  private val q178 = Q(
    "q178_grouped_agg_pushdown",
    (s, dir) => {
      val cat = "g178_" + java.lang.Integer.toHexString(dir.hashCode)
      val root = scratch(s, dir, "gagg-wh")
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", root)
      t(s, dir, "orders").select(
          col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice").cast("double").as("price"))
        .writeTo(s"$cat.t").tableProperty("merge.log", "true")
        .tableProperty("merge.partcol", "o_orderstatus").create()
      def requireLocal(df: DataFrame, what: String): Unit = {
        val p = df.queryExecution.executedPlan.toString
        require(p.contains("LocalTableScan") && !p.contains("BatchScan"),
          s"q178: $what must be manifest-answered:\n$p")
      }
      val byStatus = s.table(s"$cat.t").groupBy(col("o_orderstatus")).agg(
        count(lit(1)).as("n"),
        min(col("o_orderkey")).as("mn_ok"), max(col("o_orderkey")).as("mx_ok"),
        min(col("price")).as("mn_p"), max(col("price")).as("mx_p"))
      requireLocal(byStatus, "the per-partition profile")
      val profile = byStatus.collect()
      // mask one whole partition merge-on-read: its group must vanish
      // from a STILL manifest-answered grouped count
      s.conf.set("spark.graft.dv.minTouchedBytes", "0")
      s.conf.set("spark.graft.dv.maxRatio", "1.0")
      val counts =
        try {
          s.sql(s"DELETE FROM $cat.t WHERE o_orderstatus = 'P'")
          require(graft.sources.CommitLog(s, s"$root/t").snapshot().dvs.nonEmpty,
            "q178: the partition delete was not merge-on-read")
          val c = s.table(s"$cat.t").groupBy(col("o_orderstatus"))
            .agg(count(lit(1)).as("n_after"))
          requireLocal(c, "the post-mask grouped count")
          c.collect()
        } finally {
          s.conf.unset("spark.graft.dv.minTouchedBytes")
          s.conf.unset("spark.graft.dv.maxRatio")
        }
      require(!counts.exists(_.getString(0) == "P"),
        "q178: a fully-masked partition's group must disappear")
      val profDf = s.createDataFrame(
        java.util.Arrays.asList(profile: _*), byStatus.schema)
      import s.implicits._
      val afterDf = counts.map(r => (r.getString(0), r.getLong(1))).toSeq
        .toDF("o_orderstatus", "n_after")
      profDf.join(afterDf, Seq("o_orderstatus"), "left")
        .withColumn("n_after", coalesce(col("n_after"), lit(0L)))
        .orderBy(col("o_orderstatus"))
    },
    Some("""SELECT o_orderstatus, COUNT(*) AS n,
        MIN(o_orderkey) AS mn_ok, MAX(o_orderkey) AS mx_ok,
        CAST(MIN(CAST(o_totalprice AS DOUBLE)) AS DOUBLE) AS mn_p,
        CAST(MAX(CAST(o_totalprice AS DOUBLE)) AS DOUBLE) AS mx_p,
        CAST(CASE WHEN o_orderstatus = 'P' THEN 0 ELSE COUNT(*) END AS BIGINT)
          AS n_after
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  /** B2 DISTINCT-PARTITION PUSHDOWN (r14): `SELECT DISTINCT part` on a
    * partition-tagged logged table is a group-by-only aggregation —
    * answered as the LIVE partition domain straight from the manifest
    * tags (zero data files opened; Iceberg's "partitions metadata
    * table" as plain SQL). REQUIRED in-body: both DISTINCT plans are
    * LocalTableScans, and after a merge-on-read DELETE masks every
    * row of one partition that partition leaves the domain (a
    * tag-only answer that ignored liveness would keep it — value
    * mismatch against the oracle). */
  private val q179 = Q(
    "q179_distinct_partitions",
    (s, dir) => {
      val cat = "g179_" + java.lang.Integer.toHexString(dir.hashCode)
      val root = scratch(s, dir, "dpart-wh")
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", root)
      t(s, dir, "orders").select(
          col("o_orderkey"), col("o_orderstatus"))
        .writeTo(s"$cat.t").tableProperty("merge.log", "true")
        .tableProperty("merge.partcol", "o_orderstatus").create()
      def distinctLocal(tag: String): Seq[String] = {
        val d = s.sql(s"SELECT DISTINCT o_orderstatus FROM $cat.t")
        val p = d.queryExecution.executedPlan.toString
        require(p.contains("LocalTableScan") && !p.contains("BatchScan"),
          s"q179: the $tag DISTINCT must be manifest-answered:\n$p")
        d.collect().map(_.getString(0)).toSeq
      }
      val all = distinctLocal("pre-delete")
      s.conf.set("spark.graft.dv.minTouchedBytes", "0")
      s.conf.set("spark.graft.dv.maxRatio", "1.0")
      val live =
        try {
          s.sql(s"DELETE FROM $cat.t WHERE o_orderstatus = 'F'")
          require(graft.sources.CommitLog(s, s"$root/t").snapshot().dvs.nonEmpty,
            "q179: the partition delete was not merge-on-read")
          distinctLocal("post-mask")
        } finally {
          s.conf.unset("spark.graft.dv.minTouchedBytes")
          s.conf.unset("spark.graft.dv.maxRatio")
        }
      require(!live.contains("F"),
        "q179: a fully-masked partition must leave the DISTINCT domain")
      import s.implicits._
      (all.map(_ -> "all") ++ live.map(_ -> "live"))
        .toDF("o_orderstatus", "phase")
        .orderBy(col("phase"), col("o_orderstatus"))
    },
    Some("""SELECT o_orderstatus, 'all' AS phase
        FROM (SELECT DISTINCT o_orderstatus FROM orders)
      UNION ALL
      SELECT o_orderstatus, 'live' AS phase
        FROM (SELECT DISTINCT o_orderstatus FROM orders
              WHERE o_orderstatus <> 'F')
      ORDER BY phase, o_orderstatus"""))

  /** B2 SQL MERGE-ON-READ MERGE (r15, VERDICT r14 #2,
    * [[graft.sources.GraftSqlExtensions]]): the exact statement shape of
    * q177 issued through `MERGE INTO` SQL — the parser-level intercept
    * translates it to [[graft.sources.CommitLog.merge]], whose
    * `tryDvMerge` commits the ANSI trio as ONE `add_dv` version with
    * ZERO touched-file rewrite. Before this, SQL MERGE rode Spark's
    * group-based row-level path and always rewrote the scanned files —
    * a SQL-first user paid rewrite amplification the library user
    * didn't. REQUIRED in-body: one version, no data-file retirement,
    * appended files, a DV present (the same checks as q177 — a fallback
    * to either rewrite path fails the DV check). Values hash against
    * DuckDB reconstructing the merge relationally. */
  private val q180 = Q(
    "q180_sql_mor_merge",
    (s, dir) => {
      val cat = "g180_" + java.lang.Integer.toHexString(dir.hashCode)
      val root = scratch(s, dir, "sqlmor-wh")
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", root)
      val o = t(s, dir, "orders")
      o.filter(col("o_orderkey") % 3 =!= 0).select(
          col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice").cast("decimal(18,2)").as("price"))
        .writeTo(s"$cat.t").tableProperty("merge.log", "true").create()
      o.filter(col("o_orderkey") % 20 === 0).select(
          col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          (col("o_totalprice").cast("decimal(18,2)") * 3)
            .cast("decimal(18,2)").as("price"))
        .createOrReplaceTempView("q180_src")
      val log = graft.sources.CommitLog(s, s"$root/t")
      val before = log.snapshot()
      s.conf.set("spark.graft.dv.minTouchedBytes", "0")
      try s.sql(s"""MERGE INTO $cat.t t USING q180_src s
        ON t.o_orderkey = s.o_orderkey
        WHEN MATCHED AND s.price > 400000 THEN DELETE
        WHEN MATCHED THEN UPDATE SET price = s.price
        WHEN NOT MATCHED THEN INSERT *""")
      finally s.conf.unset("spark.graft.dv.minTouchedBytes")
      val after = log.snapshot()
      require(after.version == before.version + 1,
        "q180: the SQL merge must be ONE atomic commit")
      require(before.files.forall(after.files.contains),
        "q180: merge-on-read SQL MERGE must retire no data file")
      require(after.files.size > before.files.size,
        "q180: updated + inserted rows must land as appended files")
      require(after.dvs.nonEmpty,
        "q180: no deletion vector — the SQL merge fell back to a rewrite path")
      s.table(s"$cat.t").groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("price")).cast("double").as("revenue"),
          sum(col("o_orderkey")).as("key_sum"))
        .orderBy(col("o_orderstatus"))
    },
    Some("""WITH tgt AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
          CAST(o_totalprice AS DECIMAL(18,2)) AS price
        FROM orders WHERE o_orderkey % 3 <> 0),
      src AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
          CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 3 AS DECIMAL(18,2)) AS price
        FROM orders WHERE o_orderkey % 20 = 0),
      merged AS (
        SELECT t.o_orderkey, t.o_custkey, t.o_orderstatus,
          CASE WHEN s.o_orderkey IS NOT NULL THEN s.price ELSE t.price END AS price
        FROM tgt t LEFT JOIN src s ON t.o_orderkey = s.o_orderkey
        WHERE s.o_orderkey IS NULL OR s.price <= 400000
        UNION ALL
        SELECT s.o_orderkey, s.o_custkey, s.o_orderstatus, s.price
        FROM src s LEFT JOIN tgt t ON s.o_orderkey = t.o_orderkey
        WHERE t.o_orderkey IS NULL)
      SELECT o_orderstatus, COUNT(*) AS n,
        CAST(SUM(price) AS DOUBLE) AS revenue,
        CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
      FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  /** B2/B6 TIMESTAMP MANIFEST STATS (r15, VERDICT r14 #3): graft
    * writers emit INT64 MICROS timestamps (Spark's default INT96
    * carries no usable footer min/max), the stats harvest normalizes
    * footer units to Spark's internal epoch-micros (MILLIS convert
    * exactly, NANOS/INT96 refuse), and with that `min(ts)/max(ts)` is
    * manifest-answered and time-RANGE predicates prune whole files —
    * the reference's own hottest read shape is `latest price as of t`
    * (/root/reference/index.js:305-314). REQUIRED in-body: the clean
    * table's min/max plans as LocalTableScan; a ts-range filter scans
    * ONLY the overlapping file; after an INT96-written batch joins the
    * table the same min/max REFUSES to a real scan (one file provably
    * lacks the stat) and the range filter keeps the stat-less file
    * conservatively — hash-green throughout. */
  private val q181 = Q(
    "q181_ts_minmax_pushdown",
    (s, dir) => {
      val cat = "g181_" + java.lang.Integer.toHexString(dir.hashCode)
      val root = scratch(s, dir, "tspd-wh")
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", root)
      val li = t(s, dir, "lineitem").select(
        col("l_orderkey"),
        col("l_shipdate").cast("date").cast("timestamp").as("ts"))
      // the gates below need MICROS footer stats on the table's own
      // files — force the unit for the builds regardless of what the
      // enclosing harness pinned (Verify dumps INT96), restore after
      val priorTsType = s.conf.getOption("spark.sql.parquet.outputTimestampType")
      s.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      try {
      // two date-disjoint files: range predicates can prove pruning
      li.filter(col("ts") < lit("1998-01-01").cast("timestamp")).coalesce(1)
        .writeTo(s"$cat.t").tableProperty("merge.log", "true").create()
      li.filter(col("ts") >= lit("1998-01-01").cast("timestamp")).coalesce(1)
        .writeTo(s"$cat.t").append()
      def planOf(df: DataFrame): String = df.queryExecution.executedPlan.toString
      def scanned(df: DataFrame): Int =
        df.queryExecution.optimizedPlan.collect {
          case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
            graft.sources.GraftScans.unwrapFileScan(r.scan)
              .fileIndex.inputFiles.length
        }.sum
      val mm = s.table(s"$cat.t").agg(
        unix_micros(min(col("ts"))).as("mn_us"),
        unix_micros(max(col("ts"))).as("mx_us"))
      require(planOf(mm).contains("LocalTableScan") && !planOf(mm).contains("BatchScan"),
        s"q181: min/max(ts) must be manifest-answered:\n${planOf(mm)}")
      val mmRow = mm.collect()
      val bound = lit("2000-06-01").cast("timestamp")
      val ranged = s.table(s"$cat.t").filter(col("ts") >= bound)
      require(scanned(ranged) == 1,
        s"q181: the ts-range filter must prune to the 1998+ file, scanned ${scanned(ranged)}")
      val nRange = ranged.count()
      // an INT96 batch (no usable ts footer stats) makes the extremum
      // UNPROVABLE from the manifest: the pushdown must refuse, and
      // range pruning must keep the stat-less file conservatively
      s.conf.set("spark.sql.parquet.outputTimestampType", "INT96")
      try li.filter(col("l_orderkey") % 97 === 0).coalesce(1)
        .writeTo(s"$cat.t").append()
      finally s.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      val mm2 = s.table(s"$cat.t").agg(
        unix_micros(min(col("ts"))).as("mn2_us"),
        unix_micros(max(col("ts"))).as("mx2_us"))
      require(planOf(mm2).contains("BatchScan"),
        s"q181: min/max over an INT96 file must fall back to a real scan:\n${planOf(mm2)}")
      require(scanned(s.table(s"$cat.t").filter(col("ts") >= bound)) == 2,
        "q181: the stat-less INT96 file must survive range pruning conservatively")
      val mm2Row = mm2.collect()
      import s.implicits._
      Seq((mmRow(0).getLong(0), mmRow(0).getLong(1), nRange,
          mm2Row(0).getLong(0), mm2Row(0).getLong(1)))
        .toDF("mn_us", "mx_us", "n_range", "mn2_us", "mx2_us")
      // a failure above must not leave the SHARED session on MICROS —
      // Verify pins INT96 for its dumps, and one broken gate would
      // otherwise cascade tz-suffixed renderings into every later
      // timestamp query (review r15)
      } finally priorTsType match {
        case Some(v) => s.conf.set("spark.sql.parquet.outputTimestampType", v)
        case None => s.conf.unset("spark.sql.parquet.outputTimestampType")
      }
    },
    Some("""WITH base AS (
        SELECT l_orderkey, CAST(CAST(l_shipdate AS DATE) AS TIMESTAMP) AS ts
        FROM lineitem)
      SELECT
        epoch_us(MIN(ts)) AS mn_us,
        epoch_us(MAX(ts)) AS mx_us,
        (SELECT COUNT(*) FROM base WHERE ts >= TIMESTAMP '2000-06-01') AS n_range,
        epoch_us(LEAST(MIN(ts),
          (SELECT MIN(ts) FROM base WHERE l_orderkey % 97 = 0))) AS mn2_us,
        epoch_us(GREATEST(MAX(ts),
          (SELECT MAX(ts) FROM base WHERE l_orderkey % 97 = 0))) AS mx2_us
      FROM base"""))

  /** B2/B6 DAY-LEVEL ROLLUP PUSHDOWN (r15, VERDICT r14 #4): on a
    * `days(ts)`-partitioned table, `GROUP BY CAST(ts AS DATE)` — the
    * day-level rollup, THE common profile on time-partitioned tables —
    * folds entirely from manifest tags + row counts + footer stats
    * (the tag holds exactly the UTC epoch-day). REQUIRED in-body: the
    * rollup plans as LocalTableScan with zero files opened, while
    * `GROUP BY ts` (the raw source column — the tag holds LESS than
    * the value) still refuses to a real scan. Values hash against
    * DuckDB grouping the same synthesized timestamps. */
  private val q182 = Q(
    "q182_days_rollup_pushdown",
    (s, dir) => {
      val cat = "g182_" + java.lang.Integer.toHexString(dir.hashCode)
      val root = scratch(s, dir, "drollup-wh")
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", root)
      t(s, dir, "lineitem").select(
          col("l_orderkey"),
          col("l_extendedprice").cast("double").as("price"),
          expr("timestampadd(DAY, CAST(l_orderkey % 7 AS INT), " +
            "TIMESTAMP '2024-03-01 06:30:00')").as("ts"))
        .writeTo(s"$cat.t").tableProperty("merge.log", "true")
        .tableProperty("merge.partcol", "days(ts)").create()
      def planOf(df: DataFrame): String = df.queryExecution.executedPlan.toString
      val rollup = s.table(s"$cat.t")
        .groupBy(col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("n"),
          min(col("l_orderkey")).as("mn_ok"), max(col("l_orderkey")).as("mx_ok"),
          min(col("price")).as("mn_p"), max(col("price")).as("mx_p"))
        .orderBy(col("day"))
      require(planOf(rollup).contains("LocalTableScan")
          && !planOf(rollup).contains("BatchScan"),
        s"q182: the day rollup must be manifest-answered:\n${planOf(rollup)}")
      // the pinned refusal edge, held in the gate too: the raw source
      // column groups finer than the tag — must scan
      val raw = s.table(s"$cat.t").groupBy(col("ts")).agg(count(lit(1)).as("n"))
      require(planOf(raw).contains("BatchScan"),
        s"q182: GROUP BY the raw ts must refuse the pushdown:\n${planOf(raw)}")
      rollup
    },
    Some("""SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n,
        MIN(l_orderkey) AS mn_ok, MAX(l_orderkey) AS mx_ok,
        MIN(price) AS mn_p, MAX(price) AS mx_p
      FROM (SELECT l_orderkey, CAST(l_extendedprice AS DOUBLE) AS price,
              TIMESTAMP '2024-03-01 06:30:00'
                + to_days(CAST(l_orderkey % 7 AS INT)) AS ts
            FROM lineitem)
      GROUP BY 1 ORDER BY day"""))

  /** B2/B8 PARTITION-EXACT FILTER PUSHDOWN (r15, VERDICT r14 #5): when
    * a pushed filter is an identity-partition-key equality that the
    * manifest has resolved to an exact file set (every row of every
    * selected file provably matches), aggregate and LIMIT pushdown
    * stay sound over that set — `COUNT/MIN/MAX ... WHERE part = x`
    * folds from the manifest with zero files opened, and
    * `WHERE part = x LIMIT n` scans only a covering prefix of x's
    * files (on a 100k-file table, the difference between one file and
    * a partition scan). REQUIRED in-body: the filtered aggregate plans
    * as LocalTableScan; the filtered LIMIT scans the provable prefix;
    * adding a value conjunct refuses both (rows could drop). Values
    * hash against DuckDB. */
  private val q183 = Q(
    "q183_partition_filter_pushdown",
    (s, dir) => {
      val cat = "g183_" + java.lang.Integer.toHexString(dir.hashCode)
      val root = scratch(s, dir, "pexact-wh")
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", root)
      val o = t(s, dir, "orders").select(
        col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice").cast("double").as("price"))
      // three commits so the F partition spans several files
      o.filter(col("o_orderkey") % 3 === 0).coalesce(1)
        .writeTo(s"$cat.t").tableProperty("merge.log", "true")
        .tableProperty("merge.partcol", "o_orderstatus").create()
      o.filter(col("o_orderkey") % 3 === 1).coalesce(1).writeTo(s"$cat.t").append()
      o.filter(col("o_orderkey") % 3 === 2).coalesce(1).writeTo(s"$cat.t").append()
      def planOf(df: DataFrame): String = df.queryExecution.executedPlan.toString
      def scanned(df: DataFrame): Int =
        df.queryExecution.optimizedPlan.collect {
          case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
            graft.sources.GraftScans.unwrapFileScan(r.scan)
              .fileIndex.inputFiles.length
        }.sum
      val fAgg = s.table(s"$cat.t").filter(col("o_orderstatus") === "F")
        .agg(count(lit(1)).as("n_f"),
          min(col("o_orderkey")).as("mn_f"), max(col("o_orderkey")).as("mx_f"),
          min(col("price")).as("mnp_f"), max(col("price")).as("mxp_f"))
      require(planOf(fAgg).contains("LocalTableScan")
          && !planOf(fAgg).contains("BatchScan"),
        s"q183: the partition-filtered aggregate must fold from the manifest:\n${planOf(fAgg)}")
      val fAggRow = fAgg.collect()
      // LIMIT under the partition filter: the F partition has 3 files
      // (one per commit); a limit under the smallest per-file count
      // must scan a strict prefix of them
      val snap = graft.sources.CommitLog(s, s"$root/t").snapshot()
      // snapshot file order IS commit order — the same order the
      // covering-prefix walk uses
      val fFiles = snap.files.filter(f => snap.parts(f) == "F")
        .map(f => snap.rows(f))
      require(fFiles.size == 3, s"q183: expected 3 F files, got ${fFiles.size}")
      val k = (fFiles.head + 1).toInt // needs exactly the first 2 files
      val lim = s.table(s"$cat.t").filter(col("o_orderstatus") === "F").limit(k)
      val nLim = lim.count()
      require(scanned(lim) == 2,
        s"q183: LIMIT $k over F files of ${fFiles.mkString(",")} rows " +
          s"must scan the 2-file prefix, scanned ${scanned(lim)}")
      // a value conjunct poisons exactness: the aggregate must scan
      val poisoned = s.table(s"$cat.t")
        .filter(col("o_orderstatus") === "F" && col("o_orderkey") > 10)
        .agg(count(lit(1)).as("n"))
      require(planOf(poisoned).contains("BatchScan"),
        s"q183: a value conjunct must refuse the manifest fold:\n${planOf(poisoned)}")
      val nPoisoned = poisoned.collect()(0).getLong(0)
      import s.implicits._
      Seq((fAggRow(0).getLong(0), fAggRow(0).getLong(1), fAggRow(0).getLong(2),
          fAggRow(0).getDouble(3), fAggRow(0).getDouble(4), nLim, nPoisoned))
        .toDF("n_f", "mn_f", "mx_f", "mnp_f", "mxp_f", "n_lim", "n_poisoned")
    },
    Some("""WITH f AS (
        SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS price
        FROM orders WHERE o_orderstatus = 'F')
      SELECT COUNT(*) AS n_f, MIN(o_orderkey) AS mn_f, MAX(o_orderkey) AS mx_f,
        MIN(price) AS mnp_f, MAX(price) AS mxp_f,
        CAST((SELECT COUNT(*) FROM f WHERE o_orderkey % 3 = 0) + 1 AS BIGINT) AS n_lim,
        (SELECT COUNT(*) FROM f WHERE o_orderkey > 10) AS n_poisoned
      FROM f"""))

  /** B2 ARRAY-ELEMENT STRUCT EVOLUTION (r15, VERDICT r14 #6): RENAME
    * and DROP of a field INSIDE an `array<struct>` column as
    * metadata-only commits — the reference's own `Combustiveis` column
    * is exactly this shape (/root/reference/index.js:132), so "rename
    * a fuel-entry field" is the domain's most natural evolution. The
    * PhysKey mapping now recurses through array elements: old files
    * keep their bytes, reads cast element structs positionally, new
    * writes land under the stable physical element name (map VALUES
    * ride the same machinery — q189; map keys refuse loudly).
    * REQUIRED in-body: both DDL commits
    * touch zero data files; a post-rename append + the pre-rename
    * files read under one logical name; time travel keeps the old
    * element name. Values hash against DuckDB reconstructing the
    * exploded rows. */
  private val q184 = Q(
    "q184_array_element_evolution",
    (s, dir) => {
      val root = scratch(s, dir, "arrevo")
      val log = graft.sources.CommitLog(s, s"$root/t")
      val o = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice").cast("double").as("p"))
      def fuels(priceName: String, withObs: Boolean) = {
        def entry(f: String, pr: org.apache.spark.sql.Column) = {
          val base = Seq(lit(f).as("fuel"), pr.as(priceName))
          struct(base ++ (if (withObs) Seq(lit("ok").as("obs")) else Nil): _*)
        }
        array(entry("diesel", col("p")), entry("gas95", col("p") * 2))
      }
      log.append(o.filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"), fuels("preco", withObs = true).as("combustiveis")))
      val files0 = log.snapshot().files.toSet
      log.renameColumn(Seq("combustiveis", "preco"), "price")   // v1
      require(log.snapshot().files.toSet == files0,
        "q184: the array-element rename must touch no data file")
      log.append(o.filter(col("o_orderkey") % 2 === 1)
        .select(col("o_orderkey"), fuels("price", withObs = true).as("combustiveis")))
      val files2 = log.snapshot().files.toSet
      log.dropColumn(Seq("combustiveis", "obs"))                 // v3
      require(log.snapshot().files.toSet == files2,
        "q184: the array-element drop must touch no data file")
      val elT = log.read().schema("combustiveis").dataType
        .asInstanceOf[org.apache.spark.sql.types.ArrayType]
        .elementType.asInstanceOf[org.apache.spark.sql.types.StructType]
      require(elT.fieldNames.toSeq == Seq("fuel", "price"),
        s"q184: evolved element shape is ${elT.fieldNames.mkString(",")}")
      // time travel: version 0 still reads the ORIGINAL element names
      val v0 = log.readVersion(0L)
        .select(explode(col("combustiveis")).as("e"))
        .select(col("e.preco"), col("e.obs"))
      require(v0.filter(col("obs") =!= "ok").isEmpty,
        "q184: time travel must keep the pre-evolution element fields")
      log.read()
        .select(explode(col("combustiveis")).as("e"))
        .groupBy(col("e.fuel").as("fuel"))
        .agg(count(lit(1)).as("n"),
          sum(col("e.price").cast("decimal(18,2)")).cast("double").as("sum_price"))
        .orderBy(col("fuel"))
    },
    Some("""WITH base AS (
        SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS p FROM orders),
      exploded AS (
        SELECT 'diesel' AS fuel, p AS price FROM base
        UNION ALL
        SELECT 'gas95' AS fuel, p * 2 AS price FROM base)
      SELECT fuel, COUNT(*) AS n,
        CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      FROM exploded GROUP BY fuel ORDER BY fuel"""))

  /** B2/B5 TRANSFORM PARTITION FAMILY (r15): `months(ts)` and
    * `bucket(n, key)` manifest partition keys — with days/hours/years/
    * truncate, the standard lakehouse layout vocabulary (Iceberg's
    * transform family). Months bounds partition count on long
    * retention; hash buckets bound it on high-cardinality keys — at
    * 100 TB the difference between 10⁶ tiny partitions and a layout a
    * scoped merge can actually use. REQUIRED in-body: every file
    * tagged; a month-scoped read touches exactly that month's files; a
    * bucket-scoped upsert commits `replace_parts` over ONLY the
    * touched buckets (untouched buckets' files ride through). Values
    * hash against DuckDB reconstructing the month count and the
    * post-upsert aggregate. */
  private val q185 = Q(
    "q185_transform_partitions",
    (s, dir) => {
      val root = scratch(s, dir, "xform")
      val o = t(s, dir, "orders").select(
        col("o_orderkey"), col("o_custkey"),
        col("o_totalprice").cast("double").as("price"),
        col("o_orderdate").cast("timestamp").as("ts"))
      // months(ts): calendar-bucketed layout
      val mlog = graft.sources.CommitLog(s, s"$root/m")
      mlog.appendPartitioned(o, "months(ts)")
      val msnap = mlog.snapshot()
      require(msnap.files.forall(msnap.parts.contains),
        "q185: months layout must tag every file")
      // the month tag for 1997-03 = (1997-1970)*12 + 2
      val tag = ((1997 - 1970) * 12 + 2).toString
      val monthFiles = msnap.files.filter(f => msnap.parts(f) == tag)
      val nMonth = mlog.readPartitions(Seq(tag)).count()
      require(monthFiles.nonEmpty,
        "q185: 1997-03 must exist in the synthetic orders")
      // bucket(8, o_custkey): hash-bounded layout + scoped upsert
      val blog = graft.sources.CommitLog(s, s"$root/b")
      blog.appendPartitioned(o, "bucket(8,o_custkey)")
      val before = blog.snapshot()
      require(before.files.map(before.parts).toSet.size <= 8,
        "q185: bucket(8) must yield at most 8 partitions")
      val batch = o.filter(col("o_custkey") % 50 === 0)
        .withColumn("price", (col("price") * 2).cast("double"))
      val touchedTags = batch
        .select(graft.sources.PartSpec.parse("bucket(8,o_custkey)")
          .tagExpr(batch).as("p")).distinct().collect().map(_.getString(0)).toSet
      blog.upsertPartitioned(batch, Seq("o_orderkey", "o_custkey"),
        graft.sources.CommitLog.LastWins, "bucket(8,o_custkey)")
      val after = blog.snapshot()
      val untouchedBefore = before.files.filter(f => !touchedTags(before.parts(f)))
      require(untouchedBefore.forall(after.files.contains),
        "q185: a bucket-scoped upsert must not rewrite untouched buckets")
      require(after.files.exists(f => !before.files.contains(f)),
        "q185: the touched buckets must have been rewritten")
      val agg = blog.read().agg(
        count(lit(1)).as("n"),
        sum(col("price").cast("decimal(18,2)")).cast("double").as("sum_price"),
        sum(col("o_custkey")).as("ck_sum")).collect()(0)
      import s.implicits._
      Seq((nMonth, agg.getLong(0), agg.getDouble(1), agg.getLong(2)))
        .toDF("n_month", "n", "sum_price", "ck_sum")
    },
    Some("""WITH base AS (
        SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DOUBLE) AS price,
          CAST(o_orderdate AS TIMESTAMP) AS ts
        FROM orders),
      merged AS (
        SELECT o_orderkey, o_custkey,
          CASE WHEN o_custkey % 50 = 0 THEN price * 2 ELSE price END AS price
        FROM base)
      SELECT
        (SELECT COUNT(*) FROM base
          WHERE EXTRACT(YEAR FROM ts) = 1997 AND EXTRACT(MONTH FROM ts) = 3)
          AS n_month,
        COUNT(*) AS n,
        CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        CAST(SUM(o_custkey) AS BIGINT) AS ck_sum
      FROM merged"""))

  /** B5 BUCKET STORAGE-PARTITIONED JOIN (r15): two tables hash-bucketed
    * by the SAME `bucket(n, key)` spec join on that key with ZERO
    * Exchange — the classic bucketed-join co-location, resolved through
    * the catalog's V2 `bucket` function (the same md5-derived ordinal
    * the write path tags files with and the runtime-pruning judge
    * replays). At 100 TB this is the difference between shuffling both
    * sides of every fact-dim join and reading co-located buckets in
    * place. REQUIRED in-body: both scans report the bucket SPJ key and
    * the joined plan has zero Exchange nodes. Values hash against
    * DuckDB computing the same join relationally. */
  private val q186 = Q(
    "q186_bucket_spj",
    (s, dir) => {
      val cat = "g186_" + java.lang.Integer.toHexString(dir.hashCode)
      val root = scratch(s, dir, "bspj-wh")
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", root)
      val li = t(s, dir, "lineitem").select(
        col("l_orderkey"),
        col("l_extendedprice").cast("decimal(18,2)").as("price"))
      li.writeTo(s"$cat.fact").tableProperty("merge.log", "true")
        .tableProperty("merge.partcol", "bucket(8,l_orderkey)").create()
      t(s, dir, "orders").select(
          col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))
        .writeTo(s"$cat.dim").tableProperty("merge.log", "true")
        .tableProperty("merge.partcol", "bucket(8,l_orderkey)").create()
      val prevBcast = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
      s.conf.set("spark.graft.spj.preserveDataGrouping", "true")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        // join AND per-key aggregate both ride the bucket co-location:
        // grouping by the bucketed key needs no shuffle either
        val gold = s.table(s"$cat.fact")
          .join(s.table(s"$cat.dim"), Seq("l_orderkey"))
          .groupBy(col("l_orderkey"))
          .agg(count(lit(1)).as("n_li"),
            sum(col("price")).cast("double").as("sum_price"),
            max(col("o_orderstatus")).as("status"))
        val rows = gold.collect()
        val plan = gold.queryExecution.executedPlan.toString
        require(plan.contains("graft-spj(key=bucket(8,l_orderkey))"),
          s"q186: the scans did not report bucket SPJ partitioning:\n$plan")
        val nExchange = plan.linesIterator.count(_.contains("Exchange"))
        require(nExchange == 0,
          s"q186: co-bucketed join planned $nExchange Exchange node(s):\n$plan")
        s.createDataFrame(java.util.Arrays.asList(rows: _*), gold.schema)
          .orderBy(col("l_orderkey"))
      } finally {
        s.conf.set("spark.graft.spj.preserveDataGrouping", "false")
        s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBcast)
      }
    },
    Some("""SELECT l.l_orderkey, COUNT(*) AS n_li,
        CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        MAX(o.o_orderstatus) AS status
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY l.l_orderkey ORDER BY l.l_orderkey"""))

  /** B2/B6 CALENDAR ROLLUP PUSHDOWN (r15): `GROUP BY year(ts),
    * month(ts)` — the month report, THE standing profile query on any
    * time-partitioned table — folds entirely from a `months(ts)`
    * layout's tags (and YEAR alone folds SEVERAL month tags into one
    * group: the fold groups by DERIVED values, which complete pushdown
    * requires since Spark never re-aggregates). A finer-than-tag
    * grouping (the day rollup over month tags) refuses to a real scan.
    * Values hash against DuckDB's EXTRACT rollup. */
  private val q187 = Q(
    "q187_calendar_rollup_pushdown",
    (s, dir) => {
      val cat = "g187_" + java.lang.Integer.toHexString(dir.hashCode)
      val root = scratch(s, dir, "calroll-wh")
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", root)
      t(s, dir, "orders").select(
          col("o_orderkey"), col("o_totalprice").cast("double").as("price"),
          col("o_orderdate").cast("timestamp").as("ts"))
        .writeTo(s"$cat.t").tableProperty("merge.log", "true")
        .tableProperty("merge.partcol", "months(ts)").create()
      def planOf(df: DataFrame): String = df.queryExecution.executedPlan.toString
      val ym = s.table(s"$cat.t")
        .groupBy(year(col("ts")).as("y"), month(col("ts")).as("mo"))
        .agg(count(lit(1)).as("n"),
          min(col("o_orderkey")).as("mn_ok"), max(col("price")).as("mx_p"))
        .orderBy(col("y"), col("mo"))
      require(planOf(ym).contains("LocalTableScan")
          && !planOf(ym).contains("BatchScan"),
        s"q187: the year/month rollup must be manifest-answered:\n${planOf(ym)}")
      val yOnly = s.table(s"$cat.t").groupBy(year(col("ts")).as("y"))
        .agg(count(lit(1)).as("n"))
      require(planOf(yOnly).contains("LocalTableScan"),
        s"q187: YEAR alone must fold month tags together:\n${planOf(yOnly)}")
      // finer than the tag: the day rollup over month tags must scan
      val fine = s.table(s"$cat.t").groupBy(col("ts").cast("date").as("d"))
        .agg(count(lit(1)).as("n"))
      require(planOf(fine).contains("BatchScan"),
        s"q187: a day rollup over month tags must refuse:\n${planOf(fine)}")
      ym
    },
    Some("""SELECT EXTRACT(YEAR FROM ts) AS y, EXTRACT(MONTH FROM ts) AS mo,
        COUNT(*) AS n, MIN(o_orderkey) AS mn_ok, MAX(price) AS mx_p
      FROM (SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS price,
              CAST(o_orderdate AS TIMESTAMP) AS ts FROM orders)
      GROUP BY 1, 2 ORDER BY y, mo"""))

  /** B8 MANIFEST-BOUNDED TOP-N PUSHDOWN (r15): `ORDER BY ts DESC
    * LIMIT n` — "the latest n rows", the reference's own hottest read
    * (/root/reference/index.js:305-314, `ScanIndexForward: false,
    * Limit: 1`) — prunes every file provably dominated by ≥ n rows in
    * other files, judged from footer min/max + row/null counts + DV
    * cardinalities (`SupportsPushDownTopN`, always partial: Spark
    * re-sorts the kept superset). On an append log whose commits move
    * forward in time — exactly the reference's write pattern — the
    * latest-n read scans ONE file out of any number of commits.
    * REQUIRED in-body: the DESC and ASC top-n reads each scan exactly
    * the one dominating file out of three; a non-default null
    * placement refuses (scans all three). Values hash against
    * DuckDB's full-sort answer. */
  private val q188 = Q(
    "q188_topn_pushdown",
    (s, dir) => {
      val cat = "g188_" + java.lang.Integer.toHexString(dir.hashCode)
      val root = scratch(s, dir, "topn-wh")
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", root)
      val o = t(s, dir, "orders").select(
        col("o_orderkey"),
        expr("timestampadd(SECOND, CAST(o_orderkey AS INT), " +
          "timestamp'2024-01-01 00:00:00')").as("ts"))
      val priorTsType = s.conf.getOption("spark.sql.parquet.outputTimestampType")
      s.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      try {
        // three commits with DISJOINT, forward-moving time ranges —
        // the append-log shape: each commit is one file
        val mx = o.agg(max(col("o_orderkey"))).collect()(0).getLong(0)
        val (k1, k2) = (mx / 3, 2 * mx / 3)
        o.filter(col("o_orderkey") < k1).coalesce(1)
          .writeTo(s"$cat.t").tableProperty("merge.log", "true").create()
        o.filter(col("o_orderkey") >= k1 && col("o_orderkey") < k2).coalesce(1)
          .writeTo(s"$cat.t").append()
        o.filter(col("o_orderkey") >= k2).coalesce(1).writeTo(s"$cat.t").append()
        def scanned(df: DataFrame): Int =
          df.queryExecution.optimizedPlan.collect {
            case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
              graft.sources.GraftScans.unwrapFileScan(r.scan)
                .fileIndex.inputFiles.length
          }.sum
        val latest = s.table(s"$cat.t").orderBy(col("ts").desc).limit(10)
          .select(col("o_orderkey"), unix_micros(col("ts")).as("ts_us"))
        require(scanned(latest) == 1,
          s"q188: the latest-10 read must scan only the newest file, " +
            s"scanned ${scanned(latest)}")
        val earliest = s.table(s"$cat.t").orderBy(col("ts").asc).limit(7)
        require(scanned(earliest) == 1,
          s"q188: the earliest-7 read must scan only the oldest file, " +
            s"scanned ${scanned(earliest)}")
        require(earliest.count() == 7, "q188: earliest-7 must yield 7 rows")
        // a null placement stats cannot judge must refuse
        val odd = s.table(s"$cat.t").orderBy(col("ts").desc_nulls_first).limit(10)
        require(scanned(odd) == 3,
          s"q188: DESC NULLS FIRST must keep every file, scanned ${scanned(odd)}")
        latest
      } finally priorTsType match {
        case Some(v) => s.conf.set("spark.sql.parquet.outputTimestampType", v)
        case None => s.conf.unset("spark.sql.parquet.outputTimestampType")
      }
    },
    Some("""SELECT o_orderkey,
        epoch_us(TIMESTAMP '2024-01-01 00:00:00') + o_orderkey * 1000000 AS ts_us
      FROM orders ORDER BY ts_us DESC LIMIT 10"""))

  /** B2 MAP-VALUE STRUCT EVOLUTION (r15): RENAME and DROP of a field
    * inside a `map<k, struct>` column as metadata-only commits — the
    * q184 machinery one container over (the reference's fuel entries
    * keyed by fuel name instead of listed, the map shape of
    * /root/reference/index.js:132). The PhysKey walk, the positional
    * read/write casts, and CDC alignment all recurse through map
    * VALUES; map KEYS refuse loudly (a key is the map's identity).
    * REQUIRED in-body: both DDL commits touch zero data files; pre-
    * and post-rename files read under one logical name; time travel
    * keeps the old value-field name. Values hash against DuckDB
    * reconstructing the per-fuel aggregate. */
  private val q189 = Q(
    "q189_map_value_evolution",
    (s, dir) => {
      val root = scratch(s, dir, "mapevo")
      val log = graft.sources.CommitLog(s, s"$root/t")
      val o = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice").cast("double").as("p"))
      def fuels(priceName: String, withObs: Boolean) = {
        def entry(pr: org.apache.spark.sql.Column) = {
          val base = Seq(pr.as(priceName))
          struct(base ++ (if (withObs) Seq(lit("ok").as("obs")) else Nil): _*)
        }
        map(lit("diesel"), entry(col("p")), lit("gas95"), entry(col("p") * 2))
      }
      log.append(o.filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"), fuels("preco", withObs = true).as("m")))
      val files0 = log.snapshot().files.toSet
      log.renameColumn(Seq("m", "preco"), "price")   // v1
      require(log.snapshot().files.toSet == files0,
        "q189: the map-value rename must touch no data file")
      log.append(o.filter(col("o_orderkey") % 2 === 1)
        .select(col("o_orderkey"), fuels("price", withObs = true).as("m")))
      val files2 = log.snapshot().files.toSet
      log.dropColumn(Seq("m", "obs"))                // v3
      require(log.snapshot().files.toSet == files2,
        "q189: the map-value drop must touch no data file")
      val vT = log.read().schema("m").dataType
        .asInstanceOf[org.apache.spark.sql.types.MapType]
        .valueType.asInstanceOf[org.apache.spark.sql.types.StructType]
      require(vT.fieldNames.toSeq == Seq("price"),
        s"q189: evolved value shape is ${vT.fieldNames.mkString(",")}")
      // time travel: version 0 still reads the ORIGINAL value fields
      val v0 = log.readVersion(0L)
        .select(explode(col("m")).as(Seq("fuel", "e")))
        .select(col("e.preco"), col("e.obs"))
      require(v0.filter(col("obs") =!= "ok").isEmpty,
        "q189: time travel must keep the pre-evolution value fields")
      log.read()
        .select(explode(col("m")).as(Seq("fuel", "e")))
        .groupBy(col("fuel"))
        .agg(count(lit(1)).as("n"),
          sum(col("e.price").cast("decimal(18,2)")).cast("double").as("sum_price"))
        .orderBy(col("fuel"))
    },
    Some("""WITH base AS (
        SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS p FROM orders),
      exploded AS (
        SELECT 'diesel' AS fuel, p AS price FROM base
        UNION ALL
        SELECT 'gas95' AS fuel, p * 2 AS price FROM base)
      SELECT fuel, COUNT(*) AS n,
        CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      FROM exploded GROUP BY fuel ORDER BY fuel"""))

  /** B2/B6 TIME-SCOPED PARTITION-EXACT PUSHDOWN (r15): `WHERE
    * CAST(ts AS DATE) = d` over a `days(ts)`-partitioned table is
    * PROVABLY satisfied by every row of the day's files (the tag IS
    * the UTC epoch-day), so the day-scoped COUNT/MIN/MAX folds from
    * the manifest with zero files opened — the reference's own
    * per-day read (`Data = :d` on the DynamoDB key,
    * /root/reference/index.js:305-314) at 100 TB. The cast predicate
    * also folds to a ts-micros bound for file pruning, so the scan
    * (when one IS needed) touches only the day's files. REQUIRED
    * in-body: the day-scoped aggregate plans as LocalTableScan; the
    * plain day filter scans only that day's files; equality on the
    * RAW ts refuses exactness (lossy tag). Values hash against
    * DuckDB. */
  private val q190 = Q(
    "q190_dayscoped_pushdown",
    (s, dir) => {
      val cat = "g190_" + java.lang.Integer.toHexString(dir.hashCode)
      val root = scratch(s, dir, "dayscope-wh")
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", root)
      val o = t(s, dir, "orders").select(
        col("o_orderkey"), col("o_totalprice").cast("double").as("price"),
        expr("timestamp'2024-03-01 06:30:00' " +
          "+ make_interval(0, 0, 0, CAST(o_orderkey % 7 AS INT), 0, 0, 0)")
          .as("ts"))
      val priorTsType = s.conf.getOption("spark.sql.parquet.outputTimestampType")
      s.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      try {
        o.writeTo(s"$cat.t").tableProperty("merge.log", "true")
          .tableProperty("merge.partcol", "days(ts)").create()
        def planOf(df: DataFrame): String =
          df.queryExecution.executedPlan.toString
        def scanned(df: DataFrame): Int =
          df.queryExecution.optimizedPlan.collect {
            case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
              graft.sources.GraftScans.unwrapFileScan(r.scan)
                .fileIndex.inputFiles.length
          }.sum
        val day = lit("2024-03-04").cast("date")
        val dayAgg = s.table(s"$cat.t")
          .filter(col("ts").cast("date") === day)
          .agg(count(lit(1)).as("n_day"),
            min(col("o_orderkey")).as("mn_ok"), max(col("price")).as("mx_p"))
        require(planOf(dayAgg).contains("LocalTableScan")
            && !planOf(dayAgg).contains("BatchScan"),
          s"q190: the day-scoped aggregate must fold from the manifest:\n" +
            planOf(dayAgg))
        val dayAggRow = dayAgg.collect()
        // the plain day filter prunes to the one day partition's files
        val snap = graft.sources.CommitLog(s, s"$root/t").snapshot()
        val dayFiles = snap.parts.values.count(_ == "19786") // 2024-03-04
        val plain = s.table(s"$cat.t").filter(col("ts").cast("date") === day)
        require(scanned(plain) == dayFiles && dayFiles >= 1,
          s"q190: the day filter must scan the day's $dayFiles file(s), " +
            s"scanned ${scanned(plain)}")
        // equality on the RAW ts is lossy against a day tag: refuses
        val raw = s.table(s"$cat.t")
          .filter(col("ts") === lit("2024-03-04 06:30:00").cast("timestamp"))
          .agg(count(lit(1)).as("n"))
        require(planOf(raw).contains("BatchScan"),
          s"q190: raw-ts equality must refuse the manifest fold:\n${planOf(raw)}")
        val nRaw = raw.collect()(0).getLong(0)
        import s.implicits._
        Seq((dayAggRow(0).getLong(0), dayAggRow(0).getLong(1),
            dayAggRow(0).getDouble(2), nRaw))
          .toDF("n_day", "mn_ok", "mx_p", "n_raw")
      } finally priorTsType match {
        case Some(v) => s.conf.set("spark.sql.parquet.outputTimestampType", v)
        case None => s.conf.unset("spark.sql.parquet.outputTimestampType")
      }
    },
    Some("""WITH base AS (
        SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS price,
          TIMESTAMP '2024-03-01 06:30:00'
            + to_days(CAST(o_orderkey % 7 AS INT)) AS ts
        FROM orders)
      SELECT
        (SELECT COUNT(*) FROM base WHERE CAST(ts AS DATE) = DATE '2024-03-04') AS n_day,
        (SELECT MIN(o_orderkey) FROM base WHERE CAST(ts AS DATE) = DATE '2024-03-04') AS mn_ok,
        (SELECT MAX(price) FROM base WHERE CAST(ts AS DATE) = DATE '2024-03-04') AS mx_p,
        (SELECT COUNT(*) FROM base
          WHERE ts = TIMESTAMP '2024-03-04 06:30:00') AS n_raw"""))

  /** B2/B6 DECIMAL MANIFEST STATS (r16): money columns — the
    * reference's own domain (fuel prices are DECIMAL(10,3),
    * /root/reference/index.js:129-138) — now carry footer min/max in
    * the manifest as (unscaled long, scale) typed values
    * ([[graft.sources.CommitLog.DecV]], the TsUs pattern: a pre-r16
    * manifest reads as stat-less, never misread), unlocking the whole
    * pushdown family over the commonest filter/agg target: MIN/MAX
    * folds answer from the manifest with zero files opened, price-
    * range predicates (incl. cross-scale literals through the
    * DecimalPrecision cast) prune to the band's files, and a
    * price-ordered top-N excludes dominated files. REQUIRED in-body:
    * the global min/max/count folds to LocalTableScan; the mid-band
    * range scans 1 of 3 files; the cross-scale strict bound scans 1;
    * the top-5 read scans 1. Values hash against DuckDB replaying the
    * same exact decimal arithmetic. */
  private val q191 = Q(
    "q191_decimal_stats_pushdown",
    (s, dir) => {
      val cat = "g191_" + java.lang.Integer.toHexString(dir.hashCode)
      val root = scratch(s, dir, "dec-wh")
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", root)
      val o = t(s, dir, "orders").select(
        col("o_orderkey"),
        expr("CAST(o_orderkey * 7 AS DECIMAL(14,2)) + CAST(0.25 AS DECIMAL(3,2))")
          .cast("decimal(14,2)").as("p"))
      val mx = o.agg(max(col("o_orderkey"))).collect()(0).getLong(0)
      val (k1, k2) = (mx / 3, 2 * mx / 3)
      o.filter(col("o_orderkey") < k1).coalesce(1)
        .writeTo(s"$cat.t").tableProperty("merge.log", "true").create()
      o.filter(col("o_orderkey") >= k1 && col("o_orderkey") < k2).coalesce(1)
        .writeTo(s"$cat.t").append()
      o.filter(col("o_orderkey") >= k2).coalesce(1).writeTo(s"$cat.t").append()
      def planOf(df: DataFrame): String =
        df.queryExecution.executedPlan.toString
      def scanned(df: DataFrame): Int =
        df.queryExecution.optimizedPlan.collect {
          case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
            graft.sources.GraftScans.unwrapFileScan(r.scan)
              .fileIndex.inputFiles.length
        }.sum
      // 1) global fold: zero data files opened
      val fold = s.table(s"$cat.t").agg(count(lit(1)).as("n_all"),
        min(col("p")).as("mn"), max(col("p")).as("mx"))
      require(planOf(fold).contains("LocalTableScan")
          && !planOf(fold).contains("BatchScan"),
        s"q191: decimal min/max must fold from the manifest:\n${planOf(fold)}")
      val foldRow = fold.collect()(0)
      // 2) mid-band range: 1 of 3 files
      def bd(l: Long, frac: String) = new java.math.BigDecimal(l * 7)
        .add(new java.math.BigDecimal(frac))
      val mid = s.table(s"$cat.t")
        .filter(col("p") >= lit(bd(k1, "0.00")) && col("p") < lit(bd(k2, "0.00")))
      require(scanned(mid) == 1,
        s"q191: the mid price band must scan 1 file, scanned ${scanned(mid)}")
      val midRow = mid.agg(count(lit(1)).as("n_mid"),
        sum(col("p")).as("s_mid")).collect()(0)
      // 3) cross-scale strict bound (scale-4 literal over a scale-2
      //    column — DecimalPrecision casts the column up): still 1 file
      val cross = s.table(s"$cat.t")
        .filter(col("p") > lit(bd(k1, "0.2505")) && col("p") < lit(bd(k2, "0.00")))
      require(scanned(cross) == 1,
        s"q191: cross-scale decimal bounds must prune, scanned ${scanned(cross)}")
      val nCross = cross.count()
      // 4) price-ordered top-5: the top band dominates
      val top = s.table(s"$cat.t").orderBy(col("p").desc).limit(5)
      require(scanned(top) == 1,
        s"q191: the top-5 price read must scan 1 file, scanned ${scanned(top)}")
      val topSum = top.agg(sum(col("p")).as("s")).collect()(0).getDecimal(0)
      import s.implicits._
      Seq((foldRow.getLong(0), foldRow.getDecimal(1).doubleValue,
          foldRow.getDecimal(2).doubleValue, midRow.getLong(0),
          midRow.getDecimal(1).doubleValue, nCross, topSum.doubleValue))
        .toDF("n_all", "mn_p", "mx_p", "n_mid", "s_mid", "n_cross", "top5")
    },
    Some("""WITH base AS (
        SELECT o_orderkey,
          CAST(o_orderkey * 7 AS DECIMAL(14,2)) + CAST(0.25 AS DECIMAL(3,2)) AS p
        FROM orders),
      ks AS (SELECT MAX(o_orderkey) // 3 AS k1, 2 * MAX(o_orderkey) // 3 AS k2
        FROM orders)
      SELECT
        (SELECT COUNT(*) FROM base) AS n_all,
        (SELECT CAST(MIN(p) AS DOUBLE) FROM base) AS mn_p,
        (SELECT CAST(MAX(p) AS DOUBLE) FROM base) AS mx_p,
        (SELECT COUNT(*) FROM base, ks
          WHERE p >= CAST(k1 * 7 AS DECIMAL(16,2))
            AND p < CAST(k2 * 7 AS DECIMAL(16,2))) AS n_mid,
        (SELECT CAST(SUM(p) AS DOUBLE) FROM base, ks
          WHERE p >= CAST(k1 * 7 AS DECIMAL(16,2))
            AND p < CAST(k2 * 7 AS DECIMAL(16,2))) AS s_mid,
        (SELECT COUNT(*) FROM base, ks
          WHERE p > CAST(k1 * 7 AS DECIMAL(16,2)) + CAST(0.2505 AS DECIMAL(5,4))
            AND p < CAST(k2 * 7 AS DECIMAL(16,2))) AS n_cross,
        (SELECT CAST(SUM(p) AS DOUBLE) FROM
          (SELECT p FROM base ORDER BY p DESC LIMIT 5)) AS top5"""))

  /** B2 TYPE-WIDENING EVOLUTION (r16): an id column that outgrew int
    * and a money column that outgrew its decimal precision evolve in
    * ONE metadata-only commit — old narrow files read through the
    * widened schema natively (Spark's parquet reader converts
    * int32→long and decimal precision growth in-scan, zero rewrite),
    * a later narrower batch upcasts before landing, and row-level DML
    * operates on the one coherent widened column. The reference's
    * tables live for years (/root/reference/index.js:305 reads a
    * rolling daily log) — the first id past 2^31 must not brick the
    * pipeline. REQUIRED in-body: the widening touches zero existing
    * files; the pre-widen schema was (int, decimal(10,2)) and the
    * post-widen schema is (long, decimal(14,2)); an incompatible
    * (string-over-decimal) write still refuses loudly. Values hash
    * against DuckDB replaying append + widen + delete. */
  private val q192 = Q(
    "q192_type_widening",
    (s, dir) => {
      val root = scratch(s, dir, "widen-log")
      val log = graft.sources.CommitLog(s, s"$root/t")
      val o = t(s, dir, "orders")
      val mx = o.agg(max(col("o_orderkey"))).collect()(0).getLong(0)
      val k = mx / 2
      def priced(df: DataFrame, dec: String, wide: Boolean) = df.select(
        (if (wide) col("o_orderkey") else col("o_orderkey").cast("int")).as("id"),
        expr(s"CAST(o_orderkey * 3 AS $dec) + CAST(0.50 AS DECIMAL(3,2))")
          .cast(dec).as("price"))
      log.append(priced(o.filter(col("o_orderkey") <= k), "DECIMAL(10,2)",
        wide = false))
      require(log.read().schema("id").dataType ==
          org.apache.spark.sql.types.IntegerType
          && log.read().schema("price").dataType ==
          org.apache.spark.sql.types.DecimalType(10, 2),
        "q192: the pre-widen schema must be (int, decimal(10,2))")
      val files0 = log.snapshot().files.toSet
      // one wide batch: long ids + decimal(14,2) prices, incl. a row
      // past both old types' capacity
      import s.implicits._
      val wideBatch = priced(o.filter(col("o_orderkey") > k), "DECIMAL(14,2)",
          wide = true)
        .unionByName(Seq((5000000000L, "123456789012.25")).toDF("id", "p")
          .select(col("id"), col("p").cast("decimal(14,2)").as("price")))
      log.append(wideBatch)
      require(log.read().schema("id").dataType ==
          org.apache.spark.sql.types.LongType
          && log.read().schema("price").dataType ==
          org.apache.spark.sql.types.DecimalType(14, 2),
        "q192: the widened schema must be (long, decimal(14,2))")
      require(files0.subsetOf(log.snapshot().files.toSet),
        "q192: widening must touch zero existing data files")
      // an incompatible write still refuses loudly
      val refused = scala.util.Try(
        log.append(Seq(("x", "y")).toDF("id", "price")))
      require(refused.isFailure
          && refused.failed.get.getMessage.contains("cannot change column"),
        "q192: a cross-family write must refuse")
      // post-widen row-level DML on the coherent widened column
      log.delete(col("id") % 10L === 3L)
      log.read()
        .groupBy((col("id") % 7L).as("g"))
        .agg(count(lit(1)).as("n"),
          sum(col("price")).cast("double").as("s_price"),
          sum(col("id")).as("id_sum"))
        .orderBy(col("g"))
    },
    Some("""WITH ks AS (SELECT MAX(o_orderkey) // 2 AS k FROM orders),
      base AS (
        SELECT CAST(o_orderkey AS BIGINT) AS id,
          CAST(CAST(o_orderkey * 3 AS DECIMAL(16,2))
            + CAST(0.50 AS DECIMAL(3,2)) AS DECIMAL(16,2)) AS price
        FROM orders),
      v AS (SELECT * FROM base
        UNION ALL
        SELECT 5000000000, CAST(123456789012.25 AS DECIMAL(16,2))),
      kept AS (SELECT * FROM v WHERE NOT (id % 10 = 3))
      SELECT id % 7 AS g, COUNT(*) AS n,
        CAST(SUM(price) AS DOUBLE) AS s_price,
        CAST(SUM(id) AS BIGINT) AS id_sum
      FROM kept GROUP BY 1 ORDER BY 1"""))

  /** B2 MERGE `WHEN NOT MATCHED BY SOURCE` (r16): q148's clause trio
    * plus the by-source group — target rows absent from the batch
    * update ('Z'-flag the 5k-customers) or delete (the 5k+1s) in the
    * SAME one-commit merge, the sync-table-to-source shape
    * (generalizing the reference's conditional-put pipeline,
    * /root/reference/index.js:265-283, to full ANSI MERGE). Clause
    * order is first-true WITHIN each group. REQUIRED in-body: the
    * merge-on-read form commits exactly ONE `add_dv` version — no
    * pre-existing data file retires. Values hash against DuckDB
    * reconstructing all five clauses. */
  private val q193 = Q(
    "q193_merge_by_source",
    (s, dir) => {
      val o = t(s, dir, "orders").select(
        col("o_orderkey"), col("o_custkey"),
        col("o_totalprice").cast("decimal(18,2)").as("price"),
        col("o_orderstatus"))
      val root = scratch(s, dir, "mbs-log")
      val log = graft.sources.CommitLog(s, root)
      log.append(o.filter(col("o_orderkey") % 3 =!= 0))
      val v0 = log.snapshot().version
      val files0 = log.snapshot().files.toSet
      val src = o.filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"), col("o_custkey"),
          (col("price") * 2).cast("decimal(18,2)").as("price"),
          lit("M").as("o_orderstatus"))
      val priorFloor = s.conf.getOption("spark.graft.dv.minTouchedBytes")
      val priorRatio = s.conf.getOption("spark.graft.dv.maxRatio")
      s.conf.set("spark.graft.dv.minTouchedBytes", "0")
      s.conf.set("spark.graft.dv.maxRatio", "1.0")
      try log.merge(src, Seq("o_orderkey"), Seq(
        graft.sources.CommitLog.WhenMatchedDelete(
          Some(col("s.price") > 300000)),
        graft.sources.CommitLog.WhenMatchedUpdate(
          Map("price" -> col("s.price"), "o_orderstatus" -> col("s.o_orderstatus"))),
        graft.sources.CommitLog.WhenNotMatchedInsert(),
        graft.sources.CommitLog.WhenNotMatchedBySourceUpdate(
          Map("o_orderstatus" -> lit("Z")), Some(col("o_custkey") % 5 === 0)),
        graft.sources.CommitLog.WhenNotMatchedBySourceDelete(
          Some(col("o_custkey") % 5 === 1))))
      finally {
        priorFloor.fold(s.conf.unset("spark.graft.dv.minTouchedBytes"))(
          s.conf.set("spark.graft.dv.minTouchedBytes", _))
        priorRatio.fold(s.conf.unset("spark.graft.dv.maxRatio"))(
          s.conf.set("spark.graft.dv.maxRatio", _))
      }
      val snap = log.snapshot()
      require(snap.version == v0 + 1, "q193: the five-clause merge is ONE commit")
      require(files0.subsetOf(snap.files.toSet),
        "q193: merge-on-read must retire no pre-existing data file")
      require(snap.dvs.nonEmpty, "q193: the commit must carry deletion vectors")
      log.read()
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("price")).cast("double").as("revenue"),
          sum(col("o_orderkey")).as("key_sum"))
        .orderBy(col("o_orderstatus"))
    },
    Some("""WITH tgt AS (
        SELECT o_orderkey, o_custkey,
          CAST(o_totalprice AS DECIMAL(18,2)) AS price, o_orderstatus
        FROM orders WHERE o_orderkey % 3 <> 0),
      src AS (
        SELECT o_orderkey, o_custkey,
          CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 2 AS DECIMAL(18,2)) AS price,
          'M' AS o_orderstatus
        FROM orders WHERE o_orderkey % 2 = 0),
      merged AS (
        SELECT t.o_orderkey, t.o_custkey, s.price, s.o_orderstatus
        FROM tgt t JOIN src s ON t.o_orderkey = s.o_orderkey
        WHERE NOT (s.price > 300000)
        UNION ALL
        SELECT t.o_orderkey, t.o_custkey, t.price,
          CASE WHEN t.o_custkey % 5 = 0 THEN 'Z' ELSE t.o_orderstatus END
        FROM tgt t
        WHERE t.o_orderkey NOT IN (SELECT o_orderkey FROM src)
          AND NOT (t.o_custkey % 5 = 1)
        UNION ALL
        SELECT s.o_orderkey, s.o_custkey, s.price, s.o_orderstatus
        FROM src s WHERE s.o_orderkey NOT IN (SELECT o_orderkey FROM tgt))
      SELECT o_orderstatus, COUNT(*) AS n,
        CAST(SUM(price) AS DOUBLE) AS revenue,
        CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
      FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  /** B2/B4 PREDICATE-PRUNING COMPLETENESS (r16): three predicate
    * shapes that previously scanned everything now prune on manifest
    * evidence — `LIKE 'p%'` as a string range [p, upper(p)) over the
    * footer string stats (the reference's per-district key prefix
    * reads, /root/reference/index.js:305); `IS NULL` / `IS NOT NULL`
    * via the EXACT per-file null counts (a provably all-null or
    * no-null file never opens); null-safe `<=>` equality like plain
    * equality for non-null literals. REQUIRED in-body: the 'P-'
    * prefix read scans 1 of 3 status-banded files; IS NOT NULL skips
    * the all-null band; IS NULL skips the no-null band; the `<=>`
    * point read scans 1. Values hash against DuckDB replaying every
    * filter. */
  private val q194 = Q(
    "q194_pruning_completeness",
    (s, dir) => {
      val cat = "g194_" + java.lang.Integer.toHexString(dir.hashCode)
      val root = scratch(s, dir, "prune-wh")
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", root)
      val o = t(s, dir, "orders").select(
        col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .withColumn("tag", concat(col("o_orderstatus"), lit("-"),
          lpad(col("o_orderkey").cast("string"), 12, "0")))
        .withColumn("v",
          when(col("o_orderstatus") === "O", col("o_totalprice"))
            .when(col("o_orderstatus") === "P",
              when(col("o_orderkey") % 2 === 0, col("o_totalprice"))))
      // three status bands: F = v all null, O = v never null, P = mixed
      o.filter(col("o_orderstatus") === "F").coalesce(1)
        .writeTo(s"$cat.t").tableProperty("merge.log", "true").create()
      o.filter(col("o_orderstatus") === "O").coalesce(1)
        .writeTo(s"$cat.t").append()
      o.filter(col("o_orderstatus") === "P").coalesce(1)
        .writeTo(s"$cat.t").append()
      def scanned(df: DataFrame): Int =
        df.queryExecution.optimizedPlan.collect {
          case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
            graft.sources.GraftScans.unwrapFileScan(r.scan)
              .fileIndex.inputFiles.length
        }.sum
      val pref = s.table(s"$cat.t").filter(col("tag").startsWith("P-"))
      require(scanned(pref) == 1,
        s"q194: the 'P-' prefix must scan 1 file, scanned ${scanned(pref)}")
      val nn = s.table(s"$cat.t").filter(col("v").isNotNull)
      require(scanned(nn) == 2,
        s"q194: IS NOT NULL must skip the all-null band, scanned ${scanned(nn)}")
      val nl = s.table(s"$cat.t").filter(col("v").isNull)
      require(scanned(nl) == 2,
        s"q194: IS NULL must skip the no-null band, scanned ${scanned(nl)}")
      val kP = o.filter(col("o_orderstatus") === "P")
        .agg(max(col("o_orderkey"))).collect()(0).getLong(0)
      val tagP = "P-" + "%012d".format(kP)
      val nse = s.table(s"$cat.t").filter(col("tag") <=> tagP)
      require(scanned(nse) == 1,
        s"q194: the <=> point read must scan 1 file, scanned ${scanned(nse)}")
      import s.implicits._
      Seq((pref.count(), nn.count(),
          nn.agg(sum(col("v").cast("decimal(18,2)"))).collect()(0)
            .getDecimal(0).doubleValue,
          nl.count(), nse.count()))
        .toDF("n_pref", "n_nn", "s_nn", "n_null", "n_nse")
    },
    Some("""WITH base AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice,
          o_orderstatus || '-' ||
            lpad(CAST(o_orderkey AS VARCHAR), 12, '0') AS tag,
          CASE WHEN o_orderstatus = 'O' THEN o_totalprice
               WHEN o_orderstatus = 'P' AND o_orderkey % 2 = 0
                 THEN o_totalprice END AS v
        FROM orders),
      kp AS (SELECT MAX(o_orderkey) AS k FROM base WHERE o_orderstatus = 'P')
      SELECT
        (SELECT COUNT(*) FROM base WHERE tag LIKE 'P-%') AS n_pref,
        (SELECT COUNT(*) FROM base WHERE v IS NOT NULL) AS n_nn,
        (SELECT CAST(SUM(CAST(v AS DECIMAL(18,2))) AS DOUBLE) FROM base
          WHERE v IS NOT NULL) AS s_nn,
        (SELECT COUNT(*) FROM base WHERE v IS NULL) AS n_null,
        (SELECT COUNT(*) FROM base, kp
          WHERE tag = 'P-' || lpad(CAST(k AS VARCHAR), 12, '0')) AS n_nse"""))

  /** B6 SUM/AVG MANIFEST PUSHDOWN (r16): per-file EXACT sums
    * ([[graft.sources.CommitLog.withSumStats]]) make `SUM(price)` /
    * `AVG(qty)` — the last common aggregates that still scanned —
    * answer from the manifest with ZERO data files opened, global and
    * per-partition (the reference's daily revenue roll
    * (/root/reference/index.js:305-314) at 100 TB). Only order-
    * independent-exact types harvest (integrals, decimals); r17: AVG
    * over the DECIMAL money column folds too, replaying Spark's own
    * Divide+Cast over the exact manifest sum (pinned bit-exact against
    * a forced scan in-body); a deletion vector WITHOUT sum deltas
    * poisons the fold (a masked row's value is baked into the pre-mask
    * partial) and the query falls back to a correct scan — r17 pins
    * that legacy path with DV sum accounting disabled (the accounted
    * path is q196's). REQUIRED in-body: the global SUM/AVG folds to
    * LocalTableScan; the per-partition grouped SUM folds; after an
    * unaccounted DV delete the fold refuses and the scan answer
    * reflects the masked row. Values hash against DuckDB. */
  private val q195 = Q(
    "q195_sum_pushdown",
    (s, dir) => {
      val cat = "g195_" + java.lang.Integer.toHexString(dir.hashCode)
      val root = scratch(s, dir, "sums-wh")
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", root)
      val o = t(s, dir, "orders").select(
        col("o_orderkey"),
        col("o_orderstatus").as("st"),
        expr("CAST(o_orderkey * 3 AS DECIMAL(16,2)) + CAST(0.25 AS DECIMAL(3,2))")
          .cast("decimal(16,2)").as("price"),
        (col("o_orderkey") % 100L).cast("int").as("qty"))
      o.limit(0).writeTo(s"$cat.t").tableProperty("merge.log", "true")
        .tableProperty("merge.partcol", "st").create()
      val log = graft.sources.CommitLog(s, s"$root/t")
        .withSumStats(Seq("o_orderkey", "price", "qty"))
      // ONE partitioned append: one write job + one sum-harvest job,
      // landing one file per status partition
      log.appendPartitioned(o, "st")
      def planOf(df: DataFrame): String =
        df.queryExecution.executedPlan.toString
      val fold = s.table(s"$cat.t").agg(
        sum(col("o_orderkey")).as("s_key"), sum(col("price")).as("s_price"),
        avg(col("qty")).as("a_qty"), count(lit(1)).as("n"),
        avg(col("price")).as("a_price")) // r17: decimal AVG folds too
      require(planOf(fold).contains("LocalTableScan")
          && !planOf(fold).contains("BatchScan"),
        s"q195: global SUM/AVG must fold from the manifest:\n${planOf(fold)}")
      val fr = fold.collect()(0)
      // r17: the decimal-AVG fold replays Spark's own Divide+Cast over
      // the exact manifest sum — pin bit-exact parity against the real
      // scan (pushdown off), the data-independent form of the gate
      locally {
        val prior = s.conf.getOption("spark.graft.aggPushdown.enabled")
        s.conf.set("spark.graft.aggPushdown.enabled", "false")
        try {
          val scan = s.table(s"$cat.t").agg(avg(col("price")).as("a_price"))
          require(planOf(scan).contains("BatchScan"),
            s"q195: the parity probe must scan:\n${planOf(scan)}")
          val sv = scan.collect()(0).getDecimal(0)
          require(sv == fr.getDecimal(4),
            s"q195: decimal AVG fold ${fr.getDecimal(4)} != scan $sv")
        } finally prior.fold(s.conf.unset("spark.graft.aggPushdown.enabled"))(
          s.conf.set("spark.graft.aggPushdown.enabled", _))
      }
      val grouped = s.table(s"$cat.t").groupBy(col("st"))
        .agg(sum(col("price")).as("s_price")).orderBy(col("st"))
      require(planOf(grouped).contains("LocalTableScan")
          && !planOf(grouped).contains("BatchScan"),
        s"q195: the per-partition SUM must fold:\n${planOf(grouped)}")
      val gRows = grouped.collect()
      // a LEGACY DV (sum-delta accounting off — the r16 format, or any
      // DV a non-accounting writer committed) poisons the fold; the
      // fallback scan stays correct. The accounted path is q196's.
      val mx = o.agg(max(col("o_orderkey"))).collect()(0).getLong(0)
      val priorFloor = s.conf.getOption("spark.graft.dv.minTouchedBytes")
      val priorDeltas = s.conf.getOption("spark.graft.dv.sumDeltas.enabled")
      s.conf.set("spark.graft.dv.minTouchedBytes", "0")
      s.conf.set("spark.graft.dv.sumDeltas.enabled", "false")
      try log.delete(col("o_orderkey") === mx, partCol = Some("st"))
      finally {
        priorFloor.fold(s.conf.unset("spark.graft.dv.minTouchedBytes"))(
          s.conf.set("spark.graft.dv.minTouchedBytes", _))
        priorDeltas.fold(s.conf.unset("spark.graft.dv.sumDeltas.enabled"))(
          s.conf.set("spark.graft.dv.sumDeltas.enabled", _))
      }
      require(log.snapshot().dvs.nonEmpty, "q195: the delete must take the DV path")
      val after = s.table(s"$cat.t").agg(sum(col("o_orderkey")).as("s"))
      require(planOf(after).contains("BatchScan"),
        s"q195: a DV must refuse the sum fold:\n${planOf(after)}")
      val sAfter = after.collect()(0).getLong(0)
      import s.implicits._
      Seq((fr.getLong(0), fr.getDecimal(1).doubleValue, fr.getDouble(2),
          fr.getLong(3),
          gRows.map(r => s"${r.getString(0)}:${r.getDecimal(1).toPlainString}")
            .mkString(","),
          sAfter, fr.getDecimal(4).toPlainString))
        .toDF("s_key", "s_price", "a_qty", "n", "by_status", "s_after",
          "a_price")
    },
    // a_price replays Spark's decimal AVG in exact integer arithmetic:
    // price is DECIMAL(16,2), so Average divides the DECIMAL(26,2) sum
    // by the DECIMAL(20,0) count into Spark's adjusted DECIMAL(38,14)
    // (HALF_UP), then casts to DECIMAL(20,6) (HALF_UP again) — the
    // two-step rounding is replayed literally on HUGEINTs in cents
    Some("""WITH base AS (
        SELECT o_orderkey, o_orderstatus AS st,
          CAST(o_orderkey * 3 AS DECIMAL(16,2)) + CAST(0.25 AS DECIMAL(3,2)) AS price,
          CAST(o_orderkey % 100 AS INT) AS qty
        FROM orders),
      grouped AS (
        SELECT st, CAST(SUM(price) AS DECIMAL(26,2)) AS sp FROM base
        GROUP BY st ORDER BY st),
      cents AS (
        SELECT CAST(SUM(CAST(price * 100 AS HUGEINT)) AS HUGEINT) AS sc,
          CAST(COUNT(*) AS HUGEINT) AS cnt FROM base),
      q14 AS (SELECT (2 * sc * 1000000000000 + cnt) // (2 * cnt) AS v, cnt
        FROM cents),
      q6 AS (SELECT (2 * v + 100000000) // (2 * 100000000) AS v FROM q14)
      SELECT
        (SELECT CAST(SUM(o_orderkey) AS BIGINT) FROM base) AS s_key,
        (SELECT CAST(SUM(price) AS DOUBLE) FROM base) AS s_price,
        (SELECT CAST(SUM(qty) AS DOUBLE) / COUNT(*) FROM base) AS a_qty,
        (SELECT COUNT(*) FROM base) AS n,
        (SELECT string_agg(st || ':' || CAST(sp AS VARCHAR), ',' ORDER BY st)
          FROM grouped) AS by_status,
        (SELECT CAST(SUM(o_orderkey) AS BIGINT) FROM base
          WHERE o_orderkey <> (SELECT MAX(o_orderkey) FROM orders)) AS s_after,
        (SELECT CAST(v // 1000000 AS VARCHAR) || '.' ||
            lpad(CAST(v % 1000000 AS VARCHAR), 6, '0') FROM q6) AS a_price"""))

  /** B2/B6 DV SUM DELTAS (r17, VERDICT r16 #1): a merge-on-read DELETE
    * already materializes exactly the rows it masks, so the `add_dv`
    * commit restates each touched file's EXACT sum partials minus the
    * masked contributions (plus a live non-null count and a cumulative
    * accounting marker) — `SUM(price)` / `AVG(price)` / `COUNT(col)`
    * stay manifest-answerable across routine row-level DML instead of
    * degrading to scans until OPTIMIZE. On the reference's daily
    * revenue tables at 100 TB, the delete-then-report cycle keeps its
    * zero-files-opened roll. REQUIRED in-body: after TWO DV deletes
    * (same file at small SF — accumulation, pinned in SumStatsSpec —
    * or spread by the salted layout at larger SF: accounted either
    * way) the global SUM/AVG/COUNT fold
    * to LocalTableScan AND match a forced scan bit-for-bit; the
    * grouped SUM folds; a third, LEGACY DV (accounting off) flips the
    * fold back to an honest BatchScan. Values hash against DuckDB
    * replaying every delete. */
  private val q196 = Q(
    "q196_dv_sum_deltas",
    (s, dir) => {
      val cat = "g196_" + java.lang.Integer.toHexString(dir.hashCode)
      val root = scratch(s, dir, "dvsums-wh")
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", root)
      val o = t(s, dir, "orders").select(
        col("o_orderkey"),
        col("o_orderstatus").as("st"),
        expr("CAST(o_orderkey * 3 AS DECIMAL(16,2)) + CAST(0.25 AS DECIMAL(3,2))")
          .cast("decimal(16,2)").as("price"),
        when(col("o_orderkey") % 7 === 0, lit(null))
          .otherwise(col("o_orderkey") % 100L).cast("int").as("qty"))
      o.limit(0).writeTo(s"$cat.t").tableProperty("merge.log", "true")
        .tableProperty("merge.partcol", "st")
        .tableProperty("merge.sumstats", "o_orderkey,price,qty").create()
      // the property configures catalog-routed writes; this LIBRARY
      // instance spells the same config explicitly (q195's shape)
      val log = graft.sources.CommitLog(s, s"$root/t")
        .withSumStats(Seq("o_orderkey", "price", "qty"))
      log.appendPartitioned(o, "st")
      // two DV deletes in the SAME status band: at small SF they mask
      // one file twice (delta accumulation — pinned deterministically
      // in SumStatsSpec); at larger SF the salted partitioned write
      // may spread the band over several files and the masks land
      // separately — EITHER WAY both files' accounting must keep the
      // fold alive. kmin (any band) is the later legacy poison.
      val kr = o.agg(max(col("o_orderkey")).as("kmax"),
        min(col("o_orderkey")).as("kmin")).collect()(0)
      val (kmax, kmin) = (kr.getLong(0), kr.getLong(1))
      val stMax = o.filter(col("o_orderkey") === kmax)
        .select(col("st")).collect()(0).getString(0)
      val kmid = o.filter(col("st") === stMax && col("o_orderkey") < kmax)
        .agg(max(col("o_orderkey"))).collect()(0).getLong(0)
      val priorFloor = s.conf.getOption("spark.graft.dv.minTouchedBytes")
      s.conf.set("spark.graft.dv.minTouchedBytes", "0")
      try {
        log.delete(col("o_orderkey") === kmax, partCol = Some("st"))
        log.delete(col("o_orderkey") === kmid, partCol = Some("st"))
      } finally priorFloor.fold(s.conf.unset("spark.graft.dv.minTouchedBytes"))(
        s.conf.set("spark.graft.dv.minTouchedBytes", _))
      val snap = log.snapshot()
      require(snap.dvs.valuesIterator.flatten.map(_.count).sum == 2L,
        "q196: both deletes must take the DV path (2 masked rows)")
      def planOf(df: DataFrame): String =
        df.queryExecution.executedPlan.toString
      val fold = s.table(s"$cat.t").agg(
        sum(col("o_orderkey")).as("s_key"), sum(col("price")).as("s_price"),
        avg(col("price")).as("a_price"), count(col("qty")).as("n_qty"))
      require(planOf(fold).contains("LocalTableScan")
          && !planOf(fold).contains("BatchScan"),
        s"q196: accounted DVs must keep the fold alive:\n${planOf(fold)}")
      val fr = fold.collect()(0)
      val grouped = s.table(s"$cat.t").groupBy(col("st"))
        .agg(sum(col("price")).as("s_price")).orderBy(col("st"))
      require(planOf(grouped).contains("LocalTableScan")
          && !planOf(grouped).contains("BatchScan"),
        s"q196: the grouped SUM must fold post-DML:\n${planOf(grouped)}")
      val gRows = grouped.collect()
      // bit-exact parity with the real scan, all four aggregates
      locally {
        val prior = s.conf.getOption("spark.graft.aggPushdown.enabled")
        s.conf.set("spark.graft.aggPushdown.enabled", "false")
        try {
          val scan = s.table(s"$cat.t").agg(
            sum(col("o_orderkey")).as("s_key"), sum(col("price")).as("s_price"),
            avg(col("price")).as("a_price"), count(col("qty")).as("n_qty"))
          require(planOf(scan).contains("BatchScan"),
            s"q196: the parity probe must scan:\n${planOf(scan)}")
          val sr = scan.collect()(0)
          require(sr.getLong(0) == fr.getLong(0)
              && sr.getDecimal(1) == fr.getDecimal(1)
              && sr.getDecimal(2) == fr.getDecimal(2)
              && sr.getLong(3) == fr.getLong(3),
            s"q196: fold $fr != scan $sr")
        } finally prior.fold(s.conf.unset("spark.graft.aggPushdown.enabled"))(
          s.conf.set("spark.graft.aggPushdown.enabled", _))
      }
      // a legacy (unaccounted) DV re-poisons the fold — honest refusal
      val priorDeltas = s.conf.getOption("spark.graft.dv.sumDeltas.enabled")
      s.conf.set("spark.graft.dv.minTouchedBytes", "0")
      s.conf.set("spark.graft.dv.sumDeltas.enabled", "false")
      try log.delete(col("o_orderkey") === kmin, partCol = Some("st"))
      finally {
        priorFloor.fold(s.conf.unset("spark.graft.dv.minTouchedBytes"))(
          s.conf.set("spark.graft.dv.minTouchedBytes", _))
        priorDeltas.fold(s.conf.unset("spark.graft.dv.sumDeltas.enabled"))(
          s.conf.set("spark.graft.dv.sumDeltas.enabled", _))
      }
      val after = s.table(s"$cat.t").agg(sum(col("o_orderkey")).as("sk"))
      require(planOf(after).contains("BatchScan"),
        s"q196: a legacy DV must refuse the fold:\n${planOf(after)}")
      val sAfter = after.collect()(0).getLong(0)
      // r18 (VERDICT r17 #2): the accounting is no longer bounded to
      // the sum set — a SUMS-FREE table's DV delete restates a live
      // non-null count for EVERY column (packed nullness bitmask on
      // the same mask collect), so COUNT(nullable_col) keeps folding
      // from the manifest after row-level DML with no merge.sumstats
      o.limit(0).writeTo(s"$cat.t2").tableProperty("merge.log", "true")
        .create()
      val log2 = graft.sources.CommitLog(s, s"$root/t2")
      log2.append(o)
      s.conf.set("spark.graft.dv.minTouchedBytes", "0")
      try log2.delete(col("o_orderkey") === kmax)
      finally priorFloor.fold(s.conf.unset("spark.graft.dv.minTouchedBytes"))(
        s.conf.set("spark.graft.dv.minTouchedBytes", _))
      require(log2.snapshot().dvs.nonEmpty,
        "q196: the sums-free delete must take the DV path")
      val cnt2 = s.table(s"$cat.t2").agg(count(col("qty")).as("n2"))
      require(planOf(cnt2).contains("LocalTableScan")
          && !planOf(cnt2).contains("BatchScan"),
        s"q196: COUNT(col) must fold across a DV without sums:\n${planOf(cnt2)}")
      val n2 = cnt2.collect()(0).getLong(0)
      val sum2 = s.table(s"$cat.t2").agg(sum(col("o_orderkey")).as("s"))
      require(planOf(sum2).contains("BatchScan"),
        s"q196: no partials were harvested — SUM must refuse:\n${planOf(sum2)}")
      import s.implicits._
      Seq((fr.getLong(0), fr.getDecimal(1).doubleValue,
          fr.getDecimal(2).toPlainString, fr.getLong(3),
          gRows.map(r => s"${r.getString(0)}:${r.getDecimal(1).toPlainString}")
            .mkString(","),
          sAfter, n2))
        .toDF("s_key", "s_price", "a_price", "n_qty", "by_status", "s_after",
          "n2")
    },
    // a_price replays Spark's decimal AVG (DECIMAL(26,2) sum ÷
    // DECIMAL(20,0) count → adjusted DECIMAL(38,14), HALF_UP, cast to
    // DECIMAL(20,6), HALF_UP) in exact HUGEINT cents — q195's replay
    // over the post-delete live set
    Some("""WITH base AS (
        SELECT o_orderkey, o_orderstatus AS st,
          CAST(o_orderkey * 3 AS DECIMAL(16,2)) + CAST(0.25 AS DECIMAL(3,2)) AS price,
          CASE WHEN o_orderkey % 7 = 0 THEN NULL
               ELSE CAST(o_orderkey % 100 AS INT) END AS qty
        FROM orders),
      keysel AS (
        SELECT (SELECT MAX(o_orderkey) FROM base) AS kmax,
          (SELECT MIN(o_orderkey) FROM base) AS kmin),
      kmid AS (
        SELECT MAX(b.o_orderkey) AS v FROM base b, keysel k
        WHERE b.o_orderkey < k.kmax
          AND b.st = (SELECT st FROM base, keysel WHERE o_orderkey = kmax)),
      live AS (
        SELECT b.* FROM base b, keysel k, kmid m
        WHERE b.o_orderkey NOT IN (k.kmax, m.v)),
      grouped AS (
        SELECT st, CAST(SUM(price) AS DECIMAL(26,2)) AS sp FROM live
        GROUP BY st ORDER BY st),
      cents AS (
        SELECT CAST(SUM(CAST(price * 100 AS HUGEINT)) AS HUGEINT) AS sc,
          CAST(COUNT(*) AS HUGEINT) AS cnt FROM live),
      q14 AS (SELECT (2 * sc * 1000000000000 + cnt) // (2 * cnt) AS v, cnt
        FROM cents),
      q6 AS (SELECT (2 * v + 100000000) // (2 * 100000000) AS v FROM q14)
      SELECT
        (SELECT CAST(SUM(o_orderkey) AS BIGINT) FROM live) AS s_key,
        (SELECT CAST(SUM(price) AS DOUBLE) FROM live) AS s_price,
        (SELECT CAST(v // 1000000 AS VARCHAR) || '.' ||
            lpad(CAST(v % 1000000 AS VARCHAR), 6, '0') FROM q6) AS a_price,
        (SELECT COUNT(qty) FROM live) AS n_qty,
        (SELECT string_agg(st || ':' || CAST(sp AS VARCHAR), ',' ORDER BY st)
          FROM grouped) AS by_status,
        (SELECT CAST(SUM(o_orderkey) AS BIGINT) FROM live, keysel
          WHERE o_orderkey <> kmin) AS s_after,
        (SELECT COUNT(qty) FROM base, keysel
          WHERE o_orderkey <> kmax) AS n2"""))

  /** B2 WIDEN-BY-DDL + BLOOM ERA (r17, VERDICT r16 #2/#6): `ALTER
    * TABLE … ALTER COLUMN <c> TYPE <wider>` routes through the r16
    * widening lattice as ONE metadata-only commit — the standard
    * lakehouse habit of widening BEFORE the backfill arrives (Delta
    * 3.x ALTER COLUMN TYPE, Iceberg updateColumn; the reference's
    * long-lived daily tables are exactly the ones that outgrow int
    * ids). And a string-shifting widen no longer voids bloom evidence
    * forever: filters carry their hash-time ERA, so files written
    * AFTER a float→double widen keep bloom-pruning point reads — only
    * pre-widen bits stay void. REQUIRED in-body: the DDL widen
    * rewrites zero files; a narrow append upcasts; `ALTER COLUMN TYPE
    * STRING` (and a narrowing) refuse with the schema untouched; a
    * point probe keeps the pre-widen file, keeps the holder, and
    * EXCLUDES a post-widen file on its same-era bloom. Values hash
    * against DuckDB replaying the backfill. */
  private val q197 = Q(
    "q197_widen_ddl",
    (s, dir) => {
      val cat = "g197_" + java.lang.Integer.toHexString(dir.hashCode)
      val root = scratch(s, dir, "widen-wh")
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", root)
      val o = t(s, dir, "orders").select(
        col("o_orderkey").cast("int").as("id"),
        col("o_orderstatus").as("st"))
      o.filter(col("st") === "F").coalesce(1)
        .writeTo(s"$cat.t").tableProperty("merge.log", "true").create()
      o.filter(col("st") === "O").coalesce(1).writeTo(s"$cat.t").append()
      val log = graft.sources.CommitLog(s, s"$root/t")
      require(s.table(s"$cat.t").schema("id").dataType
        == org.apache.spark.sql.types.IntegerType, "q197: id must start int")
      val filesBefore = log.snapshot().files.toSet
      // widen BEFORE any wide value exists — one metadata-only commit
      s.sql(s"ALTER TABLE $cat.t ALTER COLUMN id TYPE BIGINT")
      require(s.table(s"$cat.t").schema("id").dataType
        == org.apache.spark.sql.types.LongType, "q197: DDL must widen id")
      require(filesBefore.subsetOf(log.snapshot().files.toSet),
        "q197: the DDL widen must rewrite zero files")
      // a narrow (still-int) append upcasts; then the backfill lands
      o.filter(col("st") === "P").coalesce(1).writeTo(s"$cat.t").append()
      o.filter(col("id") % 1000 === 7)
        .select((col("id").cast("long") + 5000000000L).as("id"), col("st"))
        .coalesce(1).writeTo(s"$cat.t").append()
      // non-widening DDL refuses loudly; the schema stays long
      val refused = Seq("STRING", "INT").count { ty =>
        scala.util.Try(s.sql(s"ALTER TABLE $cat.t ALTER COLUMN id TYPE $ty"))
          .isFailure
      }
      require(refused == 2, "q197: STRING and INT must both refuse")
      require(s.table(s"$cat.t").schema("id").dataType
        == org.apache.spark.sql.types.LongType,
        "q197: a refused ALTER must leave the schema untouched")
      // BLOOM ERA: pre-widen bits void, post-widen bits still exclude
      val log2 = graft.sources.CommitLog(s, s"$root/t2")
        .withBloomIndex(Seq("pf"))
      import s.implicits._
      log2.append(Seq(0.1f, 2.5f).toDF("pf").coalesce(1)) // A: era-0 bits
      log2.widenColumnType(Seq("pf"), org.apache.spark.sql.types.DoubleType)
      val filesA = log2.snapshot().files.toSet
      log2.append(Seq(0.7, 2.9).toDF("pf").coalesce(1))   // B: holds 0.7
      val filesAB = log2.snapshot().files.toSet
      log2.append(Seq(0.65, 2.2).toDF("pf").coalesce(1))  // C: covers 0.7
      val fA = filesA.head
      val fB = (filesAB -- filesA).head
      val fC = (log2.snapshot().files.toSet -- filesAB).head
      val cands = log2.pointCandidateFiles("pf", 0.7).toSet
      require(cands.contains(fA) && cands.contains(fB) && !cands.contains(fC),
        s"q197: era pruning must keep {A,B} and exclude C, got $cands")
      val found = log2.readPoint("pf", 0.1f.toDouble).count()
      val agg = s.table(s"$cat.t").agg(
        count(lit(1)).as("n"), sum(col("id")).as("s_id"),
        sum(when(col("id") > 4000000000L, 1L).otherwise(0L)).as("n_wide"))
        .collect()(0)
      Seq((agg.getLong(0), agg.getLong(1), agg.getLong(2), found))
        .toDF("n", "s_id", "n_wide", "found")
    },
    Some("""WITH base AS (
        SELECT CAST(o_orderkey AS BIGINT) AS id, o_orderstatus AS st
        FROM orders),
      merged AS (
        SELECT id, st FROM base
        UNION ALL
        SELECT id + 5000000000 AS id, st FROM base WHERE id % 1000 = 7)
      SELECT COUNT(*) AS n,
        CAST(SUM(id) AS BIGINT) AS s_id,
        CAST(SUM(CASE WHEN id > 4000000000 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_wide,
        CAST(1 AS BIGINT) AS found
      FROM merged"""))

  /** B2 PARTITION-SPEC EVOLUTION (r18, VERDICT r17 #1): `ALTER TABLE …
    * SET TBLPROPERTIES('merge.partcol'='hours(ts)')` on a populated
    * days(ts) table is ONE metadata commit — Iceberg's spec evolution,
    * not a rewrite. The manifest keeps an append-only spec registry
    * and a per-file spec id; old files keep their day tags, new writes
    * land under hours, and every tag consumer judges each file under
    * ITS spec. The reference's prices table
    * (/root/reference/index.js:333-337) is exactly the long-lived
    * growing table that outgrows a day layout. REQUIRED in-body: the
    * DDL rewrites ZERO files and seeds the registry; a day-aligned
    * filtered COUNT over a MIXED day-file + hour-file selection still
    * folds from the manifest (per-spec exactness); partition-scoped
    * merge AND optimize refuse on the mix with a pointer to
    * migrateSpec; migrateSpec rewrites exactly the stale files; the
    * scoped merge then lands across the boundary. Values hash against
    * DuckDB replaying the whole lifecycle. */
  private val q198 = Q(
    "q198_partition_spec_evolution",
    (s, dir) => {
      val cat = "g198_" + java.lang.Integer.toHexString(dir.hashCode)
      val root = scratch(s, dir, "psev-wh")
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", root)
      val base = t(s, dir, "events")
        .filter(expr("CAST(ts AS DATE) BETWEEN DATE '2024-01-03' AND DATE '2024-01-06'"))
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
      // the builds need INT64 MICROS ts stats for file pruning (q181's
      // pattern — Verify runs under an INT96 dump override)
      val priorTsType = s.conf.get("spark.sql.parquet.outputTimestampType")
      s.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      try {
        base.limit(0).writeTo(s"$cat.t")
          .tableProperty("merge.log", "true")
          .tableProperty("merge.partcol", "days(ts)").create()
        base.filter(expr("CAST(ts AS DATE) <= DATE '2024-01-04'"))
          .writeTo(s"$cat.t").append() // 2 day-partitioned files
        val log = graft.sources.CommitLog(s, s"$root/t")
        val before = log.snapshot()
        require(before.specs.isEmpty, "q198: no registry before evolution")
        s.sql(s"ALTER TABLE $cat.t SET TBLPROPERTIES('merge.partcol'='hours(ts)')")
        val evolved = log.snapshot()
        require(evolved.files.toSet == before.files.toSet,
          "q198: spec evolution must rewrite ZERO data files")
        require(evolved.specs == Seq("days(ts)", "hours(ts)"),
          s"q198: registry must seed [days, hours], got ${evolved.specs}")
        // days 5-6 arrive under the NEW spec via the ordinary write
        base.filter(expr("CAST(ts AS DATE) > DATE '2024-01-04'"))
          .writeTo(s"$cat.t").append()
        val mixed = log.snapshot()
        val dayFiles = mixed.files.filter(f => mixed.specIdOf(f) == 0).toSet
        require(dayFiles == before.files.toSet
            && mixed.files.exists(f => mixed.specIdOf(f) == 1),
          "q198: old files keep spec 0, new files stamp spec 1")
        // a day-aligned range selects ONE day file + 24 hour files —
        // judged each under ITS OWN spec, the filter is exact and the
        // COUNT folds from the manifest across the mix
        def planOf(df: DataFrame): String =
          df.queryExecution.executedPlan.toString
        val foldQ = s.table(s"$cat.t")
          .filter(expr("CAST(ts AS DATE) BETWEEN DATE '2024-01-04' AND DATE '2024-01-05'"))
          .agg(count(lit(1)).as("n"))
        val foldN = foldQ.collect()(0).getLong(0)
        require(planOf(foldQ).contains("LocalTableScan")
            && !planOf(foldQ).contains("BatchScan"),
          s"q198: the mixed-spec day-range COUNT must fold:\n${planOf(foldQ)}")
        // partition-SCOPED ops refuse on the mix, crisply
        val updates = base
          .filter(expr("CAST(ts AS DATE) = DATE '2024-01-03' AND event_id % 7 = 0"))
          .select(col("event_id"), col("ts"),
            (col("user_id") + 10000000000L).as("user_id"),
            col("event_type"), col("value"))
        val eMerge = scala.util.Try(log.upsertPartitioned(updates,
          Seq("event_id", "ts"), graft.sources.CommitLog.LastWins, "hours(ts)"))
        require(eMerge.isFailure
            && eMerge.failed.get.getMessage.contains("migrateSpec"),
          "q198: scoped merge must refuse on mixed specs")
        val eOpt = scala.util.Try(log.optimizePartitions("hours(ts)"))
        require(eOpt.isFailure
            && eOpt.failed.get.getMessage.contains("migrateSpec"),
          "q198: scoped optimize must refuse on mixed specs")
        // the incremental repair rewrites EXACTLY the stale day files
        val (_, migrated) = log.migrateSpec()
        require(migrated == dayFiles.size,
          s"q198: migrate must rewrite the ${dayFiles.size} stale files, did $migrated")
        val post = log.snapshot()
        require(post.files.forall(f => post.specIdOf(f) == 1),
          "q198: post-migration every file is current-spec")
        require((post.files.toSet intersect dayFiles).isEmpty
            && (mixed.files.toSet -- dayFiles).subsetOf(post.files.toSet),
          "q198: only the stale files moved")
        // scoped merge and optimize now work across the boundary
        log.upsertPartitioned(updates, Seq("event_id", "ts"),
          graft.sources.CommitLog.LastWins, "hours(ts)")
        log.optimizePartitions("hours(ts)")
      } finally
        s.conf.set("spark.sql.parquet.outputTimestampType", priorTsType)
      val out = s.table(s"$cat.t")
        .groupBy(expr("CAST(ts AS DATE)").as("d"))
        .agg(count(lit(1)).as("n"), sum(col("event_id")).as("s_eid"),
          sum(col("user_id")).as("s_uid"))
        .orderBy(col("d"))
      out
    },
    Some("""WITH base AS (
        SELECT event_id, ts, user_id FROM events
        WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-03' AND DATE '2024-01-06'),
      merged AS (
        SELECT event_id, ts,
          CASE WHEN CAST(ts AS DATE) = DATE '2024-01-03' AND event_id % 7 = 0
               THEN user_id + 10000000000 ELSE user_id END AS user_id
        FROM base)
      SELECT CAST(ts AS DATE) AS d, COUNT(*) AS n,
        CAST(SUM(event_id) AS BIGINT) AS s_eid,
        CAST(SUM(user_id) AS BIGINT) AS s_uid
      FROM merged GROUP BY 1 ORDER BY 1"""))

  /** B14 CDC ROW LINEAGE (r18, VERDICT r17 #4): a merge-on-read SQL
    * MERGE's updates arrive in `readChanges(lineage = true)` as
    * `update_preimage`/`update_postimage` pairs linked by a stable
    * `_row_id` (pre-image file basename # row ordinal, carried through
    * the replacement files as a hidden physical column) — a consumer
    * applies updates WITHOUT re-keying. Insert-clause rows stay plain
    * inserts with no id; the default feed keeps the r17 delete+insert
    * wire byte-for-byte. REQUIRED in-body: exact per-type counts; the
    * pre/post id sets are equal and the keyless id-join reproduces the
    * +100 re-price on every pair; MatView consumes the lineage feed
    * unchanged — the view IS the query output, so the oracle hash is
    * the view-vs-direct-aggregate proof (ResampleSync never reads
    * `_change_type` — type-agnostic by construction). */
  private val q199 = Q(
    "q199_cdc_row_lineage",
    (s, dir) => {
      val cat = "g199_" + java.lang.Integer.toHexString(dir.hashCode)
      val root = scratch(s, dir, "cdclin-wh")
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", root)
      val o = t(s, dir, "orders").filter(col("o_orderkey") % 4 === 1)
        .select(col("o_orderkey"), col("o_orderstatus").as("st"),
          col("o_totalprice").cast("decimal(18,2)").as("price"))
      o.writeTo(s"$cat.t").tableProperty("merge.log", "true").create()
      val log = graft.sources.CommitLog(s, s"$root/t")
      val v0 = log.snapshot().version
      o.filter(col("o_orderkey") % 13 === 0)
        .select(col("o_orderkey"), col("st"),
          (col("price") + 100).cast("decimal(18,2)").as("price"))
        .union(o.filter(col("o_orderkey") % 17 === 0)
          .select((col("o_orderkey") + 100000000L).as("o_orderkey"),
            lit("Z").as("st"),
            expr("CAST(1.50 AS DECIMAL(18,2))").as("price")))
        .createOrReplaceTempView("q199_src")
      val priorFloor = s.conf.getOption("spark.graft.dv.minTouchedBytes")
      s.conf.set("spark.graft.dv.minTouchedBytes", "0")
      try s.sql(s"""MERGE INTO $cat.t t USING q199_src s
        ON t.o_orderkey = s.o_orderkey
        WHEN MATCHED THEN UPDATE SET price = s.price
        WHEN NOT MATCHED THEN INSERT *""")
      finally priorFloor.fold(s.conf.unset("spark.graft.dv.minTouchedBytes"))(
        s.conf.set("spark.graft.dv.minTouchedBytes", _))
      require(log.snapshot().dvs.nonEmpty,
        "q199: the merge must take the merge-on-read path")
      val counts = o.agg(
        sum(when(col("o_orderkey") % 13 === 0, 1L).otherwise(0L)),
        sum(when(col("o_orderkey") % 17 === 0, 1L).otherwise(0L))).collect()(0)
      val (nUpd, nIns) = (counts.getLong(0), counts.getLong(1))
      // the feed drives three probes — materialize it once
      val feed = log.readChanges(v0, lineage = true).localCheckpoint()
      try {
        // one job: per-type counts AND the no-id-on-insert invariant
        val byType = feed.groupBy(col("_change_type"))
          .agg(count(lit(1)).as("c"),
            sum(when(col("_row_id").isNotNull, 1L).otherwise(0L)).as("withId"))
          .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
        require(byType == Map("update_preimage" -> (nUpd, nUpd),
            "update_postimage" -> (nUpd, nUpd), "insert" -> (nIns, 0L)),
          s"q199: expected $nUpd linked pairs + $nIns id-less inserts, got $byType")
        val pre = feed.filter(col("_change_type") === "update_preimage")
          .select(col("_row_id"), col("price").as("old_p"))
        val post = feed.filter(col("_change_type") === "update_postimage")
          .select(col("_row_id"), col("price").as("new_p"))
        // NO data key — the id links; one job checks pairing + re-price
        val lr = pre.join(post, "_row_id").agg(count(lit(1)).as("n"),
          sum(when(expr("new_p <> CAST(old_p + 100 AS DECIMAL(18,2))"), 1L)
            .otherwise(0L)).as("bad")).collect()(0)
        require(lr.getLong(0) == nUpd && lr.getLong(1) == 0L,
          "q199: the keyless id-join must pair every update and reproduce the re-price")
      } finally graft.util.Ckpt.release(feed)
      // the DEFAULT feed keeps the r17 wire: delete+insert, no _row_id
      val plain = log.readChanges(v0)
      require(!plain.columns.contains("_row_id")
          && plain.select(col("_change_type")).distinct().collect()
            .map(_.getString(0)).toSet == Set("insert", "delete"),
        "q199: the default feed must stay the delete+insert wire")
      // MatView consumes the lineage feed unchanged, keyless
      graft.operators.MatView.applyDelta(s, s"$root/view",
        log.readChanges(-1L, lineage = true), Seq("st"), Seq("price"))
      // the VIEW is the query output: the DuckDB oracle replays the
      // merge directly, so the hash gate IS the view-vs-direct proof
      graft.sources.CommitLog(s, s"$root/view").read()
        .select(col("st"), col("n"),
          col("sum_price").cast("double").as("s_price"))
        .orderBy(col("st"))
    },
    Some("""WITH base AS (
        SELECT o_orderkey, o_orderstatus AS st,
          CAST(o_totalprice AS DECIMAL(18,2)) AS price
        FROM orders WHERE o_orderkey % 4 = 1),
      merged AS (
        SELECT o_orderkey, st,
          CASE WHEN o_orderkey % 13 = 0
               THEN CAST(price + 100 AS DECIMAL(18,2)) ELSE price END AS price
        FROM base
        UNION ALL
        SELECT o_orderkey + 100000000 AS o_orderkey, 'Z' AS st,
          CAST(1.50 AS DECIMAL(18,2)) AS price
        FROM base WHERE o_orderkey % 17 = 0)
      SELECT st, COUNT(*) AS n, CAST(SUM(price) AS DOUBLE) AS s_price
      FROM merged GROUP BY st ORDER BY st"""))

  /** B12 VARIANT open-shape columns (r18, VERDICT r17 #6 stretch): the
    * reference's loosely-typed objects (`Morada`, `HorarioPosto` —
    * /root/reference/index.js:129-131) map to Spark 4's `VariantType`:
    * `parse_json` at ingest, `variant_get` typed extraction at query,
    * rows free to carry DIFFERENT shapes (a nested object on one row,
    * an array on the next) with no schema migration. The variant
    * column round-trips the commit log (write, read, time travel) like
    * any other type. Manifest honesty, pinned in-body: a variant
    * column harvests NO footer stats (there is no shredding yet), so
    * nothing about `variant_get` can prune or fold — absence refuses,
    * every file survives, a filtered read scans. Values hash against
    * DuckDB replaying the extraction semantics over the same rows. */
  private val q200 = Q(
    "q200_variant_open_shape",
    (s, dir) => {
      val cat = "g200_" + java.lang.Integer.toHexString(dir.hashCode)
      val root = scratch(s, dir, "variant-wh")
      s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.warehouse", root)
      val base = t(s, dir, "events").select(
        col("event_id"), col("user_id"), col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      // two SHAPES in one column: clicks/views carry a nested object,
      // everything else an array — the open-shape case a fixed schema
      // cannot hold without null-padding both branches
      val js = when(col("event_type").isin("click", "view"),
          concat(lit("{\"k\":"), col("k"),
            lit(",\"nested\":{\"u\":"), col("user_id"), lit("}}")))
        .otherwise(concat(lit("{\"k\":"), col("k"),
          lit(",\"arr\":["), col("user_id"), lit(","),
          col("user_id") * 2, lit("]}")))
      base.select(col("event_id"), col("event_type"),
          parse_json(js).as("v"))
        .writeTo(s"$cat.t").tableProperty("merge.log", "true").create()
      val log = graft.sources.CommitLog(s, s"$root/t")
      val snap = log.snapshot()
      require(snap.files.nonEmpty && snap.stats.valuesIterator.forall(m =>
          !m.keysIterator.exists(kk => kk == "v" || kk.startsWith("v."))),
        "q200: a variant column must harvest NO stats (no shredding " +
          "— absence refuses, conservative)")
      // typed extraction: missing paths yield NULL, never an error —
      // each shape's branch reads its own fields
      val out = s.table(s"$cat.t").select(col("event_type"),
          variant_get(col("v"), "$.k", "long").as("kk"),
          variant_get(col("v"), "$.nested.u", "long").as("nu"),
          variant_get(col("v"), "$.arr[1]", "long").as("a1"))
      out.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("kk")).as("s_k"),
          count(col("nu")).as("n_nested"), sum(col("a1")).as("s_arr"),
          sum(when(col("kk") >= 50L, 1L).otherwise(0L)).as("n_k50"))
        .orderBy(col("event_type"))
    },
    Some("""WITH base AS (
        SELECT event_type,
          CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
          CASE WHEN event_type IN ('click', 'view') THEN user_id END AS nu,
          CASE WHEN event_type NOT IN ('click', 'view') THEN user_id * 2 END AS a1
        FROM events)
      SELECT event_type, COUNT(*) AS n,
        CAST(SUM(k) AS BIGINT) AS s_k,
        COUNT(nu) AS n_nested,
        CAST(SUM(a1) AS BIGINT) AS s_arr,
        CAST(SUM(CASE WHEN k >= 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_k50
      FROM base GROUP BY event_type ORDER BY event_type"""))

  val qs: Seq[Q] = Seq(q133, q134, q135, q136, q137, q138, q141, q143, q144, q145,
    q148, q149, q150, q154, q155, q156, q157, q159, q160, q162, q165, q166, q167,
    q168, q169, q170, q171, q172, q173, q174, q175, q176, q177, q178, q179, q180,
    q181, q182, q183, q184, q185, q186, q187, q188, q189, q190, q191, q192, q193,
    q194, q195, q196, q197, q198, q199, q200)
}
