package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Link-graph analytics over the fixture's customer→supplier purchase
  * graph — the corpus-curation authority signal family
  * ([[graft.operators.GraphRank]]). */
object GraphQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  /** C∘ PageRank over the bipartite customer→supplier graph (edge =
    * "this customer bought from this supplier", distinct): 3 exact
    * integer iterations ([[graft.operators.GraphRank.pageRank]] — Long
    * micro-units, truncating rational damping, so the unrolled-CTE
    * oracle replays every iteration hash-exactly). Ids are disjoint by
    * parity (customers even, suppliers odd). */
  private val q139 = Q(
    "q139_pagerank",
    (s, dir) => {
      val edges = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
        .join(t(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).cast("long").as("src"),
          (col("l_suppkey") * 2 + 1).cast("long").as("dst"))
        .distinct()
      graft.operators.GraphRank.pageRank(edges, "src", "dst", iterations = 3)
        .orderBy(col("id"))
    },
    Some("""WITH edges AS (
        SELECT DISTINCT CAST(o_custkey * 2 AS BIGINT) AS src,
          CAST(l_suppkey * 2 + 1 AS BIGINT) AS dst
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
      deg AS (SELECT src, COUNT(*) AS od FROM edges GROUP BY src),
      nodes AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges),
      r0 AS (SELECT id, CAST(1000000000 AS BIGINT) AS r FROM nodes),
      c1 AS (SELECT e.dst AS id, SUM((17 * r.r) // (20 * d.od)) AS s
             FROM edges e JOIN r0 r ON r.id = e.src JOIN deg d ON d.src = e.src
             GROUP BY e.dst),
      r1 AS (SELECT n.id, CAST(150000000 + COALESCE(c1.s, 0) AS BIGINT) AS r
             FROM nodes n LEFT JOIN c1 ON c1.id = n.id),
      c2 AS (SELECT e.dst AS id, SUM((17 * r.r) // (20 * d.od)) AS s
             FROM edges e JOIN r1 r ON r.id = e.src JOIN deg d ON d.src = e.src
             GROUP BY e.dst),
      r2 AS (SELECT n.id, CAST(150000000 + COALESCE(c2.s, 0) AS BIGINT) AS r
             FROM nodes n LEFT JOIN c2 ON c2.id = n.id),
      c3 AS (SELECT e.dst AS id, SUM((17 * r.r) // (20 * d.od)) AS s
             FROM edges e JOIN r2 r ON r.id = e.src JOIN deg d ON d.src = e.src
             GROUP BY e.dst),
      r3 AS (SELECT n.id, CAST(150000000 + COALESCE(c3.s, 0) AS BIGINT) AS r
             FROM nodes n LEFT JOIN c3 ON c3.id = n.id)
      SELECT id, r FROM r3 ORDER BY id"""))

  val qs: Seq[Q] = Seq(q139)
}
