package graft

import org.apache.spark.sql.functions._

import graft.operators.GraphRank

/** PageRank: the distributed iteration must match an independent
  * single-machine model of the same integer recurrence, and the
  * documented semantics (dangling mass drops, multi-edge contributes
  * multiply) must hold. */
class GraphRankSpec extends SparkSpecBase {
  import spark.implicits._

  /** Straight-line reference model of the documented recurrence:
    * r0 = scale; r_{k+1}(v) = base + Σ_{u→v} (17·r_k(u)) / (20·od(u))
    * with truncating division — maps and loops, no Spark. */
  private def model(edges: Seq[(Long, Long)], iterations: Int,
      scale: Long = 1000000000L): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val od = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val base = scale * 3 / 20
    var r = nodes.map(_ -> scale).toMap
    for (_ <- 1 to iterations) {
      val in = edges.groupBy(_._2).view.mapValues(_.map { case (u, _) =>
        (17L * r(u)) / (20L * od(u))
      }.sum).toMap
      r = nodes.map(n => n -> (base + in.getOrElse(n, 0L))).toMap
    }
    r
  }

  private def run(edges: Seq[(Long, Long)], iterations: Int): Map[Long, Long] =
    GraphRank.pageRank(edges.toDF("s", "d"), "s", "d", iterations)
      .as[(Long, Long)].collect().toMap

  test("pageRank matches the reference model on a cycle with a dangling sink") {
    // 1→2→3→1 cycle, 4→2 feeder, 1→5 dangling sink (5 has no out-edges:
    // its rank mass drops, nothing redistributes)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 2L), (1L, 5L))
    for (k <- Seq(1, 3, 7))
      assert(run(edges, k) === model(edges, k), s"iterations=$k")
  }

  test("pageRank on a star concentrates rank in the hub; multi-edges add") {
    val star = (2L to 20L).map(i => (i, 1L))
    val got = run(star, 3)
    assert(got === model(star, 3))
    assert(got(1L) === got.maxBy(_._2)._2)
    // duplicated edges contribute twice (documented: distinct() first
    // for a simple graph)
    val dup = star ++ Seq((2L, 1L))
    assert(run(dup, 2) === model(dup, 2))
  }
}
