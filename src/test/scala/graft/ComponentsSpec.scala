package graft

import org.apache.spark.sql.functions._
import graft.operators.Components

/** Connected-components / cluster-dedup correctness: propagation result
  * vs a driver-side union-find oracle on random graphs, convergence
  * behavior, and the fail-fast bound. */
class ComponentsSpec extends SparkSpecBase {
  import spark.implicits._

  /** Driver-side union-find ground truth. */
  private def ufComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("components match union-find on random graphs") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 3) {
      val n = 60
      val edges = (0 until 80).map { _ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      }.filter { case (a, b) => a != b }.distinct
      val got = Components.connectedComponents(
          edges.toDF("a", "b"), "a", "b")
        .as[(Long, Long)].collect().toMap
      val want = ufComponents(edges)
      assert(got === want, s"trial $trial")
    }
  }

  test("a path graph converges (diameter-bounded rounds) to one component") {
    // 0-1-2-...-19: worst case for propagation, diameter 19
    val edges = (0L until 19L).map(i => (i, i + 1)).toDF("a", "b")
    val cc = Components.connectedComponents(edges, "a", "b", maxIter = 25)
      .as[(Long, Long)].collect().toMap
    assert(cc.size === 20 && cc.values.toSet === Set(0L))
  }

  test("maxIter fails fast with a diagnosable message") {
    val edges = (0L until 10L).map(i => (i, i + 1)).toDF("a", "b")
    val e = intercept[IllegalStateException] {
      Components.connectedComponents(edges, "a", "b", maxIter = 2)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("star contraction matches union-find on random graphs") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 3) {
      val n = 60
      val edges = (0 until 80).map { _ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      }.filter { case (a, b) => a != b }.distinct
      val got = Components.connectedComponentsStar(
          edges.toDF("a", "b"), "a", "b")
        .as[(Long, Long)].collect().toMap
      assert(got === ufComponents(edges), s"trial $trial")
    }
  }

  test("star contraction converges on a 10k-node chain in O(log n) rounds") {
    // The adversarial case for propagation: diameter 9999, which would
    // need 9999 label-prop rounds. Star contraction must close it inside
    // a logarithmic budget (2·log2(10k) ≈ 27; maxIter 30 fails fast
    // if the bound doesn't hold).
    val n = 10000L
    val edges = spark.range(n - 1).select($"id".as("a"), ($"id" + 1).as("b"))
    val cc = Components.connectedComponentsStar(edges, "a", "b", maxIter = 30)
    assert(cc.filter($"component" =!= 0L).isEmpty)
    assert(cc.count() === n)
  }

  test("star contraction handles self-loops, isolated-by-loop nodes, empty input") {
    val withLoops = Seq((3L, 3L), (1L, 2L)).toDF("a", "b")
    val cc = Components.connectedComponentsStar(withLoops, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(cc === Map(1L -> 1L, 2L -> 1L, 3L -> 3L))
    val empty = Components.connectedComponentsStar(
      Seq.empty[(Long, Long)].toDF("a", "b"), "a", "b")
    assert(empty.isEmpty)
  }

  test("clusterDedup labels every doc, keeps exactly one canonical per cluster") {
    val docs = (0L until 12L).toDF("id")
    // two clusters {0,1,2}, {5,6}; rest singletons
    val pairs = Seq((1L, 2L), (0L, 1L), (5L, 6L)).toDF("a_id", "b_id")
    val out = Components.clusterDedup(docs, "id", pairs, "a_id", "b_id")
      .select($"id", $"cluster_id", $"cluster_size", $"is_canonical")
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1)
    assert(out.length === 12)
    val byId = out.map(r => r._1 -> r).toMap
    assert(byId(0L) === ((0L, 0L, 3L, true)))
    assert(byId(1L) === ((1L, 0L, 3L, false)))
    assert(byId(2L) === ((2L, 0L, 3L, false)))
    assert(byId(5L) === ((5L, 5L, 2L, true)))
    assert(byId(6L) === ((6L, 5L, 2L, false)))
    // singletons are their own canonical cluster of size 1
    assert(byId(7L) === ((7L, 7L, 1L, true)))
    assert(out.count(_._4) === 9) // 2 multi-clusters + 7 singletons... 12-3=9 keepers
    // exactly one canonical per cluster
    val canonPerCluster = out.groupBy(_._2).map { case (_, rs) => rs.count(_._4) }
    assert(canonPerCluster.forall(_ === 1))
  }
}
