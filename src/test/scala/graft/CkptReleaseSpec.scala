package graft

import org.apache.spark.sql.functions._

import graft.operators.{Components, ExactQuantile, GraphRank, Robust, Tokenize}
import graft.util.Ckpt

/** VERDICT r14 #1: localCheckpoint blocks must not outlive the operator
  * that allocated them. Each test runs a checkpoint-heavy operator
  * repeatedly in the one shared session and asserts the persistent-RDD
  * set returns to baseline — either immediately (driver-side results)
  * or after `Ckpt.release(result)` (results that legitimately read a
  * checkpoint). A shared long-lived session (the driver's 179-query
  * bench, a production pipeline) otherwise accumulates dead blocks for
  * hours and degrades under block-manager pressure. */
class CkptReleaseSpec extends SparkSpecBase {

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("global exact quantiles leave no persisted RDDs behind") {
    val df = docs.select(length(col("text")).cast("double").as("len"))
    val baseline = Ckpt.persistedIds(spark)
    (1 to 3).foreach { _ =>
      val qs = ExactQuantile.quantiles(df, "len", Seq(0.25, 0.5, 0.75))
      assert(qs.size == 3)
    }
    assert(Ckpt.persistedIds(spark) == baseline,
      "quantiles() must release every checkpoint it allocates")
  }

  test("grouped quantiles (driver engine) leave no persisted RDDs behind") {
    val df = docs.select(col("lang"), length(col("text")).cast("double").as("len"))
    val baseline = Ckpt.persistedIds(spark)
    (1 to 3).foreach { _ =>
      val out = ExactQuantile.quantilesByGroup(
        df, Seq("lang"), "len", Seq(0.5), Seq("p50"))
      assert(out.count() > 0)
    }
    assert(Ckpt.persistedIds(spark) == baseline,
      "driver-engine quantilesByGroup must release every checkpoint")
  }

  test("grouped quantiles (distributed engine) leak exactly the result; release clears it") {
    val df = docs.select(col("lang"), length(col("text")).cast("double").as("len"))
    val baseline = Ckpt.persistedIds(spark)
    // driverGroupLimit = 0 forces the distributed engine on any input
    val out = ExactQuantile.quantilesByGroup(
      df, Seq("lang"), "len", Seq(0.5), Seq("p50"), driverGroupLimit = 0)
    assert(out.count() > 0)
    val leaked = Ckpt.persistedIds(spark) -- baseline
    assert(leaked.size == 1,
      s"distributed engine must keep ONLY its materialized result, got $leaked")
    Ckpt.release(out)
    assert(Ckpt.persistedIds(spark) == baseline)
  }

  test("two-engine parity survives the release rework (hash-identical results)") {
    val df = docs.select(col("lang"), length(col("text")).cast("double").as("len"))
    val drv = ExactQuantile.quantilesByGroup(
        df, Seq("lang"), "len", Seq(0.25, 0.5, 0.75), Seq("p25", "p50", "p75"))
      .orderBy("lang").collect().toSeq
    val dst = ExactQuantile.quantilesByGroup(
        df, Seq("lang"), "len", Seq(0.25, 0.5, 0.75), Seq("p25", "p50", "p75"),
        driverGroupLimit = 0)
      .orderBy("lang").collect().toSeq
    assert(drv == dst)
  }

  test("madScores releases its scratch projections") {
    val df = docs.select(col("lang"), length(col("text")).cast("double").as("len"))
    val baseline = Ckpt.persistedIds(spark)
    val out = Robust.madScores(df, Seq("lang"), "len")
    assert(out.count() > 0)
    // driver-engine med/mad are driver-built frames: nothing may remain
    assert(Ckpt.persistedIds(spark) == baseline,
      "madScores (driver engine) must release vals and devVals")
  }

  test("connectedComponents keeps only the final round; release clears it") {
    // shallow star clusters (diameter 2) — propagation's home turf
    val edges = spark.range(0, 200)
      .select(col("id").as("a"), (col("id") % 10).as("b"))
    val baseline = Ckpt.persistedIds(spark)
    val cc = Components.connectedComponents(edges, "a", "b")
    assert(cc.count() == 200)
    val leaked = Ckpt.persistedIds(spark) -- baseline
    assert(leaked.size == 1,
      s"propagation loop must release every superseded round, got ${leaked.size}")
    Ckpt.release(cc)
    assert(Ckpt.persistedIds(spark) == baseline)
  }

  test("connectedComponentsStar keeps only (final edges, node set); release clears them") {
    val edges = spark.range(0, 200)
      .select(col("id").as("a"), (col("id") + 1).as("b"))
    val baseline = Ckpt.persistedIds(spark)
    val cc = Components.connectedComponentsStar(edges, "a", "b")
    assert(cc.count() == 201)
    val leaked = Ckpt.persistedIds(spark) -- baseline
    assert(leaked.size <= 2,
      s"star loop must release every superseded round, got ${leaked.size}")
    Ckpt.release(cc)
    assert(Ckpt.persistedIds(spark) == baseline)
  }

  test("pageRank releases superseded rank checkpoints; release(result) clears the rest") {
    val edges = spark.range(0, 100)
      .select(col("id").as("s"), ((col("id") + 1) % 100).as("d"))
    val baseline = Ckpt.persistedIds(spark)
    // 17 iterations crosses checkpointEvery=8 twice: two superseded
    // rank checkpoints must be gone, ewd + nodes + last ranks remain
    val pr = GraphRank.pageRank(edges, "s", "d", iterations = 17)
    assert(pr.count() == 100)
    val leaked = Ckpt.persistedIds(spark) -- baseline
    assert(leaked.size <= 3,
      s"pageRank must release superseded rank checkpoints, got ${leaked.size}")
    Ckpt.release(pr)
    assert(Ckpt.persistedIds(spark) == baseline)
  }

  test("trainBpe leaves no persisted RDDs behind") {
    val df = docs.limit(50).select(col("text"))
    val baseline = Ckpt.persistedIds(spark)
    val merges = Tokenize.trainBpe(df, "text", numMerges = 20)
    assert(merges.nonEmpty)
    assert(Ckpt.persistedIds(spark) == baseline,
      "trainBpe's result is driver-side — no checkpoint may survive")
  }

  test("sweep releases everything a consumer-owned operator left behind") {
    val edges = spark.range(0, 50)
      .select(col("id").as("a"), (col("id") % 5).as("b"))
    val baseline = Ckpt.persistedIds(spark)
    val cc = Components.connectedComponents(edges, "a", "b")
    assert(cc.count() == 50)
    assert((Ckpt.persistedIds(spark) -- baseline).nonEmpty)
    Ckpt.sweep(spark, keep = baseline)
    assert(Ckpt.persistedIds(spark) == baseline)
  }
}
