package graft

import org.apache.spark.sql.functions._
import graft.operators.{Sinks, Skew}
import graft.sources.Tables

/** Scale-path utilities: salting equivalence and bucketed no-shuffle
  * joins. Equivalence is asserted against the unsalted/unbucketed plans —
  * same results, different physical distribution. */
class ScaleOpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("saltedJoin returns exactly the plain join's rows") {
    val li = Tables(spark, sfDir, "lineitem").select("l_orderkey", "l_quantity")
    val o = Tables(spark, sfDir, "orders").select("o_orderkey", "o_totalprice")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    val plain = li.join(o, Seq("l_orderkey")).count()
    val salted = Skew.saltedJoin(li, o, Seq("l_orderkey"), salt = 8).count()
    assert(salted === plain)
  }

  test("saltedAgg equals plain aggregation") {
    val li = Tables(spark, sfDir, "lineitem")
    val plain = li.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), max($"l_quantity").as("mx"))
      .orderBy("l_returnflag").collect().toSeq
    val salted = Skew.saltedAgg(li, Seq("l_returnflag"),
        Map("n" -> ("count", "l_orderkey"), "mx" -> ("max", "l_quantity")), salt = 8)
      .orderBy("l_returnflag").collect().toSeq
    assert(salted === plain)
  }

  test("bucketed tables join without a shuffle") {
    // warehouse dir is a static conf; tables land in ./spark-warehouse
    // (gitignored) and are dropped below
    val li = Tables(spark, sfDir, "lineitem").select("l_orderkey", "l_quantity")
    val o = Tables(spark, sfDir, "orders")
      .select($"o_orderkey".as("l_orderkey"), $"o_totalprice")
    Sinks.writeBucketed(li, "li_bucketed", Seq("l_orderkey"), 8)
    Sinks.writeBucketed(o, "o_bucketed", Seq("l_orderkey"), 8)
    // disable broadcast so the join would otherwise shuffle
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_bucketed").join(spark.table("o_bucketed"), "l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() ===
        li.join(o, "l_orderkey").count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }

  test("lshNearDupPairs vector rejoin is size-aware: shuffle-hash above the broadcast threshold") {
    import graft.operators.Similarity
    val emb = Tables(spark, sfDir, "embeddings")
    val tables = Similarity.hyperplaneTables(6, 3, 64)
    // threshold 0 forces the over-threshold path: the vector rejoin must
    // plan as shuffled joins on id, with no broadcast of the vector relation
    val big = Similarity.lshNearDupPairs(emb, "vec_id", "embedding", 0.45, tables,
      broadcastThresholdBytes = 0L)
    val plan = big.queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"),
      s"over-threshold rejoin should shuffle-hash join on id:\n$plan")
    // and it still computes exactly what the broadcast variant computes
    val small = Similarity.lshNearDupPairs(emb, "vec_id", "embedding", 0.45, tables)
    assert(small.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("a_id", "b_id", "cosine").as[(Long, Long, Double)].collect().toSet
    assert(canon(big) === canon(small))
  }

  test("topk aggregate equals the window top-k formulation") {
    val fn = graft.functions.TopKAgg.register(spark, 3)
    val part = Tables(spark, sfDir, "part")
    val viaAgg = part.groupBy("p_brand")
      .agg(expr(s"$fn(p_retailprice)").as("tp"))
      .orderBy("p_brand")
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val viaWindow = graft.operators.Dedup.topKPerGroup(part, Seq("p_brand"),
        Seq($"p_retailprice".desc, $"p_partkey"), 3)
      .groupBy("p_brand").agg(sort_array(collect_list("p_retailprice"), asc = false).as("tp"))
      .orderBy("p_brand")
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(viaAgg === viaWindow)
    // partial-aggregate shape: plan must NOT contain a window
    val plan = part.groupBy("p_brand").agg(expr(s"$fn(p_retailprice)"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("partial"), plan) // map-side combine present
  }

  test("binned range join equals the naive theta join, as an equi-join plan") {
    import graft.operators.RangeJoin
    val li = Tables(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
    val bands = spark.range(0, 211).select(
      concat(lit("b"), $"id".cast("string")).as("band"),
      ($"id" * 500.0).as("lo"), ($"id" * 500.0 + 999.0).as("hi"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("l_orderkey", "l_linenumber", "band")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val binned = RangeJoin.pointInInterval(li, bands, "l_extendedprice", "lo", "hi", 500.0)
    val naive = li.join(bands, $"l_extendedprice".between($"lo", $"hi"))
    assert(canon(binned) === canon(naive))
    assert(canon(binned).nonEmpty)
    // scale shape: with broadcast off, the bin join is a shuffled
    // equi-join — never a nested loop or cartesian product
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = RangeJoin.pointInInterval(li, bands, "l_extendedprice", "lo", "hi", 500.0)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    // null points and null/inverted bounds never match, like BETWEEN
    val pts = Seq((1L, java.lang.Double.valueOf(5.0)), (2L, null.asInstanceOf[java.lang.Double]))
      .toDF("id", "x")
    val ivs = Seq(("ok", java.lang.Double.valueOf(0.0), java.lang.Double.valueOf(10.0)),
      ("nul", null.asInstanceOf[java.lang.Double], java.lang.Double.valueOf(10.0)),
      ("inv", java.lang.Double.valueOf(10.0), java.lang.Double.valueOf(0.0)))
      .toDF("band", "lo", "hi")
    val got = RangeJoin.pointInInterval(pts, ivs, "x", "lo", "hi", 1.0)
      .select("id", "band").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === Set((1L, "ok")))
    // an interval wider than maxBinsPerInterval bins fails fast
    val wide = Seq(("w", 0.0, 1e9)).toDF("band", "lo", "hi")
    val ex = intercept[Exception] {
      RangeJoin.pointInInterval(pts, wide, "x", "lo", "hi", 1.0, maxBinsPerInterval = 100).count()
    }
    assert(ex.getMessage.contains("RangeJoin") ||
      (ex.getCause != null && ex.getCause.getMessage.contains("RangeJoin")))
  }

  test("runtime bloom filter prunes the fact side of a selective shuffle join") {
    // At cluster scale a selectively-filtered dim joined to a huge fact
    // should semi-reduce the fact scan before the shuffle. Spark's
    // InjectRuntimeFilter does exactly that; the size thresholds that
    // gate it (10GB fact scan) never trigger at test SF, so lower them
    // to prove the capability and the config knobs.
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0")
    val prev = confs.map { case (k, _) => k -> spark.conf.get(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val li = Tables(spark, sfDir, "lineitem").select("l_orderkey", "l_quantity")
      val o = Tables(spark, sfDir, "orders")
        .filter($"o_orderpriority" === "1-URGENT")
        .select("o_orderkey")
      val joined = li.join(o, $"l_orderkey" === $"o_orderkey")
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain") || optimized.contains("bloom_filter"),
        s"expected an injected runtime bloom filter:\n$optimized")
      // and the filter is transparent: same result as with it disabled
      val n = joined.count()
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      try assert(n === li.join(o, $"l_orderkey" === $"o_orderkey").count())
      finally spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("AQE splits a skewed join partition at runtime (skew=true in the final plan)") {
    // one hot key holding most rows — the pathology salting handles
    // manually (Skew.scala); AQE's skew-join handles it at runtime by
    // splitting the oversized partition. Thresholds lowered to trigger
    // at test scale.
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.shuffle.partitions" -> "8")
    val prev = confs.map { case (k, _) => k -> spark.conf.get(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val left = spark.range(0, 200000)
        .select(when($"id" % 100 === 0, $"id" % 7).otherwise(lit(0L)).as("k"),
          $"id".as("payload"))
      val right = spark.range(0, 16).select($"id".as("k"), ($"id" * 10).as("r"))
      val joined = left.join(right, "k")
      // execute THIS Dataset's queryExecution (count() would spawn its
      // own) so the adaptive plan finalizes on it
      assert(joined.collect().nonEmpty)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"expected AQE to mark the hot partition as skewed:\n$finalPlan")
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("CSV and JSONL round-trip with explicit schema (B1)") {
    val dir = java.nio.file.Files.createTempDirectory("io").toString
    val df = Tables(spark, sfDir, "nation")
    df.write.mode("overwrite").option("header", "true").csv(s"$dir/nation_csv")
    df.write.mode("overwrite").json(s"$dir/nation_jsonl")
    val viaCsv = spark.read.schema(df.schema).option("header", "true")
      .csv(s"$dir/nation_csv")
    val viaJson = spark.read.schema(df.schema).json(s"$dir/nation_jsonl")
    val want = df.orderBy("n_nationkey").collect().toSeq
    assert(viaCsv.orderBy("n_nationkey").collect().toSeq === want)
    assert(viaJson.orderBy("n_nationkey").collect().toSeq === want)
  }
}
