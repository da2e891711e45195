package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{LocalTableScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.datasources.v2.{BatchScanExec, DataSourceV2ScanRelation}

/** r16 DECIMAL manifest stats: footer min/max harvested as
  * [[CommitLog.DecV]] (unscaled long + scale — the typed-marker
  * pattern of r15's TsUs, so a pre-r16 manifest reads as stat-less)
  * and admitted across the whole pushdown family — range/point/IN
  * file pruning, MIN/MAX manifest folds, and top-N exclusion. Money
  * columns are the reference's own domain (fuel prices are
  * DECIMAL(10,3), /root/reference/index.js:129-138), and a price
  * range is the commonest filter shape over them. Pins the
  * exactness boundaries: compact (INT64) and fixed-binary physical
  * layouts both harvest; an unscaled value beyond Long refuses at
  * harvest (kept files, exact rows); cross-scale bounds compare
  * value-exactly; DVs still poison extremum folds. */
class DecimalStatsSpec extends graft.SparkSpecBase {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private def freshCat(tag: String): (String, String) = {
    val wh = Files.createTempDirectory(s"decs-$tag").toString
    val cat = s"decs$tag"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    (cat, wh)
  }

  private def allNodes(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
    case q: QueryStageExec => q +: allNodes(q.plan)
    case other => other +: other.children.flatMap(allNodes)
  }

  private def manifestAnswered(df: DataFrame): Boolean = {
    df.collect()
    val nodes = allNodes(df.queryExecution.executedPlan)
    nodes.exists(_.isInstanceOf[LocalTableScanExec]) &&
      !nodes.exists(_.isInstanceOf[BatchScanExec])
  }

  private def scannedFiles(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case r: DataSourceV2ScanRelation =>
        GraftScans.unwrapFileScan(r.scan).fileIndex.inputFiles.length
    }.sum

  /** id.125 at DECIMAL(10,3) — compact INT64 physical layout. */
  private def bands(log: CommitLog): Unit = {
    def mk(lo: Long, hi: Long) = spark.range(lo, hi).toDF("id")
      .select($"id", expr("CAST(id AS DECIMAL(10,3)) + CAST(0.125 AS DECIMAL(4,3))")
        .cast("decimal(10,3)").as("p"))
      .coalesce(1)
    log.append(mk(0L, 100L))
    log.append(mk(100L, 200L))
    log.append(mk(200L, 300L))
  }

  test("readRange prunes files by decimal footer stats (compact layout)") {
    val t = Files.createTempDirectory("decs-rr").toString + "/t"
    val log = CommitLog(spark, t)
    bands(log)
    assert(log.read().inputFiles.length === 3)
    val mid = log.readRange("p", new java.math.BigDecimal("120.000"),
      new java.math.BigDecimal("150.500"))
    assert(mid.inputFiles.length === 1, "the middle band alone must be scanned")
    assert(mid.count() === 31L) // 120.125 .. 150.125
    // cross-scale bounds compare by VALUE: scale-1 bounds, same prune
    val mid2 = log.readRange("p", BigDecimal("120.5"), BigDecimal("150.5"))
    assert(mid2.inputFiles.length === 1)
    assert(mid2.count() === 30L) // 121.125 .. 150.125
    // integer bounds on a decimal column fold too
    assert(log.readRange("p", 201L, 250L).inputFiles.length === 1)
  }

  test("fixed-binary decimal (precision > 18) harvests and prunes") {
    val t = Files.createTempDirectory("decs-fix").toString + "/t"
    val log = CommitLog(spark, t)
    def mk(lo: Long, hi: Long) = spark.range(lo, hi).toDF("id")
      .select(expr("CAST(id AS DECIMAL(25,3))").as("p")).coalesce(1)
    log.append(mk(0L, 100L)); log.append(mk(100L, 200L)); log.append(mk(200L, 300L))
    val mid = log.readRange("p", new java.math.BigDecimal("120"),
      new java.math.BigDecimal("150"))
    assert(mid.inputFiles.length === 1,
      "fixed-len-binary decimal stats must prune like compact ones")
    assert(mid.count() === 31L)
  }

  test("unscaled beyond Long refuses harvest; reads stay exact, files kept") {
    val t = Files.createTempDirectory("decs-big").toString + "/t"
    val log = CommitLog(spark, t)
    // 10^20 needs 67 bits unscaled — no Long-backed stat exists
    log.append(Seq("100000000000000000000", "200000000000000000000")
      .toDF("s").select(expr("CAST(s AS DECIMAL(25,0))").as("p")).coalesce(1))
    log.append(Seq("300000000000000000000").toDF("s")
      .select(expr("CAST(s AS DECIMAL(25,0))").as("p")).coalesce(1))
    val r = log.readRange("p", new java.math.BigDecimal("5"),
      new java.math.BigDecimal("150000000000000000000"))
    assert(r.inputFiles.length === 2, "stat-less files must be kept")
    assert(r.count() === 1L)
    // and the extremum fold refuses (no trusted stats) — full scan
    val (cat, wh0) = freshCat("big")
    val wh = wh0 // reuse catalog root against the same physical table
    Seq("100000000000000000000").toDF("s")
      .select(expr("CAST(s AS DECIMAL(25,0))").as("p"))
      .writeTo(s"$cat.t").tableProperty("merge.log", "true").create()
    val agg = spark.table(s"$cat.t").agg(max($"p").as("mx"))
    assert(!manifestAnswered(agg), "over-Long decimal must refuse the fold")
    assert(agg.collect().head.getDecimal(0)
      === new java.math.BigDecimal("100000000000000000000"))
  }

  test("min/max over decimal folds from the manifest; DV poisons it") {
    val (cat, wh) = freshCat("fold")
    val df = spark.range(1L, 301L).toDF("id")
      .select($"id", expr("CAST(id AS DECIMAL(12,2)) * 7 + CAST(0.25 AS DECIMAL(3,2))")
        .cast("decimal(12,2)").as("p"))
    df.filter($"id" <= 150).writeTo(s"$cat.t")
      .tableProperty("merge.log", "true").create()
    df.filter($"id" > 150).writeTo(s"$cat.t").append()
    val q = spark.table(s"$cat.t")
      .agg(min($"p").as("mn"), max($"p").as("mx"), count(lit(1)).as("n"))
    assert(manifestAnswered(q), "decimal min/max must fold from the manifest:\n"
      + q.queryExecution.executedPlan)
    val r = q.collect().head
    assert(r.getDecimal(0) === new java.math.BigDecimal("7.25"))
    assert(r.getDecimal(1) === new java.math.BigDecimal("2100.25"))
    assert(r.getLong(2) === 300L)
    // a deletion vector could mask the extremal row: fold refuses
    val log = CommitLog(spark, s"$wh/t")
    log.delete($"id" === 300L)
    val q2 = spark.table(s"$cat.t").agg(max($"p").as("mx"))
    val r2 = q2.collect().head
    assert(r2.getDecimal(0) === new java.math.BigDecimal("2093.25"))
  }

  test("V2 scan prunes files on decimal predicates, incl. cross-scale literals") {
    val (cat, _) = freshCat("v2")
    val df = spark.range(0L, 300L).toDF("id")
      .select($"id", expr("CAST(id AS DECIMAL(10,3)) + CAST(0.125 AS DECIMAL(4,3))")
        .cast("decimal(10,3)").as("p"))
    df.filter($"id" < 100).coalesce(1).writeTo(s"$cat.t")
      .tableProperty("merge.log", "true").create()
    df.filter($"id" >= 100 && $"id" < 200).coalesce(1).writeTo(s"$cat.t").append()
    df.filter($"id" >= 200).coalesce(1).writeTo(s"$cat.t").append()
    // same-scale literal
    val hi = spark.table(s"$cat.t")
      .filter($"p" >= lit(new java.math.BigDecimal("200.125")))
    assert(scannedFiles(hi) === 1, "the top band alone must be scanned")
    assert(hi.count() === 100L)
    // cross-scale literal (scale 4): DecimalPrecision casts the column
    // up for the comparison — the bound still reaches the stats
    val mid = spark.table(s"$cat.t")
      .filter($"p" > lit(new java.math.BigDecimal("120.0005"))
        && $"p" < lit(new java.math.BigDecimal("150.0005")))
    assert(scannedFiles(mid) === 1,
      s"cross-scale decimal bounds must prune, scanned ${scannedFiles(mid)}:\n"
        + mid.queryExecution.optimizedPlan)
    assert(mid.count() === 30L) // 120.125 .. 149.125 ... strictly < 150.0005
    // IN-list: only bands holding a listed value survive
    val in = spark.table(s"$cat.t").filter($"p".isin(
      new java.math.BigDecimal("7.125"), new java.math.BigDecimal("42.125")))
    assert(scannedFiles(in) === 1)
    assert(in.count() === 2L)
  }

  test("top-N over a decimal sort key excludes dominated files") {
    val (cat, _) = freshCat("topn")
    val df = spark.range(0L, 300L).toDF("id")
      .select($"id", expr("CAST(id AS DECIMAL(10,2))").as("p"))
    df.filter($"id" < 100).coalesce(1).writeTo(s"$cat.t")
      .tableProperty("merge.log", "true").create()
    df.filter($"id" >= 100 && $"id" < 200).coalesce(1).writeTo(s"$cat.t").append()
    df.filter($"id" >= 200).coalesce(1).writeTo(s"$cat.t").append()
    val top = spark.table(s"$cat.t").orderBy($"p".desc).limit(5)
    assert(scannedFiles(top) === 1,
      s"the top band dominates, scanned ${scannedFiles(top)}")
    assert(top.select($"id").as[Long].collect().toSet
      === Set(295L, 296L, 297L, 298L, 299L))
  }

  test("property: DecV fold/compare are value-exact at any scale pair") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val log = CommitLog(spark,
      Files.createTempDirectory("decs-prop").toString + "/t")
    val dv = for {
      u <- Gen.chooseNum(-1000000000000000L, 1000000000000000L)
      s <- Gen.chooseNum(0, 8)
    } yield CommitLog.DecV(u, s)
    val prop = Prop.forAllNoShrink(dv, dv, dv, dv) { (a, b, c, d) =>
      val cmpOk = log.cmpAny(a, b)
        .contains(a.toBig.compareTo(b.toBig)) ||
        // cmpAny returns the sign class, not the exact compareTo value
        log.cmpAny(a, b).exists(x =>
          Integer.signum(x) == Integer.signum(a.toBig.compareTo(b.toBig)))
      val mn = log.minAny(a, b)
      val mx = log.maxAny(a, b)
      val minOk = mn == (if (a.toBig.compareTo(b.toBig) <= 0) a else b) ||
        mn.asInstanceOf[CommitLog.DecV].toBig
          .compareTo((if (a.toBig.compareTo(b.toBig) <= 0) a else b).toBig) == 0
      val maxOk = mx.asInstanceOf[CommitLog.DecV].toBig
        .compareTo((if (a.toBig.compareTo(b.toBig) >= 0) a else b).toBig) == 0
      cmpOk && minOk && maxOk
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: the widening lattice is symmetric and value-preserving") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import org.apache.spark.sql.types._
    val scalars: Gen[DataType] = Gen.oneOf(
      ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType,
      DecimalType(5, 2), DecimalType(10, 2), DecimalType(14, 2),
      DecimalType(10, 4), StringType, DateType)
    val prop = Prop.forAllNoShrink(scalars, scalars) { (a, b) =>
      val ab = CommitLog.widerOf(a, b)
      val ba = CommitLog.widerOf(b, a)
      val symmetric = ab == ba
      val identity = CommitLog.widerOf(a, a).contains(a)
      // an admitted pair's cast narrow→wide must be exact for every
      // value the narrow type holds (spot: extremes + a fraction)
      val exact = ab.forall { w =>
        val n = if (w == a) b else a
        (n, w) match {
          case (IntegerType, LongType) =>
            Seq(Int.MinValue, -1, 0, Int.MaxValue).forall(v =>
              org.apache.spark.sql.catalyst.expressions.Cast(
                org.apache.spark.sql.catalyst.expressions.Literal(v), w)
                .eval(null) == v.toLong)
          case (FloatType, DoubleType) =>
            Seq(0.1f, Float.MinValue, Float.MaxValue).forall { v =>
              org.apache.spark.sql.catalyst.expressions.Cast(
                org.apache.spark.sql.catalyst.expressions.Literal(v), w)
                .eval(null) == v.toDouble
            }
          case _ => true
        }
      }
      symmetric && identity && exact
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("point reads prune on decimal stats with external bound types") {
    val t = Files.createTempDirectory("decs-pt").toString + "/t"
    val log = CommitLog(spark, t)
    bands(log)
    assert(log.pointCandidateFiles("p", new java.math.BigDecimal("150.125")).size === 1)
    assert(log.pointCandidateFiles("p", BigDecimal("150.125")).size === 1)
    // an integer probe of a fractional-only column: stats admit the
    // band it falls in (conservative — the residual filter is exact)
    assert(log.readPoint("p", new java.math.BigDecimal("150.125")).count() === 1L)
    assert(log.readPoint("p", new java.math.BigDecimal("150.000")).count() === 0L)
  }
}
