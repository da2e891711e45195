package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation

/** r15 manifest-bounded TOP-N pushdown ([[GraftLogScanBuilder]]'s
  * `SupportsPushDownTopN`): `ORDER BY c DESC LIMIT n` drops every file
  * whose rows are provably dominated by ≥ n rows in other files,
  * judged from footer min/max + row/null counts + DV cardinalities —
  * the "latest n" read on an append log scans a time-suffix of its
  * files instead of all of them. Pins the soundness edges: strict
  * domination (overlapping ranges keep everything), null placement
  * (ASC NULLS FIRST keeps every null-carrying file; non-default
  * placements refuse), DV-adjusted dominator counts, trusted stat
  * representations (timestamps need TsUs), expression sort keys
  * refuse, and the opt-out conf. */
class TopNPushdownSpec extends graft.SparkSpecBase {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private def freshCat(tag: String): (String, String) = {
    val wh = Files.createTempDirectory(s"topn-$tag").toString
    val cat = s"topn$tag"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    (cat, wh)
  }

  private def scannedFiles(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case r: DataSourceV2ScanRelation =>
        GraftScans.unwrapFileScan(r.scan).fileIndex.inputFiles.length
    }.sum

  /** Three one-file commits with DISJOINT id ranges: 1–100, 101–200,
    * 201–300 (commit order = manifest file order). */
  private def threeDisjoint(cat: String): Unit = {
    val df = (1 to 300).map(i => (i.toLong, s"n$i", i * 1.5))
      .toDF("id", "name", "price")
    df.filter($"id" <= 100).coalesce(1).writeTo(s"$cat.t")
      .tableProperty("merge.log", "true").create()
    df.filter($"id" > 100 && $"id" <= 200).coalesce(1)
      .writeTo(s"$cat.t").append()
    df.filter($"id" > 200).coalesce(1).writeTo(s"$cat.t").append()
  }

  test("ORDER BY id DESC LIMIT n scans only the dominating file suffix") {
    val (cat, _) = freshCat("desc")
    threeDisjoint(cat)
    val q = spark.table(s"$cat.t").orderBy($"id".desc).limit(5)
    assert(scannedFiles(q) === 1,
      s"top-5 by id DESC needs only the 201-300 file:\n${q.queryExecution}")
    assert(q.collect().map(_.getLong(0)).toSeq === Seq(300L, 299L, 298L, 297L, 296L))
    // a limit spanning two files keeps exactly two
    val q2 = spark.table(s"$cat.t").orderBy($"id".desc).limit(150)
    assert(scannedFiles(q2) === 2)
    assert(q2.collect().map(_.getLong(0)).min === 151L)
    // SQL takes the same path
    val sqlQ = spark.sql(s"SELECT id FROM $cat.t ORDER BY id DESC LIMIT 3")
    assert(scannedFiles(sqlQ) === 1)
    assert(sqlQ.collect().map(_.getLong(0)).toSeq === Seq(300L, 299L, 298L))
  }

  test("ASC keeps the low file; multi-key sorts exclude on the head key") {
    val (cat, _) = freshCat("asc")
    threeDisjoint(cat)
    val q = spark.table(s"$cat.t").orderBy($"id".asc).limit(4)
    assert(scannedFiles(q) === 1)
    assert(q.collect().map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L, 4L))
    // second sort key changes nothing about file exclusion
    val q2 = spark.table(s"$cat.t").orderBy($"id".asc, $"name".desc).limit(4)
    assert(scannedFiles(q2) === 1)
    assert(q2.collect().map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L, 4L))
  }

  test("overlapping ranges refuse: strict domination only") {
    val (cat, _) = freshCat("ovl")
    // every file spans the full id range — nothing dominates anything
    val df = (1 to 300).map(i => (i.toLong, i * 1.5)).toDF("id", "price")
    df.filter($"id" % 3 === 0).coalesce(1).writeTo(s"$cat.t")
      .tableProperty("merge.log", "true").create()
    df.filter($"id" % 3 === 1).coalesce(1).writeTo(s"$cat.t").append()
    df.filter($"id" % 3 === 2).coalesce(1).writeTo(s"$cat.t").append()
    val q = spark.table(s"$cat.t").orderBy($"id".desc).limit(5)
    assert(scannedFiles(q) === 3, "overlapping files must all be kept")
    assert(q.collect().map(_.getLong(0)).toSeq ===
      Seq(300L, 299L, 298L, 297L, 296L))
  }

  test("ASC NULLS FIRST: null-carrying files survive and nulls count toward the bound") {
    val (cat, _) = freshCat("nulls")
    // high-id file carries 3 nulls in the sort column — under ASC they
    // sort FIRST, so the top-4 is 3 nulls + id 1, and the null file
    // can never be excluded
    val low = (1 to 100).map(i => (Some(i.toLong): Option[Long], s"n$i"))
      .toDF("id", "name")
    val hi = ((201 to 300).map(i => (Some(i.toLong): Option[Long], s"n$i"))
        ++ Seq(1, 2, 3).map(i => (None: Option[Long], s"x$i")))
      .toDF("id", "name")
    low.coalesce(1).writeTo(s"$cat.t")
      .tableProperty("merge.log", "true").create()
    hi.coalesce(1).writeTo(s"$cat.t").append()
    // limit 4 needs a null row AND id 1 — both files stay
    val q = spark.table(s"$cat.t").orderBy($"id".asc).limit(4)
    assert(scannedFiles(q) === 2,
      "the null-carrying file holds top rows under NULLS FIRST")
    val got = q.collect().map(r => if (r.isNullAt(0)) null else r.getLong(0))
    assert(got.count(_ == null) === 3 && got.contains(1L))
    // limit 3 is covered by the null rows ALONE: nulls are witnesses,
    // and the zero-null low file is excludable
    val q3 = spark.table(s"$cat.t").orderBy($"id".asc).limit(3)
    assert(scannedFiles(q3) === 1,
      "3 known nulls cover an ASC NULLS FIRST top-3 by themselves")
    assert(q3.collect().forall(_.isNullAt(0)))
    // the null-carrying file can never be excluded, whatever dominates
    // its VALUES: under DESC its real rows are the top anyway
    val qd = spark.table(s"$cat.t").orderBy($"id".desc).limit(2)
    assert(scannedFiles(qd) === 1)
    assert(qd.collect().map(_.getLong(0)).toSeq === Seq(300L, 299L))
  }

  test("DESC NULLS LAST: dominator counts exclude nulls from the cover") {
    val (cat, _) = freshCat("nulld")
    // hi file: 3 real rows (201-203) + 5 nulls; its useful count is 3,
    // so top-5 DESC cannot be covered by hi alone — low must be kept
    val low = (1 to 100).map(i => (Some(i.toLong): Option[Long], s"n$i"))
      .toDF("id", "name")
    val hi = ((201 to 203).map(i => (Some(i.toLong): Option[Long], s"n$i"))
        ++ (1 to 5).map(i => (None: Option[Long], s"x$i")))
      .toDF("id", "name")
    low.coalesce(1).writeTo(s"$cat.t")
      .tableProperty("merge.log", "true").create()
    hi.coalesce(1).writeTo(s"$cat.t").append()
    val q = spark.table(s"$cat.t").orderBy($"id".desc).limit(5)
    assert(scannedFiles(q) === 2,
      "5 nulls must not masquerade as dominating rows")
    assert(q.collect().map(_.getLong(0)).toSeq ===
      Seq(203L, 202L, 201L, 100L, 99L))
    // limit 3 IS covered by hi's real rows
    val q3 = spark.table(s"$cat.t").orderBy($"id".desc).limit(3)
    assert(scannedFiles(q3) === 1)
  }

  test("deletion vectors shrink dominator counts but never unsound-keep") {
    val (cat, wh) = freshCat("dv")
    threeDisjoint(cat)
    // DV-mask 25 of the top file's 100 rows (ids 205-229): its useful
    // count drops to 75, so a top-80 DESC must also keep the middle
    // file — pre-mask row counts would unsoundly cover it
    spark.conf.set("spark.graft.dv.minTouchedBytes", "0")
    val log = CommitLog(spark, s"$wh/t")
    try log.delete(col("id") > 204L && col("id") <= 229L)
    finally spark.conf.unset("spark.graft.dv.minTouchedBytes")
    val snap = log.snapshot()
    assert(snap.dvs.nonEmpty, "the delete must have taken the DV path")
    val q = spark.table(s"$cat.t").orderBy($"id".desc).limit(80)
    assert(scannedFiles(q) === 2,
      s"a masked dominator must not over-cover:\n${q.queryExecution}")
    val got = q.collect().map(_.getLong(0)).toSeq
    assert(got.size === 80 && got.head === 300L && got.last === 196L)
    assert(!got.exists(i => i > 204L && i <= 229L), "masked rows must not surface")
    // limit 70 is covered by the masked file's surviving rows alone
    val q70 = spark.table(s"$cat.t").orderBy($"id".desc).limit(70)
    assert(scannedFiles(q70) === 1)
    assert(q70.collect().map(_.getLong(0)).min === 231L)
  }

  test("timestamp sort keys ride unit-normalized TsUs stats") {
    val (cat, _) = freshCat("ts")
    val prior = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try {
      val df = (1 to 300).map { i =>
        (i.toLong, java.sql.Timestamp.valueOf(f"2024-01-01 00:${i / 60}%02d:${i % 60}%02d"))
      }.toDF("id", "ts")
      df.filter($"id" <= 150).coalesce(1).writeTo(s"$cat.t")
        .tableProperty("merge.log", "true").create()
      df.filter($"id" > 150).coalesce(1).writeTo(s"$cat.t").append()
      val q = spark.table(s"$cat.t").orderBy($"ts".desc).limit(3)
      assert(scannedFiles(q) === 1)
      assert(q.collect().map(_.getLong(0)).toSeq === Seq(300L, 299L, 298L))
    } finally prior match {
      case Some(v) => spark.conf.set("spark.sql.parquet.outputTimestampType", v)
      case None => spark.conf.unset("spark.sql.parquet.outputTimestampType")
    }
  }

  test("INT96 timestamp stats are untrusted: top-N keeps every file") {
    val (cat, _) = freshCat("i96")
    val prior = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "INT96")
    try {
      val df = (1 to 200).map { i =>
        (i.toLong, java.sql.Timestamp.valueOf(f"2024-01-01 00:${i / 60}%02d:${i % 60}%02d"))
      }.toDF("id", "ts")
      df.filter($"id" <= 100).coalesce(1).writeTo(s"$cat.t")
        .tableProperty("merge.log", "true").create()
      df.filter($"id" > 100).coalesce(1).writeTo(s"$cat.t").append()
      val q = spark.table(s"$cat.t").orderBy($"ts".desc).limit(3)
      assert(scannedFiles(q) === 2, "INT96 files carry no trusted ts stat")
      assert(q.collect().map(_.getLong(0)).toSeq === Seq(200L, 199L, 198L))
    } finally prior match {
      case Some(v) => spark.conf.set("spark.sql.parquet.outputTimestampType", v)
      case None => spark.conf.unset("spark.sql.parquet.outputTimestampType")
    }
  }

  test("refusal edges: non-default null order, expression keys, opt-out") {
    val (cat, _) = freshCat("ref")
    threeDisjoint(cat)
    // asc_nulls_last is not the judgeable default
    val q1 = spark.table(s"$cat.t").orderBy($"id".asc_nulls_last).limit(5)
    assert(scannedFiles(q1) === 3)
    assert(q1.collect().map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L, 4L, 5L))
    // an expression sort key is not a bare column
    val q2 = spark.table(s"$cat.t").orderBy(($"id" * -1).asc).limit(2)
    assert(scannedFiles(q2) === 3)
    assert(q2.collect().map(_.getLong(0)).toSeq === Seq(300L, 299L))
    // opt-out conf restores the full scan
    spark.conf.set("spark.graft.topNPushdown.enabled", "false")
    try {
      val q3 = spark.table(s"$cat.t").orderBy($"id".desc).limit(2)
      assert(scannedFiles(q3) === 3)
      assert(q3.collect().map(_.getLong(0)).toSeq === Seq(300L, 299L))
    } finally spark.conf.unset("spark.graft.topNPushdown.enabled")
  }

  test("property: pruned top-N ≡ opt-out top-N on random layouts, ties, nulls, DVs") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // a tiny value range forces heavy TIES across file boundaries (the
    // strict-domination edge), Option values inject nulls, the sorted
    // flag produces both dominating and fully-overlapping layouts, and
    // the delete flag mixes DV-masked files in
    val caseGen = for {
      n <- Gen.chooseNum(0, 40)
      vs <- Gen.listOfN(n, Gen.option(Gen.chooseNum(-3L, 3L)))
      sorted <- Gen.oneOf(true, false)
      chunks <- Gen.chooseNum(1, 4)
      k <- Gen.chooseNum(1, 12)
      desc <- Gen.oneOf(true, false)
      del <- Gen.oneOf(false, false, true)
    } yield (vs, sorted, chunks, k, desc, del)
    var iter = 0
    val prop = Prop.forAllNoShrink(caseGen) {
      case (vs, sorted, chunks, k, desc, del) =>
        iter += 1
        val (cat, wh) = freshCat(s"prop$iter")
        val rows = vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        val ordered =
          if (sorted) rows.sortBy { case (_, v) => v.getOrElse(Long.MinValue) }
          else rows
        val parts: Seq[Seq[(Long, Option[Long])]] =
          if (ordered.isEmpty) Seq(Nil)
          else ordered.grouped(
            math.max(1, ordered.size / chunks)).toSeq
        parts.zipWithIndex.foreach { case (chunk, ci) =>
          val df = chunk.toDF("id", "v")
          if (ci == 0) df.coalesce(1).writeTo(s"$cat.t")
            .tableProperty("merge.log", "true").create()
          else df.coalesce(1).writeTo(s"$cat.t").append()
        }
        if (del && rows.nonEmpty) {
          spark.conf.set("spark.graft.dv.minTouchedBytes", "0")
          spark.conf.set("spark.graft.dv.maxRatio", "1.0")
          try CommitLog(spark, s"$wh/t").delete(col("id") % 3 === 0L)
          finally {
            spark.conf.unset("spark.graft.dv.minTouchedBytes")
            spark.conf.unset("spark.graft.dv.maxRatio")
          }
        }
        def run(): Seq[Long] = {
          val q = spark.table(s"$cat.t")
            .orderBy(if (desc) $"v".desc else $"v".asc).limit(k)
          q.collect().map(r =>
            if (r.isNullAt(1)) -999L else r.getLong(1)).toSeq
        }
        val on = run().sorted
        spark.conf.set("spark.graft.topNPushdown.enabled", "false")
        val off = try run().sorted
          finally spark.conf.unset("spark.graft.topNPushdown.enabled")
        on == off
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("partition-exact filters compose with top-N over the surviving set") {
    val (cat, _) = freshCat("pex")
    val df = (1 to 300).map(i =>
        (i.toLong, if (i % 2 == 0) "A" else "B")).toDF("id", "flag")
    df.filter($"id" <= 100).coalesce(1).writeTo(s"$cat.t")
      .tableProperty("merge.log", "true")
      .tableProperty("merge.partcol", "flag").create()
    df.filter($"id" > 100 && $"id" <= 200).coalesce(1)
      .writeTo(s"$cat.t").append()
    df.filter($"id" > 200).coalesce(1).writeTo(s"$cat.t").append()
    // 6 files (2 partitions × 3 commits); flag=A + top-2 DESC needs
    // only A's newest file
    val q = spark.table(s"$cat.t").filter($"flag" === "A")
      .orderBy($"id".desc).limit(2)
    assert(scannedFiles(q) === 1,
      s"partition-exact + top-N must keep one file:\n${q.queryExecution}")
    assert(q.collect().map(_.getLong(0)).toSeq === Seq(300L, 298L))
    // a value conjunct poisons exactness: no top-N truncation, scan
    // all 3 A-files
    val q2 = spark.table(s"$cat.t").filter($"flag" === "A" && $"id" =!= 2L)
      .orderBy($"id".desc).limit(2)
    assert(scannedFiles(q2) === 3)
    assert(q2.collect().map(_.getLong(0)).toSeq === Seq(300L, 298L))
  }
}
