package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** r16 TYPE-WIDENING schema evolution: an int column that outgrew its
  * type, a float that needs double precision, a decimal that needs
  * more integer digits — accepted as ADDITIVE evolution instead of the
  * pre-r16 loud refusal. The committed schema adopts the wider type in
  * one metadata-only commit; old narrow files read through the widened
  * schema natively (Spark's parquet reader converts int32→long,
  * float→double, decimal precision growth in-scan); a write narrower
  * than the table upcasts before landing. Pins the soundness
  * boundaries: stats-based pruning stays exact across the widening
  * (the manifest stat representation is unchanged for every admitted
  * pair); a float→double widening voids BLOOM evidence (pre-widening
  * bits hash the old string form — a probe through the new type would
  * falsely exclude files) via the [[CommitLog.WidenedStrKey]] marker;
  * decimal SCALE growth and every cross-family change still refuse
  * loudly. */
class WideningSpec extends graft.SparkSpecBase {
  import spark.implicits._

  private def tmpTable(prefix: String): String =
    Files.createTempDirectory(prefix).toString + "/t"

  test("int -> long: wider write evolves; old files read; narrow write upcasts") {
    val t = tmpTable("wid-il")
    val log = CommitLog(spark, t)
    log.append(Seq((1, "a"), (2, "b")).toDF("id", "v")) // id: int
    assert(log.read().schema("id").dataType === IntegerType)
    // a LONG write widens the committed schema — metadata + new file only
    val filesBefore = log.snapshot().files.toSet
    log.append(Seq((3000000000L, "c")).toDF("id", "v"))
    assert(log.read().schema("id").dataType === LongType)
    assert(filesBefore.subsetOf(log.snapshot().files.toSet),
      "widening must not rewrite existing files")
    assert(log.read().orderBy("id").as[(Long, String)].collect().toSeq
      === Seq((1L, "a"), (2L, "b"), (3000000000L, "c")))
    // a narrow (int) write AFTER the widening upcasts and lands
    log.append(Seq((4, "d")).toDF("id", "v"))
    assert(log.read().count() === 4L)
    // post-widen DML sees one coherent long column
    log.delete(col("id") === 2L)
    assert(log.read().orderBy("id").as[(Long, String)].collect().map(_._1).toSeq
      === Seq(1L, 4L, 3000000000L))
    // time travel: version 0 still reads with the original int schema
    assert(log.readVersion(0L).schema("id").dataType === IntegerType)
  }

  test("stats pruning stays exact across an int -> long widening") {
    val t = tmpTable("wid-stats")
    val log = CommitLog(spark, t)
    log.append(spark.range(0L, 100L).select($"id".cast("int").as("id")).coalesce(1))
    log.append(spark.range(100L, 200L).select($"id".cast("int").as("id")).coalesce(1))
    log.append(spark.range(200L, 300L).toDF("id").coalesce(1)) // widens to long
    assert(log.read().schema("id").dataType === LongType)
    // the old int files' Long-repr stats prune alongside the new long file
    val mid = log.readRange("id", 120L, 150L)
    assert(mid.inputFiles.length === 1)
    assert(mid.count() === 31L)
    assert(log.readRange("id", 250L, 260L).inputFiles.length === 1)
  }

  test("float -> double: values survive; blooms stop excluding files") {
    val t = tmpTable("wid-fd")
    val log = CommitLog(spark, t).withBloomIndex(Seq("p"))
    // 0.1f is NOT a double-representable decimal: its bloom bits were
    // hashed from the FLOAT string form "0.1"
    log.append(Seq(0.1f, 2.5f).toDF("p").coalesce(1))
    log.append(Seq(9.5).toDF("p")) // widens to double
    assert(log.read().schema("p").dataType === DoubleType)
    assert(CommitLog.strShifted(log.snapshot().schema.get("p")),
      "float->double must stamp the string-shift marker")
    // the stored float 0.1f reads as (double)0.1f; a point read of that
    // exact double must FIND it — the old bloom would stringify the
    // probe as "0.10000000149011612" and falsely exclude the file
    val v = 0.1f.toDouble
    assert(log.readPoint("p", v).count() === 1L,
      "pre-widening bloom bits must not exclude the file holding the row")
    // stats still prune: the float file's Double stats are exact
    assert(log.readRange("p", 9.0, 10.0).inputFiles.length === 1)
  }

  test("decimal precision growth widens; scale growth refuses loudly") {
    val t = tmpTable("wid-dec")
    val log = CommitLog(spark, t)
    log.append(Seq("1.25", "7.50").toDF("s")
      .select(expr("CAST(s AS DECIMAL(5,2))").as("d")).coalesce(1))
    log.append(Seq("123456789012.25").toDF("s")
      .select(expr("CAST(s AS DECIMAL(14,2))").as("d")))
    assert(log.read().schema("d").dataType === DecimalType(14, 2))
    assert(log.read().agg(sum($"d")).collect()(0).getDecimal(0)
      === new java.math.BigDecimal("123456789021.00"))
    // decimal stats stay exact across the precision growth (same scale)
    assert(log.readRange("d", new java.math.BigDecimal("1"),
      new java.math.BigDecimal("8")).inputFiles.length === 1)
    // SCALE growth would silently shift tag/bloom string forms: refuse
    val e = intercept[IllegalArgumentException] {
      log.append(Seq("5.1234").toDF("s")
        .select(expr("CAST(s AS DECIMAL(14,4))").as("d")))
    }
    assert(e.getMessage.contains("cannot change column"))
  }

  test("widening recurses through containers: array<int> -> array<long>, map values") {
    val t = tmpTable("wid-cont")
    val log = CommitLog(spark, t)
    log.append(Seq((1L, Seq(1, 2), Map("k" -> 1.5f))).toDF("id", "a", "m"))
    log.append(Seq((2L, Seq(3000000000L), Map("k" -> 9.5))).toDF("id", "a", "m"))
    assert(log.read().schema("a").dataType === ArrayType(LongType))
    assert(log.read().schema("m").dataType
      === MapType(StringType, DoubleType, valueContainsNull = true))
    // old narrow files read through the widened interiors natively;
    // a later narrow batch upcasts per element before landing
    log.append(Seq((3L, Seq(7), Map("k" -> 2.5f))).toDF("id", "a", "m"))
    assert(log.read().orderBy("id")
      .select($"id", $"a", $"m"("k").as("mv"))
      .as[(Long, Seq[Long], Double)].collect().toSeq
      === Seq((1L, Seq(1L, 2L), 1.5f.toDouble),
        (2L, Seq(3000000000L), 9.5), (3L, Seq(7L), 2.5f.toDouble)))
    // an interior float->double marks the COLUMN string-shifted
    assert(CommitLog.strShifted(log.snapshot().schema.get("m")))
    assert(!CommitLog.strShifted(log.snapshot().schema.get("a")))
    // map KEY widening stays refused (a key is the map's identity)
    val e = intercept[IllegalArgumentException] {
      log.append(Seq((4L, Seq(1), Map(1L -> 2.5))).toDF("id", "a", "m"))
    }
    assert(e.getMessage.contains("KEY type")
      || e.getMessage.contains("cannot change column"))
  }

  test("cross-family changes still refuse loudly") {
    val t = tmpTable("wid-x")
    val log = CommitLog(spark, t)
    log.append(Seq((1L, 1.5f)).toDF("id", "p"))
    intercept[IllegalArgumentException] {
      log.append(Seq(("x", 1.5f)).toDF("id", "p")) // string over long
    }
    intercept[IllegalArgumentException] {
      log.append(Seq((1L, 2L)).toDF("id", "p")) // long over float
    }
  }

  test("upsert and partitioned append conform across a widening") {
    val t = tmpTable("wid-up")
    val log = CommitLog(spark, t)
    log.append(Seq((1, 10), (2, 20)).toDF("id", "n")) // both int
    // upsert with long n: schema widens, matched row updates
    log.upsert(Seq((2L, 5000000000L), (3L, 30L)).toDF("id", "n"),
      Seq("id"), CommitLog.LastWins)
    assert(log.read().schema("n").dataType === LongType)
    assert(log.read().orderBy("id").as[(Long, Long)].collect().toSeq
      === Seq((1L, 10L), (2L, 5000000000L), (3L, 30L)))
    // partitioned append on a widened key-adjacent table: int batch
    val t2 = tmpTable("wid-part")
    val log2 = CommitLog(spark, t2)
    log2.appendPartitioned(Seq((1, "a", 1.0)).toDF("id", "tag", "x"), "tag")
    log2.appendPartitioned(Seq((2L, "b", 2.0)).toDF("id", "tag", "x"), "tag")
    assert(log2.read().schema("id").dataType === LongType)
    assert(log2.read().count() === 2L)
  }

  test("a narrow partitioned append upcasts — blooms keep finding its rows") {
    val t = tmpTable("wid-pb")
    val log = CommitLog(spark, t).withBloomIndex(Seq("p"))
    log.appendPartitioned(Seq(("a", 9.5)).toDF("tag", "p"), "tag") // p: double
    // a FLOAT batch through the PARTITIONED path: must land as double
    // (pre-fix it wrote float files whose blooms hashed float strings —
    // an unmarked silent false-negative for point reads)
    log.appendPartitioned(Seq(("b", 0.1f)).toDF("tag", "p"), "tag")
    assert(log.read().schema("p").dataType === DoubleType)
    assert(log.readPoint("p", 0.1f.toDouble).count() === 1L,
      "the upcast row must be bloom-findable at its double value")
  }

  test("a string-shifted PARTITION column refuses partition-scoped writes") {
    val t = tmpTable("wid-pk")
    val log = CommitLog(spark, t)
    log.appendPartitioned(Seq((1L, 0.1f)).toDF("id", "p"), "p") // float key
    log.append(Seq((2L, 9.5)).toDF("id", "p")) // widens p to double
    assert(CommitLog.strShifted(log.snapshot().schema.get("p")))
    // pre-widening tags are float strings; a new partitioned write
    // would derive double strings — one logical partition, two tags
    val e = intercept[IllegalArgumentException] {
      log.appendPartitioned(Seq((3L, 0.5)).toDF("id", "p"), "p")
    }
    assert(e.getMessage.contains("string-shifting"),
      s"partition-scoped writes must refuse, got: ${e.getMessage}")
    // a widened NON-key column keeps partitioned writes working
    val t2 = tmpTable("wid-pk2")
    val log2 = CommitLog(spark, t2)
    log2.appendPartitioned(Seq(("a", 0.1f)).toDF("tag", "v"), "tag")
    log2.append(Seq(("b", 9.5)).toDF("tag", "v"))
    log2.appendPartitioned(Seq(("c", 0.5)).toDF("tag", "v"), "tag")
    assert(log2.read().count() === 3L)
  }

  test("readChanges spans a widening with one coherent feed schema") {
    val t = tmpTable("wid-cdc")
    val log = CommitLog(spark, t)
    log.append(Seq((1, "a")).toDF("id", "v"))
    log.append(Seq((3000000000L, "b")).toDF("id", "v"))
    val ch = log.readChanges(-1L)
    assert(ch.schema("id").dataType === LongType)
    assert(ch.filter($"_change_type" === "insert")
      .select($"id").as[Long].collect().sorted.toSeq === Seq(1L, 3000000000L))
  }

  test("r17: ALTER COLUMN TYPE widens by DDL — metadata-only, BEFORE the backfill") {
    val wh = Files.createTempDirectory("wid-ddl").toString
    spark.conf.set("spark.sql.catalog.widddl", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.widddl.warehouse", wh)
    Seq((1, "a"), (2, "b")).toDF("id", "v").coalesce(1)
      .writeTo("widddl.t").tableProperty("merge.log", "true").create()
    val filesBefore = CommitLog(spark, s"$wh/t").snapshot().files.toSet
    // the standard lakehouse habit: widen the column BEFORE any wide
    // value exists — no write has forced the evolution yet
    spark.sql("ALTER TABLE widddl.t ALTER COLUMN id TYPE BIGINT")
    assert(spark.table("widddl.t").schema("id").dataType === LongType)
    assert(filesBefore.subsetOf(
      CommitLog(spark, s"$wh/t").snapshot().files.toSet),
      "DDL widening must not rewrite any file")
    // old files read through the widened schema; a narrow append
    // upcasts; the backfill's wide values land
    Seq((3, "c")).toDF("id", "v").writeTo("widddl.t").append()
    Seq((3000000000L, "d")).toDF("id", "v").writeTo("widddl.t").append()
    assert(spark.table("widddl.t").orderBy("id").as[(Long, String)]
      .collect().toSeq
      === Seq((1L, "a"), (2L, "b"), (3L, "c"), (3000000000L, "d")))
    // non-widening changes refuse loudly, schema untouched
    intercept[Exception] {
      spark.sql("ALTER TABLE widddl.t ALTER COLUMN id TYPE STRING")
    }
    intercept[Exception] {
      spark.sql("ALTER TABLE widddl.t ALTER COLUMN id TYPE INT")
    }
    assert(spark.table("widddl.t").schema("id").dataType === LongType)
    // library form: a NESTED struct-interior path widens too
    val t2 = tmpTable("wid-ddl-nested")
    val log2 = CommitLog(spark, t2)
    log2.append(Seq((1, 2)).toDF("a", "b").select(struct($"a", $"b").as("s")))
    log2.widenColumnType(Seq("s", "a"), LongType)
    assert(log2.read().schema("s").dataType.asInstanceOf[StructType]("a")
      .dataType === LongType)
    assert(log2.read().select($"s.a").as[Long].collect().toSeq === Seq(1L))
    // widening to the current type is a no-op: no commit burned
    val v = log2.snapshot().version
    assert(log2.widenColumnType(Seq("s", "a"), LongType) === v)
    // container interiors widen by DDL too (ALTER COLUMN xs TYPE
    // ARRAY<BIGINT> — the shape a wide array write already admits)
    val t3 = tmpTable("wid-ddl-arr")
    val log3 = CommitLog(spark, t3)
    log3.append(Seq(Tuple1(Seq(1, 2))).toDF("xs"))
    log3.widenColumnType(Seq("xs"), ArrayType(LongType))
    assert(log3.read().schema("xs").dataType.asInstanceOf[ArrayType]
      .elementType === LongType)
    assert(log3.read().select(explode($"xs")).as[Long].collect().sorted.toSeq
      === Seq(1L, 2L))
    // a whole-struct retype is ambiguous — loud refusal names the fix
    val e3 = intercept[IllegalArgumentException] {
      log2.widenColumnType(Seq("s"),
        StructType(Seq(StructField("a", LongType), StructField("b", LongType))))
    }
    assert(e3.getMessage.contains("widen the leaf"))
  }

  test("r17: post-widen files' blooms keep excluding; pre-widen bits stay void") {
    val t = tmpTable("wid-era")
    val log = CommitLog(spark, t).withBloomIndex(Seq("p"))
    log.append(Seq(0.1f, 2.5f).toDF("p").coalesce(1)) // file A: era-0 bits
    log.widenColumnType(Seq("p"), DoubleType)         // era 1, metadata-only
    assert(log.read().schema("p").dataType === DoubleType)
    assert(CommitLog.strShifted(log.snapshot().schema.get("p")))
    val filesA = log.snapshot().files.toSet
    log.append(Seq(0.7, 2.9).toDF("p").coalesce(1))   // file B: era-1 bits
    val filesAB = log.snapshot().files.toSet
    log.append(Seq(0.65, 2.2).toDF("p").coalesce(1))  // file C: era-1 bits
    val fA = filesA.head
    val fB = (filesAB -- filesA).head
    val fC = (log.snapshot().files.toSet -- filesAB).head
    // probe 0.7: every file's min/max covers it, so only BLOOM evidence
    // can prune — C's post-widen (same-era) filter excludes it, while
    // A's pre-widen bits are void and must keep the file
    val cands = log.pointCandidateFiles("p", 0.7).toSet
    assert(cands.contains(fA), "pre-widen bloom bits must stay void (keep A)")
    assert(cands.contains(fB), "the file holding the value must survive")
    assert(!cands.contains(fC),
      s"a post-widen file's same-era bloom must exclude; candidates=$cands")
    // and the r16 correctness pin still holds: the stored float row is
    // FOUND through the widened type (A's old bits never falsely exclude)
    assert(log.readPoint("p", 0.1f.toDouble).count() === 1L)
  }
}
