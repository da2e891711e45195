package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** r13 DEEP struct evolution: nested column RENAME/DROP as
  * metadata-only commits — the [[CommitLog.PhysKey]] mapping extends
  * to struct-INTERIOR fields (any depth; r15: through ARRAY elements
  * and MAP values too; map keys stay refused), closing the r12 gap
  * where only top-level rename/drop and nested additive ADD were
  * supported. Pins: zero files touched, both
  * read paths (library cast-rename + V2 recursive schema
  * translation), writes landing under stable physical names, the
  * swap-rename pushdown hazard (a predicate into a mapped interior
  * must NOT be pushed under logical names — false row-group pruning),
  * nested drop + re-add no-resurrection, time travel, CDC
  * normalization across a nested rename, and materialize_mapping
  * stripping interior mappings. */
class NestedMappingSpec extends graft.SparkSpecBase {
  import spark.implicits._

  private def tmpRoot(tag: String): String =
    Files.createTempDirectory(s"gnm-$tag").toString + "/t"

  private def seed(root: String): CommitLog = {
    val log = CommitLog(spark, root)
    log.append(Seq((1L, ("x1", 10.0), "r1"), (2L, ("x2", 20.0), "r2"))
      .toDF("id", "s", "v")
      .withColumn("s", struct($"s._1".as("a"), $"s._2".as("b"))))
    log
  }

  test("nested rename is metadata-only; mixed old/new files read correctly") {
    val root = tmpRoot("ren")
    val log = seed(root)
    val filesBefore = log.snapshot().files.toSet
    log.renameColumn(Seq("s", "a"), "alpha")
    assert(log.snapshot().files.toSet === filesBefore, "rename touched files")
    // logical view shows the new nested name with the old values
    assert(log.read().schema("s").dataType.asInstanceOf[StructType]
      .fieldNames.toSeq === Seq("alpha", "b"))
    assert(log.read().select($"s.alpha").as[String].collect().sorted.toSeq
      === Seq("x1", "x2"))
    // a write AFTER the rename lands under the stable PHYSICAL name:
    // new + old files both resolve
    log.append(Seq((3L, ("x3", 30.0), "r3")).toDF("id", "s", "v")
      .withColumn("s", struct($"s._1".as("alpha"), $"s._2".as("b"))))
    assert(log.read().select($"s.alpha").as[String].collect().sorted.toSeq
      === Seq("x1", "x2", "x3"))
    // the new file physically holds 'a' (stable name), not 'alpha'
    val newest = log.snapshot().files.filterNot(filesBefore).head
    val raw = spark.read.parquet(s"$root/$newest")
    assert(raw.schema("s").dataType.asInstanceOf[StructType]
      .fieldNames.toSeq === Seq("a", "b"))
    // time travel: the pre-rename version still reads 's.a'
    assert(log.readVersion(0L).select($"s.a").as[String].collect().sorted.toSeq
      === Seq("x1", "x2"))
    // double rename keeps the FIRST physical name pinned
    log.renameColumn(Seq("s", "alpha"), "alef")
    assert(log.read().select($"s.alef").as[String].collect().sorted.toSeq
      === Seq("x1", "x2", "x3"))
  }

  test("SQL: nested RENAME/DROP via ALTER TABLE; swap-rename filters stay exact") {
    val wh = Files.createTempDirectory("gnm-cat").toString
    spark.conf.set("spark.sql.catalog.gnm", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gnm.warehouse", wh)
    Seq((1L, ("k1", 100L), 1.0), (2L, ("k2", 200L), 2.0), (3L, ("k3", 300L), 3.0))
      .toDF("id", "s", "v")
      .withColumn("s", struct($"s._1".as("a"), $"s._2".as("b")))
      .writeTo("gnm.t").tableProperty("merge.log", "true").create()
    spark.sql("ALTER TABLE gnm.t RENAME COLUMN s.a TO name")
    assert(spark.sql("SELECT s.name FROM gnm.t ORDER BY id")
      .as[String].collect().toSeq === Seq("k1", "k2", "k3"))
    // FULL SWAP of the two interior names — the adversarial pushdown
    // case: a filter on s.b must see the data that NOW bears that
    // logical name (physical 'a'), never the physical 'b' column
    spark.sql("ALTER TABLE gnm.t RENAME COLUMN s.b TO tmpcol")
    spark.sql("ALTER TABLE gnm.t RENAME COLUMN s.name TO b")
    spark.sql("ALTER TABLE gnm.t RENAME COLUMN s.tmpcol TO name")
    // now: logical s.b = old s.a (strings), logical s.name = old s.b (longs)
    assert(spark.sql("SELECT id FROM gnm.t WHERE s.b = 'k2'")
      .as[Long].collect().toSeq === Seq(2L))
    assert(spark.sql("SELECT id FROM gnm.t WHERE s.name = 300")
      .as[Long].collect().toSeq === Seq(3L))
    val plan = spark.sql("SELECT id FROM gnm.t WHERE s.name = 300")
      .queryExecution.executedPlan.toString
    assert(plan.contains("Filter"), "interior predicate must stay residual")
    // nested DROP via SQL, then nested re-ADD reads null (no resurrection)
    spark.sql("ALTER TABLE gnm.t DROP COLUMN s.name")
    assert(spark.sql("SELECT s FROM gnm.t").schema("s").dataType
      .asInstanceOf[StructType].fieldNames.toSeq === Seq("b"))
    spark.sql("ALTER TABLE gnm.t ADD COLUMNS (s.name BIGINT)")
    assert(spark.sql("SELECT s.name FROM gnm.t").as[java.lang.Long]
      .collect().toSeq.forall(_ == null),
      "a re-added nested namesake must NOT resurrect dropped bytes")
  }

  test("SQL: container evolution via Spark's accessor paths (element/value)") {
    // Spark's SQL field resolution spells container interiors with
    // explicit accessors (`arr.element.a`, `m.value.a`); the library
    // form omits them (`arr.a`). Both must land on the same field —
    // and the physPathOf/rewriteStructPath pair must agree, or a drop
    // would retire a path no re-add ever collides with.
    val wh = Files.createTempDirectory("gacc-cat").toString
    spark.conf.set("spark.sql.catalog.gacc", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gacc.warehouse", wh)
    Seq(1L).toDF("id")
      .withColumn("arr", typedLit(Seq(("x1", 1.0)))
        .cast("array<struct<a:string,b:double>>"))
      .withColumn("m", map(lit("k"), struct(lit("y").as("a"), lit(2.0).as("b"))))
      .writeTo("gacc.t").tableProperty("merge.log", "true").create()
    spark.sql("ALTER TABLE gacc.t RENAME COLUMN arr.element.a TO alpha")
    assert(spark.sql("SELECT arr[0].alpha FROM gacc.t")
      .as[String].collect().toSeq === Seq("x1"))
    spark.sql("ALTER TABLE gacc.t RENAME COLUMN m.value.a TO alpha")
    assert(spark.sql("SELECT m['k'].alpha FROM gacc.t")
      .as[String].collect().toSeq === Seq("y"))
    // DROP through the accessor retires the same physical path the
    // library form would
    spark.sql("ALTER TABLE gacc.t DROP COLUMN arr.element.b")
    val snap = CommitLog(spark, s"$wh/t").snapshot()
    assert(snap.physRetired.contains("arr.b"),
      s"accessor drop must retire 'arr.b', got ${snap.physRetired}")
    // map KEY evolution refuses through every spelling
    val e = intercept[Exception](
      spark.sql("ALTER TABLE gacc.t RENAME COLUMN m.key TO z"))
    assert(e.getMessage.contains("key"),
      s"key rename must refuse, got: ${e.getMessage}")
  }

  test("an ambiguous element/value namesake path refuses loudly (r16)") {
    // the interior struct has a REAL field named `element` — Spark's
    // accessor spelling `arr.element.a` then has TWO valid readings
    // (the interior's own `a`, and the namesake field's `a`); the
    // pre-r16 namesake-wins rule silently retargeted DDL copied from
    // Spark's schema output. Both-resolve must refuse; a reading only
    // one side supports still works.
    val t = Files.createTempDirectory("gamb").toString + "/t"
    val log = CommitLog(spark, t)
    log.append(Seq(1L).toDF("id")
      .withColumn("arr", typedLit(Seq((("ix", 1.0), "ia")))
        .cast("array<struct<element:struct<a:string,b:double>,a:string>>")))
    val e = intercept[IllegalArgumentException] {
      log.renameColumn(Seq("arr", "element", "a"), "alpha")
    }
    assert(e.getMessage.contains("ambiguous path component"),
      s"both-resolve must refuse, got: ${e.getMessage}")
    // the library form (no accessor component) addresses the interior
    // unambiguously…
    log.renameColumn(Seq("arr", "a"), "alpha")
    // …and the namesake field's OWN interior, where the container
    // interior has no such field, still resolves to the namesake
    log.renameColumn(Seq("arr", "element", "b"), "beta")
    val elT = log.read().schema("arr").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType]
      .elementType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(elT.fieldNames.toSeq === Seq("element", "alpha"))
    assert(elT("element").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.toSeq === Seq("a", "beta"))
  }

  test("container-interior additive evolution: add a field inside array/map structs (r15)") {
    val root = tmpRoot("cadd")
    val log = CommitLog(spark, root)
    log.append(Seq(1L).toDF("id")
      .withColumn("arr", typedLit(Seq(("x1", 1.0)))
        .cast("array<struct<a:string,b:double>>"))
      .withColumn("m", map(lit("k1"), struct(lit("y1").as("a")))))
    val files0 = log.snapshot().files.toSet
    // WRITE-DRIVEN: a batch whose elements carry a new interior field
    // evolves the schema; the old file's elements read null there
    log.append(Seq(2L).toDF("id")
      .withColumn("arr", typedLit(Seq(("x2", 2.0, 7L)))
        .cast("array<struct<a:string,b:double,c:bigint>>"))
      .withColumn("m", map(lit("k2"), struct(lit("y2").as("a")))))
    val got = log.read().select($"id", explode($"arr").as("e"))
      .select($"id", $"e.a", $"e.c").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) null else r.getLong(2))).toSet
    assert(got === Set((1L, "x1", null), (2L, "x2", 7L)))
    // a write MISSING the evolved interior field stays accepted,
    // null-padded per element (conformCol container recursion)
    log.append(Seq(3L).toDF("id")
      .withColumn("arr", typedLit(Seq(("x3", 3.0)))
        .cast("array<struct<a:string,b:double>>"))
      .withColumn("m", map(lit("k3"), struct(lit("y3").as("a")))))
    assert(log.read().filter($"id" === 3L)
      .select(explode($"arr").as("e")).select($"e.c")
      .as[java.lang.Long].collect().toSeq === Seq(null))
    // METADATA-ONLY library add inside the MAP value struct
    val filesBefore = log.snapshot().files.toSet
    log.addNestedColumn(Seq("m"), StructField("score", DoubleType))
    assert(log.snapshot().files.toSet === filesBefore, "nested add touched files")
    assert(log.read().select(explode($"m")).select($"value.score")
      .as[java.lang.Double].collect().forall(_ == null))
    // a post-add write lands values in the new interior field
    log.append(Seq(4L).toDF("id")
      .withColumn("arr", typedLit(Seq(("x4", 4.0, 9L)))
        .cast("array<struct<a:string,b:double,c:bigint>>"))
      .withColumn("m", map(lit("k4"),
        struct(lit("y4").as("a"), lit(0.5).as("score")))))
    assert(log.read().filter($"id" === 4L)
      .select(explode($"m")).select($"value.score")
      .as[Double].collect().toSeq === Seq(0.5))
    // DROP the interior field, re-ADD the namesake: fresh suffixed
    // physical name, old bytes never resurrect
    log.dropColumn(Seq("arr", "c"))
    log.addNestedColumn(Seq("arr"), StructField("c", LongType))
    assert(log.snapshot().physRetired.contains("arr.c"))
    val elT = log.snapshot().schema.get("arr").dataType
      .asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
    assert(CommitLog.physNameOf(elT("c")) === "c_1",
      "re-added interior namesake must take a fresh physical name")
    assert(log.read().select(explode($"arr").as("e")).select($"e.c")
      .as[java.lang.Long].collect().forall(_ == null),
      "dropped interior bytes must not resurrect")
    assert(files0.subsetOf(log.snapshot().files.toSet),
      "every evolution step was metadata-only for existing files")
  }

  test("SQL: ADD COLUMNS through container accessors (r15)") {
    val wh = Files.createTempDirectory("gcadd-cat").toString
    spark.conf.set("spark.sql.catalog.gcadd", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gcadd.warehouse", wh)
    Seq(1L).toDF("id")
      .withColumn("arr", typedLit(Seq(("x1", 1.0)))
        .cast("array<struct<a:string,b:double>>"))
      .withColumn("m", map(lit("k"), struct(lit("y").as("a"))))
      .writeTo("gcadd.t").tableProperty("merge.log", "true").create()
    spark.sql("ALTER TABLE gcadd.t ADD COLUMNS (arr.element.c BIGINT)")
    assert(spark.sql("SELECT arr[0].c FROM gcadd.t")
      .as[java.lang.Long].collect().toSeq === Seq(null))
    spark.sql("ALTER TABLE gcadd.t ADD COLUMNS (m.value.score DOUBLE)")
    assert(spark.sql("SELECT m['k'].score FROM gcadd.t")
      .as[java.lang.Double].collect().toSeq === Seq(null))
    // the evolved interior accepts a full-shape insert
    spark.sql("INSERT INTO gcadd.t VALUES (2L, " +
      "array(named_struct('a', 'x2', 'b', 2.0, 'c', 7L)), " +
      "map('k2', named_struct('a', 'y2', 'score', 0.9)))")
    assert(spark.sql("SELECT arr[0].c FROM gcadd.t WHERE id = 2")
      .as[Long].collect().toSeq === Seq(7L))
  }

  test("nested drop retires the physical path; library re-add gets a fresh name") {
    val root = tmpRoot("drop")
    val log = seed(root)
    log.dropColumn(Seq("s", "b"))
    assert(log.snapshot().physRetired === Seq("s.b"))
    log.addNestedColumn(Seq("s"), StructField("b", DoubleType))
    // old rows read null; the physical name is suffixed
    assert(log.read().select($"s.b").as[java.lang.Double].collect()
      .forall(_ == null))
    val inner = log.snapshot().schema.get("s").dataType
      .asInstanceOf[StructType]
    assert(CommitLog.physNameOf(inner("b")) === "b_1")
    // new writes land values under the fresh physical name
    log.upsert(Seq((1L, ("x1", 99.9), "r1")).toDF("id", "s", "v")
        .withColumn("s", struct($"s._1".as("a"), $"s._2".as("b"))),
      Seq("id"), CommitLog.LastWins)
    assert(log.read().filter($"id" === 1L).select($"s.b")
      .as[Double].head() === 99.9)
    // dropping the LAST interior field is refused
    val root2 = tmpRoot("drop-last")
    val log2 = CommitLog(spark, root2)
    log2.append(Seq((1L, Tuple1("x"))).toDF("id", "s")
      .withColumn("s", struct($"s._1".as("only"))))
    val e = intercept[IllegalArgumentException](log2.dropColumn(Seq("s", "only")))
    assert(e.getMessage.contains("drop the struct column instead"))
  }

  test("array-element rename/drop are metadata-only (r15)") {
    val root = tmpRoot("arr")
    val log = CommitLog(spark, root)
    def arr(vals: (String, Double)*) = typedLit(vals).cast(
      "array<struct<a:string,b:double>>")
    log.append(Seq(1L).toDF("id").withColumn("arr", arr(("x1", 1.0), ("x2", 2.0))))
    val filesBefore = log.snapshot().files.toSet
    // RENAME inside the array element: zero files touched
    log.renameColumn(Seq("arr", "a"), "alpha")
    assert(log.snapshot().files.toSet === filesBefore, "rename touched files")
    assert(log.read().schema("arr").dataType
      .asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
      .fieldNames.toSeq === Seq("alpha", "b"))
    assert(log.read().select(expr("arr[0].alpha")).as[String].collect().toSeq
      === Seq("x1"))
    // a post-rename write lands under the STABLE physical element name
    log.append(Seq(2L).toDF("id").withColumn("arr",
      typedLit(Seq(("x3", 3.0))).cast("array<struct<alpha:string,b:double>>")))
    assert(log.read().select(explode($"arr").as("e")).select($"e.alpha")
      .as[String].collect().sorted.toSeq === Seq("x1", "x2", "x3"))
    val newest = log.snapshot().files.filterNot(filesBefore).head
    assert(spark.read.parquet(s"$root/$newest").schema("arr").dataType
      .asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
      .fieldNames.toSeq === Seq("a", "b"), "new file must hold the physical name")
    // time travel reads the pre-rename element name
    assert(log.readVersion(0L).select(expr("arr[0].a")).as[String]
      .collect().toSeq === Seq("x1"))
    // CDC across the element rename normalizes to feed-final names
    val ch = log.readChanges(-1L)
    assert(ch.schema("arr").dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType].fieldNames.toSeq
      === Seq("alpha", "b"))
    assert(ch.filter($"_change_type" === "insert")
      .select(explode($"arr").as("e")).select($"e.alpha")
      .as[String].collect().sorted.toSeq === Seq("x1", "x2", "x3"))
    // DROP an element field: metadata-only, the survivor still reads
    val before = log.snapshot().files.toSet
    log.dropColumn(Seq("arr", "b"))
    assert(log.snapshot().files.toSet === before, "drop touched files")
    assert(log.read().schema("arr").dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType].fieldNames.toSeq === Seq("alpha"))
    assert(log.read().select(explode($"arr").as("e")).select($"e.alpha")
      .as[String].collect().sorted.toSeq === Seq("x1", "x2", "x3"))
    // dropping the LAST element field stays refused
    val eLast = intercept[IllegalArgumentException](
      log.dropColumn(Seq("arr", "alpha")))
    assert(eLast.getMessage.contains("last column"))
  }

  test("map-value rename/drop are metadata-only; key evolution stays refused (r15)") {
    val root = tmpRoot("mapval")
    val log = CommitLog(spark, root)
    log.append(Seq(1L).toDF("id").withColumn("m",
      map(lit("k1"), struct(lit("x1").as("a"), lit(1.0).as("b")),
          lit("k2"), struct(lit("x2").as("a"), lit(2.0).as("b")))))
    val filesBefore = log.snapshot().files.toSet
    // RENAME inside the map value: zero files touched
    log.renameColumn(Seq("m", "a"), "alpha")
    assert(log.snapshot().files.toSet === filesBefore, "rename touched files")
    assert(log.read().schema("m").dataType
      .asInstanceOf[MapType].valueType.asInstanceOf[StructType]
      .fieldNames.toSeq === Seq("alpha", "b"))
    assert(log.read().select(expr("m['k1'].alpha")).as[String]
      .collect().toSeq === Seq("x1"))
    // a post-rename write lands under the STABLE physical value name
    log.append(Seq(2L).toDF("id").withColumn("m",
      map(lit("k3"), struct(lit("x3").as("alpha"), lit(3.0).as("b")))))
    assert(log.read().select(explode($"m")).select($"value.alpha")
      .as[String].collect().sorted.toSeq === Seq("x1", "x2", "x3"))
    val newest = log.snapshot().files.filterNot(filesBefore).head
    assert(spark.read.parquet(s"$root/$newest").schema("m").dataType
      .asInstanceOf[MapType].valueType.asInstanceOf[StructType]
      .fieldNames.toSeq === Seq("a", "b"), "new file must hold the physical name")
    // time travel reads the pre-rename value name
    assert(log.readVersion(0L).select(expr("m['k1'].a")).as[String]
      .collect().toSeq === Seq("x1"))
    // CDC across the value rename normalizes to feed-final names
    val ch = log.readChanges(-1L)
    assert(ch.schema("m").dataType.asInstanceOf[MapType]
      .valueType.asInstanceOf[StructType].fieldNames.toSeq
      === Seq("alpha", "b"))
    assert(ch.filter($"_change_type" === "insert")
      .select(explode($"m")).select($"value.alpha")
      .as[String].collect().sorted.toSeq === Seq("x1", "x2", "x3"))
    // DROP a value field: metadata-only, the survivor still reads
    val before = log.snapshot().files.toSet
    log.dropColumn(Seq("m", "b"))
    assert(log.snapshot().files.toSet === before, "drop touched files")
    assert(log.read().schema("m").dataType.asInstanceOf[MapType]
      .valueType.asInstanceOf[StructType].fieldNames.toSeq === Seq("alpha"))
    assert(log.read().select(explode($"m")).select($"value.alpha")
      .as[String].collect().sorted.toSeq === Seq("x1", "x2", "x3"))
    // dropping the LAST value field stays refused
    val eLast = intercept[IllegalArgumentException](
      log.dropColumn(Seq("m", "alpha")))
    assert(eLast.getMessage.contains("last column"))
    // a map whose VALUE is not a struct has no addressable interior —
    // the walk refuses, naming what CAN evolve
    val kroot = tmpRoot("mapkey")
    val klog = CommitLog(spark, kroot)
    klog.append(Seq(1L).toDF("id").withColumn("m", map(lit("k"), lit(1.0))))
    val e = intercept[IllegalArgumentException](
      klog.renameColumn(Seq("m", "a"), "z"))
    assert(e.getMessage.contains("map keys never evolve"))
    // the key accessor itself refuses with the dedicated message, on
    // BOTH DDL verbs (drop runs the same walk first)
    val e2 = intercept[IllegalArgumentException](
      log.renameColumn(Seq("m", "key"), "z"))
    assert(e2.getMessage.contains("key evolution"))
    val e3 = intercept[IllegalArgumentException](log.dropColumn(Seq("m", "key")))
    assert(e3.getMessage.contains("key evolution"))
  }

  test("CDC across a nested rename normalizes to the feed-final names") {
    val root = tmpRoot("cdc")
    val log = seed(root) // v0
    log.renameColumn(Seq("s", "a"), "alpha") // v1
    log.append(Seq((3L, ("x3", 30.0), "r3")).toDF("id", "s", "v")
      .withColumn("s", struct($"s._1".as("alpha"), $"s._2".as("b")))) // v2
    val ch = log.readChanges(-1L)
    assert(ch.schema("s").dataType.asInstanceOf[StructType]
      .fieldNames.toSeq === Seq("alpha", "b"))
    assert(ch.filter($"_change_type" === "insert")
      .select($"s.alpha").as[String].collect().sorted.toSeq
      === Seq("x1", "x2", "x3"),
      "pre-rename pieces must re-present under the final nested name")
  }

  test("materialize_mapping strips interior mappings and restores pushdown") {
    val root = tmpRoot("mat")
    val log = seed(root)
    log.renameColumn(Seq("s", "a"), "alpha")
    log.materializeMapping()
    val sch = log.snapshot().schema.get
    assert(CommitLog.identityType(sch("s").dataType)
      && CommitLog.physNameOf(sch("s")) === "s")
    // files now physically carry 'alpha'
    val raw = spark.read.parquet(log.snapshot().files.map(f => s"$root/$f"): _*)
    assert(raw.schema("s").dataType.asInstanceOf[StructType]
      .fieldNames.toSeq === Seq("alpha", "b"))
    assert(log.read().select($"s.alpha").as[String].collect().sorted.toSeq
      === Seq("x1", "x2"))
  }
}
