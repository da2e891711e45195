package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** B1 file sources beyond parquet: CSV with an explicit schema (never
  * inferSchema — a schema-inference pass is a second full scan at 100 TB)
  * round-trips losslessly (note the parquet testdata timestamps are
  * TIMESTAMP_NTZ — the CSV schema must say so too). JSON (multiline + JSONL + from_json) is
  * exercised by FuelPipelineSpec/StationSource. */
class SourcesSpec extends SparkSpecBase {
  import spark.implicits._

  test("rest-json DSv2 source: real scan node matching FileBackedSource, paged, pushdown") {
    val path = resource("/fuel/stations_raw.json")
    val viaDsv2 = spark.read.format("rest-json").option("path", path).load()
    val viaDriver = new graft.pipeline.FileBackedSource(path, "/dev/null")
      .stationStubs(spark)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "nome").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(canon(viaDsv2) === canon(viaDriver))
    assert(viaDsv2.schema.fieldNames.toSeq === Seq("id", "nome"))

    // pages=3 models parallel pagination: three input partitions, same rows
    val paged = spark.read.format("rest-json")
      .option("path", path).option("pages", "3").load()
    assert(paged.rdd.getNumPartitions === 3)
    assert(canon(paged) === canon(viaDriver))

    // id predicates push into the scan (the per-key lookup shape, A4)
    val one = viaDsv2.filter($"id" === 3L)
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [EqualTo(id,3)]"), plan)
    assert(one.collect().map(_.getLong(0)).toSeq === Seq(3L))
    val in = viaDsv2.filter($"id".isin(1L, 6L, 99L))
    assert(in.queryExecution.executedPlan.toString.contains("In(id"),
      in.queryExecution.executedPlan.toString)
    assert(in.collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 6L))

    // residual predicates stay in the engine but still evaluate correctly
    val residual = viaDsv2.filter($"nome".startsWith("P"))
    assert(residual.queryExecution.executedPlan.toString
      .contains("PushedFilters: []"))
    assert(canon(residual) === canon(viaDriver).filter(_._2.startsWith("P")))

    // column pruning reaches the reader: a nome-only projection never
    // materializes ids
    val pruned = spark.read.format("rest-json").option("path", path).load()
      .select("nome")
    assert(pruned.queryExecution.executedPlan.toString.contains("ReadSchema: struct<nome:string>"),
      pruned.queryExecution.executedPlan.toString)
    assert(pruned.collect().map(_.getString(0)).toSet ===
      canon(viaDriver).map(_._2))
  }

  test("CSV sink + explicit-schema scan round-trips lineitem columns") {
    val dir = Files.createTempDirectory("csv-src").toString
    val src = graft.sources.Tables(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_shipdate")
    src.write.mode("overwrite").option("header", "true").csv(dir)

    val schema = StructType(Seq(
      StructField("l_orderkey", LongType),
      StructField("l_linenumber", IntegerType),
      StructField("l_quantity", DoubleType),
      StructField("l_returnflag", StringType),
      StructField("l_shipdate", TimestampNTZType)))
    val back = spark.read.schema(schema).option("header", "true").csv(dir)

    assert(back.schema === schema)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    assert(canon(back) === canon(src))
    assert(back.count() > 0)
  }
}
