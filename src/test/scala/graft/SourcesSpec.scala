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
