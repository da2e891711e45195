package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-generated testdata tables (TESTDATA.md).
  *
  * Parquet scans are the engine's primary source: Catalyst pushes filters
  * and prunes columns into the scan (the scale story for 100 TB — see
  * `.explain` `PushedFilters`/`ReadSchema`). The reference's sources are
  * two HTTP JSON endpoints (`/root/reference/index.js:81-100,109-144`);
  * those are modeled separately in [[graft.pipeline]].
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeTs(df) else df
  }

  /** Normalize the `ts` column across testdata generations.
    *
    * The driver has shipped `events.ts` in two parquet shapes:
    *   - TIMESTAMP(NANOS), surfaced as long nanos via
    *     spark.sql.legacy.parquet.nanosAsLong — truncate to micros exactly as
    *     DuckDB does so oracle comparisons agree;
    *   - TIMESTAMP(MICROS, isAdjustedToUTC=false), which Spark 4 reads as
    *     TIMESTAMP_NTZ — cast to the session timestamp type. The session
    *     timezone is pinned to UTC ([[graft.Sessions]]), so the wall-clock
    *     values are unchanged and keep hash-matching the DuckDB oracle.
    */
  def normalizeTs(df: DataFrame): DataFrame =
    if (!df.schema.fieldNames.contains("ts")) df
    else df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", df("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
}
