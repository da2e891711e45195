package graft

import java.nio.file.Files
import graft.pipeline.{FileBackedSource, FuelIngest}

/** Runnable end-to-end demo of the fuel pipeline (the reference's EP1) on
  * the bundled fixtures: two ingest runs (second exercises the upsert
  * conflict branch), then the as-of read. Usage: runMain graft.FuelDemo */
object FuelDemo {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("fuel-demo", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    val res = getClass.getResource("/fuel/stations_raw.json")
    val (rawPath, detailPath) =
      if (res != null)
        (res.getPath, getClass.getResource("/fuel/station_details.jsonl").getPath)
      else // running outside test classpath: use the repo files
        ("src/test/resources/fuel/stations_raw.json",
          "src/test/resources/fuel/station_details.jsonl")
    val source = new FileBackedSource(rawPath, detailPath)
    val base = Files.createTempDirectory("fuel-demo").toString
    val r1 = FuelIngest.run(spark, source, s"$base/stations", s"$base/prices",
      java.sql.Timestamp.valueOf("2023-01-12 06:00:00"), Some(s"$base/quarantine"))
    println(s"[demo] run1: $r1")
    val r2 = FuelIngest.run(spark, source, s"$base/stations", s"$base/prices",
      java.sql.Timestamp.valueOf("2023-01-13 06:00:00"), Some(s"$base/quarantine"))
    println(s"[demo] run2: $r2 (stations unchanged: ${r2.nStationsBefore == r2.nStationsAfter})")
    println("[demo] latest prices as of 2023-01-12 23:00:00:")
    FuelIngest.latestPricesAsOf(spark, s"$base/prices", "2023-01-12 23:00:00")
      .show(truncate = false)
    spark.stop()
  }
}
