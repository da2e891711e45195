package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{AsOf, Dedup, Sinks, Upsert}

/** The reference's main ingest pipeline (SURVEY §3 EP1) as one lazy
  * DataFrame DAG: list → per-key enrichment → null filter → projection →
  * stations upsert + prices snapshot append, with a run report carrying
  * the reference's stage counts and elapsed time
  * (/root/reference/index.js:41-58, 94, 143, 167).
  */
object FuelIngest {

  final case class RunReport(
      nStubs: Long,
      nFetched: Long,
      nQuarantined: Long,
      nFiltered: Long,
      nStationsBefore: Long,
      nStationsAfter: Long,
      nPriceSnapshots: Long,
      elapsedMinutes: Double)

  /** Run one ingest cycle. `runTs` is injected (not now()) so runs are
    * reproducible and testable — formatted 'yyyy-MM-dd HH:mm:ss' at the
    * boundary exactly like the reference (index.js:311,336,364-365). */
  def run(
      spark: SparkSession,
      source: StationSource,
      stationsPath: String,
      pricesPath: String,
      runTs: java.sql.Timestamp,
      quarantinePath: Option[String] = None): RunReport = {
    val t0 = System.nanoTime()

    // A2/A3: list endpoint → stubs
    val stubs = source.stationStubs(spark).cache()
    val nStubs = stubs.count()

    // A4: fan-out lookup enrichment (partition-parallel)
    val enriched = LookupEnricher.enrich(stubs, "id", source).cache()
    val nFetched = enriched.filter(col("detail").isNotNull).count()
    // A14: failed/missing lookups are routed to a quarantine output (not
    // silently dropped) — the reference only log-and-continues
    val quarantined = enriched.filter(col("detail").isNull)
      .select(col("id"), col("nome"), lit("detail_fetch_failed").as("reason"),
        lit(runTs).cast("timestamp").as("quarantined_at"))
    val nQuarantined = quarantined.count()
    quarantinePath.foreach(p =>
      quarantined.write.mode("append").parquet(p))

    // A5: null-rejecting filter (index.js:118-120)
    val filtered = enriched.filter(
      col("detail.Nome").isNotNull &&
        col("detail.Morada").isNotNull &&
        col("detail.Combustiveis").isNotNull)
      .cache()
    val nFiltered = filtered.count()

    // A6: wide projection; Utilizacao intentionally dropped (index.js:356-366)
    val ts = lit(runTs).cast("timestamp")
    val stations = filtered.select(
      col("id").as("Id"),
      col("detail.Nome").as("Nome"),
      col("detail.Marca").as("Marca"),
      col("detail.Morada").as("Morada"),
      col("detail.HorarioPosto").as("HorarioPosto"),
      col("detail.Servicos").as("Servicos"),
      col("detail.MeiosPagamento").as("MeiosPagamento"),
      ts.as("CreateTimestamp"),
      ts.as("UpdateTimestamp"))

    // A10: in-array dedup by DataAtualizacao, deterministic last-wins
    // (the reference's JS-Map dedup, index.js:63-79) — explode → window →
    // re-collect, keeping array order by DataAtualizacao.
    val pricesClean = filtered.select(col("id").as("Id"),
        posexplode(col("detail.Combustiveis")).as(Seq("pos", "fuel")))
      .transform(df => Dedup.keepOne(df,
        Seq("Id", "fuel.DataAtualizacao", "fuel.Combustivel"),
        Seq(col("pos").desc)))
      .groupBy(col("Id"))
      .agg(array_sort(collect_list(struct(
        col("fuel.DataAtualizacao").as("DataAtualizacao"),
        col("fuel.Combustivel").as("Combustivel"),
        col("fuel.Preco").as("Preco")))).as("Combustiveis"))

    // A7: insert-if-absent upsert into stations (index.js:352-375)
    val fs = new org.apache.hadoop.fs.Path(stationsPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val nStationsBefore =
      if (fs.exists(new org.apache.hadoop.fs.Path(stationsPath)))
        spark.read.parquet(stationsPath).count()
      else 0L
    Sinks.upsertParquet(spark, stationsPath, stations, Seq("Id"))
    val nStationsAfter = spark.read.parquet(stationsPath).count()

    // A8: unconditional snapshot append to the prices time series
    // (index.js:329-345), date-partitioned for pruning at scale.
    pricesClean
      .withColumn("Timestamp", ts)
      .withColumn("snapshot_date", to_date(ts))
      .write.mode("append").partitionBy("snapshot_date").parquet(pricesPath)
    val nPriceSnapshots = pricesClean.count()

    stubs.unpersist(); enriched.unpersist(); filtered.unpersist()

    // A12: elapsed minutes (index.js:27,55-56)
    RunReport(nStubs, nFetched, nQuarantined, nFiltered,
      nStationsBefore, nStationsAfter, nPriceSnapshots,
      (System.nanoTime() - t0) / 6e10)
  }

  /** A9 read path: latest price snapshot per station as of `t`
    * (index.js:301-321). Partition pruning on snapshot_date does the work
    * the DynamoDB sort key did. */
  def latestPricesAsOf(spark: SparkSession, pricesPath: String, t: String): DataFrame =
    AsOf.latestAsOf(
      spark.read.parquet(pricesPath).filter(col("snapshot_date") <= to_date(lit(t))),
      Seq("Id"), "Timestamp", t)
      .drop("snapshot_date")
}
