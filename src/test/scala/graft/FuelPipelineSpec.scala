package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.pipeline.{FileBackedSource, FuelIngest}

/** End-to-end fuel pipeline on the hand-written fixtures (FIXTURES.md §2):
  * exercises A2-A14 — list scan, fan-out enrichment, null filter, wide
  * projection, upsert, snapshot append, as-of read, in-array dedup,
  * quarantine counting. */
/** Shared-JVM probe state for the enricher tests (local mode: executor
  * threads live in the test JVM, so statics are visible). */
object EnricherProbe {
  import java.util.concurrent.atomic.AtomicInteger
  val attempts = new java.util.concurrent.ConcurrentHashMap[Long, AtomicInteger]()
  val inFlight = new AtomicInteger(0)
  val maxObserved = new AtomicInteger(0)
  def reset(): Unit = { attempts.clear(); inFlight.set(0); maxObserved.set(0) }
}

/** Injected flaky/slow fetcher: throws `transientFailures` times per key
  * (then succeeds), always throws for `alwaysFail` keys, and sleeps
  * `sleepMs` per call to make concurrency observable. */
final class FlakyProbeSource(transientFailures: Int, sleepMs: Long,
    alwaysFail: Set[Long] = Set.empty) extends graft.pipeline.StationSource {
  override def stationStubs(spark: org.apache.spark.sql.SparkSession) =
    sys.error("not used")
  override def detailFetcher(): Long => Option[String] = id => {
    val cur = EnricherProbe.inFlight.incrementAndGet()
    EnricherProbe.maxObserved.getAndAccumulate(cur, Math.max(_, _))
    try {
      if (sleepMs > 0) Thread.sleep(sleepMs)
      val n = EnricherProbe.attempts
        .computeIfAbsent(id, _ => new java.util.concurrent.atomic.AtomicInteger)
        .incrementAndGet()
      if (alwaysFail(id)) throw new RuntimeException(s"permanent failure for $id")
      if (n <= transientFailures) throw new RuntimeException(s"transient failure $n for $id")
      Some(s"""{"id": $id, "resultado": {"Nome": "station $id"}}""")
    } finally EnricherProbe.inFlight.decrementAndGet()
  }
}

class FuelPipelineSpec extends SparkSpecBase {

  private lazy val source = new FileBackedSource(
    resource("/fuel/stations_raw.json"),
    resource("/fuel/station_details.jsonl"))

  test("two-run ingest: upsert keeps first-run stations, appends snapshots") {
    val base = Files.createTempDirectory("fuel").toString
    val stationsPath = s"$base/stations"
    val pricesPath = s"$base/prices"

    val r1 = FuelIngest.run(spark, source, stationsPath, pricesPath,
      java.sql.Timestamp.valueOf("2023-01-12 06:00:00"),
      quarantinePath = Some(s"$base/quarantine"))
    // 7 stubs; id=7 has no detail (quarantined, A14); ids 3,4,5 fail the
    // null filter (A5) → 3 stations/snapshots survive (1, 2, 6)
    assert(r1.nStubs === 7)
    assert(r1.nFetched === 6)
    assert(r1.nQuarantined === 1)
    assert(r1.nFiltered === 3)
    assert(r1.nStationsBefore === 0)
    assert(r1.nStationsAfter === 3)
    assert(r1.nPriceSnapshots === 3)

    // A14: quarantine output carries the failed lookup with a reason
    val quar = spark.read.parquet(s"$base/quarantine").collect()
    assert(quar.length === 1)
    assert(quar.head.getAs[Long]("id") === 7L)
    assert(quar.head.getAs[String]("reason") === "detail_fetch_failed")

    // typed Dataset surface reads the sink schemas
    val typedStations = graft.pipeline.FuelModel.stations(spark, stationsPath)
      .collect().sortBy(_.Id)
    assert(typedStations.map(_.Id).toSeq === Seq(1L, 2L, 6L))
    assert(typedStations.head.Morada.Localidade === "Lisboa")
    val typedPrices = graft.pipeline.FuelModel.prices(spark, pricesPath).collect()
    assert(typedPrices.length === 3)
    assert(typedPrices.flatMap(_.Combustiveis).forall(_.Preco != null))

    val stations1 = spark.read.parquet(stationsPath)
      .select("Id", "Nome", "CreateTimestamp").orderBy("Id").collect()
    assert(stations1.map(_.getLong(0)).toSeq === Seq(1L, 2L, 6L))
    // Utilizacao must be dropped (A6)
    assert(!spark.read.parquet(stationsPath).columns.contains("Utilizacao"))

    // run 2, later timestamp: station rows must NOT change (A7 conflict
    // branch), prices must append again (A8)
    val r2 = FuelIngest.run(spark, source, stationsPath, pricesPath,
      java.sql.Timestamp.valueOf("2023-01-13 06:00:00"))
    assert(r2.nStationsBefore === 3)
    assert(r2.nStationsAfter === 3)
    val stations2 = spark.read.parquet(stationsPath)
      .select("Id", "Nome", "CreateTimestamp").orderBy("Id").collect()
    assert(stations2.map(_.getTimestamp(2)).toSeq ===
      stations1.map(_.getTimestamp(2)).toSeq) // create ts from run 1 kept

    val prices = spark.read.parquet(pricesPath)
    assert(prices.count() === 6) // 3 snapshots × 2 runs

    // A9: as-of read — at 2023-01-12 23:00 only run-1 snapshots qualify
    val asOf = FuelIngest.latestPricesAsOf(spark, pricesPath, "2023-01-12 23:00:00")
    assert(asOf.count() === 3)
    assert(asOf.select(max("Timestamp")).head.getTimestamp(0) ===
      java.sql.Timestamp.valueOf("2023-01-12 06:00:00"))

    // A10: station 1's duplicate (DataAtualizacao, Combustivel) entry was
    // deduped last-wins: 2 entries remain, Gasoleo price = 1.625 (the
    // later array occurrence), not 1.619
    val c1 = asOf.filter(col("Id") === 1)
      .select(explode(col("Combustiveis")).as("f"))
      .select("f.Combustivel", "f.Preco").orderBy("f.Combustivel").collect()
    assert(c1.length === 2)
    assert(c1.head.getDecimal(1).doubleValue() === 1.625)
  }

  test("as-of read prunes snapshot_date partitions (the DynamoDB-sort-key replacement)") {
    val base = Files.createTempDirectory("fuel-prune").toString
    FuelIngest.run(spark, source, s"$base/st", s"$base/pr",
      java.sql.Timestamp.valueOf("2023-01-12 06:00:00"))
    FuelIngest.run(spark, source, s"$base/st", s"$base/pr",
      java.sql.Timestamp.valueOf("2023-01-13 06:00:00"))
    val asOf = FuelIngest.latestPricesAsOf(spark, s"$base/pr", "2023-01-12 23:00:00")
    val plan = asOf.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("snapshot_date"), plan)
    // only the 01-12 partition qualifies → scan reads 1 of 2 partitions
    val scanned = asOf.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString
    assert(scanned.contains("snapshot_date"), scanned)
  }

  test("enricher retries transient failures and bounds in-flight concurrency") {
    import graft.pipeline.{EnrichConfig, LookupEnricher}
    import spark.implicits._
    EnricherProbe.reset()
    val stubs = (1L to 40L).map(i => (i, s"station $i")).toDF("id", "nome")
      .repartition(1) // one partition: the per-partition pool is the only parallelism
    val cfg = EnrichConfig(maxInFlight = 4, maxAttempts = 3, backoffMs = 1)
    val out = LookupEnricher.enrich(stubs,
      "id", new FlakyProbeSource(transientFailures = 2, sleepMs = 10), cfg)
    val rows = out.collect()
    assert(rows.length === 40)
    // every key failed twice, succeeded on attempt 3 → detail present
    assert(rows.forall(r => !r.isNullAt(r.fieldIndex("detail"))))
    import scala.jdk.CollectionConverters._
    EnricherProbe.attempts.asScala.foreach { case (id, n) =>
      assert(n.get === 3, s"id=$id should take exactly maxAttempts tries")
    }
    // the pool never exceeded the bound, and concurrency was actually used
    assert(EnricherProbe.maxObserved.get <= 4,
      s"in-flight exceeded bound: ${EnricherProbe.maxObserved.get}")
    assert(EnricherProbe.maxObserved.get >= 2,
      "bounded pipeline should overlap fetches")
  }

  test("enricher quarantines keys that still fail after maxAttempts; rate limit spaces calls") {
    import graft.pipeline.{EnrichConfig, LookupEnricher}
    import spark.implicits._
    EnricherProbe.reset()
    val stubs = (1L to 10L).map(i => (i, s"station $i")).toDF("id", "nome")
      .repartition(1)
    val cfg = EnrichConfig(maxInFlight = 2, maxAttempts = 3, backoffMs = 1)
    val out = LookupEnricher.enrich(stubs,
      "id", new FlakyProbeSource(transientFailures = 0, sleepMs = 0,
        alwaysFail = Set(5L)), cfg)
    val rows = out.collect().map(r => r.getLong(0) -> !r.isNullAt(2)).toMap
    assert(rows(5L) === false) // permanent failure → null detail (A14 path)
    assert((rows - 5L).values.forall(identity))
    assert(EnricherProbe.attempts.get(5L).get === 3) // retried to the cap

    // rate limit: 20 keys at 200/s must take >= 19/200 s by construction
    EnricherProbe.reset()
    val stubs2 = (1L to 20L).map(i => (i, s"s$i")).toDF("id", "nome").repartition(1)
    val t0 = System.nanoTime()
    LookupEnricher.enrich(stubs2, "id",
      new FlakyProbeSource(0, 0), EnrichConfig(maxInFlight = 4, maxRatePerSec = 200.0))
      .collect()
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    assert(elapsedMs >= 90.0, s"rate limiter should space 20 calls over >=95ms, took $elapsedMs")
  }

  test("config loader filters by prefix (A1)") {
    val f = Files.createTempFile("cfg", ".properties")
    Files.writeString(f,
      "fuelpriceguide.endpoint01=http://a\nfuelpriceguide.table=stations\nother.x=1\n")
    val cfg = graft.pipeline.Config.load(f.toString, "fuelpriceguide.")
    assert(cfg === Map("endpoint01" -> "http://a", "table" -> "stations"))
  }
}
