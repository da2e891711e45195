package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sources for the two reference endpoints (A2 list scan + A4 per-key
  * detail lookup, /root/reference/index.js:81-100,109-144).
  *
  * The environment is zero-egress, so the HTTP implementation is an
  * interface; [[FileBackedSource]] reads the same payload shapes from
  * local JSON, and [[LookupEnricher]] runs the per-key fan-out exactly the
  * way an HTTP client pool would: partition-parallel, one client per
  * partition, error-tolerant (A14) — replacing the reference's sequential
  * one-request-at-a-time loop (SURVEY §3 boundary #3, the dominant cost).
  */
trait StationSource extends Serializable {

  /** ENDPOINT_01: station stubs as a DataFrame [id: long, nome: string]. */
  def stationStubs(spark: SparkSession): DataFrame

  /** ENDPOINT_02 analog: per-partition detail fetcher. Returns the raw
    * JSON payload for a station id, or None (fetch failure / missing). */
  def detailFetcher(): Long => Option[String]
}

/** Reads fixture payloads from local files (same shapes as the live API). */
final class FileBackedSource(rawListPath: String, detailsJsonlPath: String)
    extends StationSource {

  override def stationStubs(spark: SparkSession): DataFrame =
    spark.read
      .option("multiLine", "true")
      .schema(FuelSchemas.rawList)
      .json(rawListPath)
      .select(explode(col("resultado")).as("r"))
      // A3 projection + rename (index.js:88-91)
      .select(col("r.Id").as("id"), col("r.Nome").as("nome"))

  // Loaded once per executor lazily; a live impl would open an HTTP client.
  @transient private lazy val detailMap: Map[Long, String] = {
    val src = scala.io.Source.fromFile(detailsJsonlPath, "UTF-8")
    try src.getLines().filter(_.nonEmpty).map { line =>
      // minimal "id" extraction; payload stays opaque JSON
      val id = """"id"\s*:\s*(\d+)""".r.findFirstMatchIn(line)
        .map(_.group(1).toLong)
        .getOrElse(sys.error(s"fixture line without id: $line"))
      id -> line
    }.toMap
    finally src.close()
  }

  override def detailFetcher(): Long => Option[String] = detailMap.get _
}

/** A4 as an operator: fan-out lookup join of a keyed DataFrame against a
  * remote per-key service. `mapPartitions` gives partition-parallel I/O
  * with one fetcher (connection pool) per partition; failures yield null
  * payloads that flow to a quarantine count instead of killing the run. */
object LookupEnricher {

  def enrich(stubs: DataFrame, idCol: String, source: StationSource): DataFrame = {
    import stubs.sparkSession.implicits._
    val withPayload = stubs
      .select(col(idCol).cast("long").as("id"), col("nome"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val fetch = source.detailFetcher() // one "client" per partition
        it.map { case (id, nome) =>
          val payload =
            try fetch(id).orNull
            catch { case scala.util.control.NonFatal(_) => null } // A14
          (id, nome, payload)
        }
      }
      .toDF("id", "nome", "__payload")
    withPayload
      .withColumn("__parsed",
        from_json(col("__payload"), FuelSchemas.rawDetail))
      .select(col("id"), col("nome"), col("__parsed.resultado").as("detail"))
  }
}
