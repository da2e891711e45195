package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, In}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 form of the A2 "rest-json" list endpoint
  * (/root/reference/index.js:81-100): the `{"resultado": [{Id, Nome}…]}`
  * page becomes a real Catalyst scan node instead of a driver-side read.
  *
  * Transport is file-backed (`path` points at the captured payload —
  * this environment is zero-egress); everything else models a REST list
  * source honestly:
  *  - `pages=N` splits the result array into N input partitions, each
  *    task "requesting" its own page — the parallel-pagination shape a
  *    live endpoint serves;
  *  - id predicates (`=`, `IN`) push into the scan (the per-key lookup
  *    the reference's ENDPOINT_02 does per station, A4) and are applied
  *    at payload-parse time, before rows ever enter the engine;
  *  - required-column pruning reaches the reader, so `SELECT nome` never
  *    materializes ids.
  *
  * Usage: `spark.read.format("rest-json").option("path", …).load()`.
  */
final class RestJsonSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "rest-json"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RestJsonSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new RestJsonTable(
      properties.asScala.getOrElse("path",
        throw new IllegalArgumentException("rest-json: 'path' option is required")),
      properties.asScala.getOrElse("resultfield", "resultado"),
      properties.asScala.getOrElse("pages", "1").toInt)
}

object RestJsonSource {
  /** Wire schema of a station stub after the A3 rename (index.js:88-91). */
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = true),
    StructField("nome", StringType, nullable = true)))
}

private[sources] final class RestJsonTable(path: String, resultField: String,
    pages: Int) extends Table with SupportsRead {
  override def name(): String = s"rest-json:$path"
  override def schema(): StructType = RestJsonSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RestJsonScanBuilder(path, resultField, pages)
}

private[sources] final class RestJsonScanBuilder(path: String,
    resultField: String, pages: Int)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = RestJsonSource.schema

  /** Accept `id = v` and `id IN (…)` — exactly what a per-key REST
    * lookup endpoint can answer server-side; everything else stays a
    * residual filter for the engine. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accept, residual) = filters.partition {
      case EqualTo("id", _: Long)    => true
      case EqualTo("id", _: Int)     => true
      case In("id", vs)              => vs.forall(v => v.isInstanceOf[Long] || v.isInstanceOf[Int])
      case _                         => false
    }
    pushed = accept
    residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new RestJsonScan(path, resultField, pages, pushed, required)
}

private[sources] final class RestJsonScan(path: String, resultField: String,
    pages: Int, pushed: Array[Filter], required: StructType)
    extends Scan with Batch {

  override def readSchema(): StructType = required

  override def description(): String =
    s"rest-json path=$path, PushedFilters: [${pushed.mkString(", ")}], " +
      s"ReadSchema: ${required.simpleString}"

  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    Array.tabulate(math.max(pages, 1))(p =>
      RestJsonPartition(path, resultField, p, math.max(pages, 1)))

  override def createReaderFactory(): PartitionReaderFactory =
    new RestJsonReaderFactory(pushed, required)
}

private[sources] final case class RestJsonPartition(path: String,
    resultField: String, page: Int, pages: Int) extends InputPartition

private[sources] final class RestJsonReaderFactory(pushed: Array[Filter],
    required: StructType) extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[RestJsonPartition]
    new RestJsonPartitionReader(p, pushed, required)
  }
}

private[sources] final class RestJsonPartitionReader(p: RestJsonPartition,
    pushed: Array[Filter], required: StructType)
    extends PartitionReader[InternalRow] {

  // Conjunction of the pushed id predicates (the "server side" of the
  // lookup). None = no pushed predicate.
  private val idPredicate: Option[Long => Boolean] = {
    val ps = pushed.toSeq.map {
      case EqualTo("id", v: Long) => (id: Long) => id == v
      case EqualTo("id", v: Int)  => (id: Long) => id == v.toLong
      case In("id", vs) =>
        val set = vs.map {
          case l: Long => l
          case i: Int  => i.toLong
        }.toSet
        (id: Long) => set.contains(id)
      case f => throw new IllegalStateException(s"unsupported pushed filter $f")
    }
    if (ps.isEmpty) None else Some((id: Long) => ps.forall(_(id)))
  }

  // One "page request": parse the payload, slice this partition's page,
  // apply pushed predicates at the source.
  private val rows: Iterator[InternalRow] = {
    val mapper = new ObjectMapper()
    val root = mapper.readTree(new java.io.File(p.path))
    val arr = root.get(p.resultField)
    require(arr != null && arr.isArray,
      s"rest-json: field '${p.resultField}' missing or not an array in ${p.path}")
    Iterator.range(p.page, arr.size(), p.pages).flatMap { i =>
      val node = arr.get(i)
      val idNode = node.get("Id")
      val id = if (idNode == null || idNode.isNull) null
        else java.lang.Long.valueOf(idNode.asLong())
      if (idPredicate.exists(pred => id == null || !pred(id.longValue()))) None
      else {
        val values = required.fields.map(_.name).map {
          case "id" => id
          case "nome" =>
            val n = node.get("Nome")
            if (n == null || n.isNull) null else UTF8String.fromString(n.asText())
          case other => throw new IllegalStateException(s"unknown column $other")
        }
        Some(InternalRow.fromSeq(values.toIndexedSeq))
      }
    }
  }

  private var current: InternalRow = _
  override def next(): Boolean =
    if (rows.hasNext) { current = rows.next(); true } else false
  override def get(): InternalRow = current
  override def close(): Unit = ()
}
