package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Row, SQLContext, SparkSession}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, V1Scan}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister, TableScan}
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Path-based DSv2 batch source over any [[CommitLog]] table root — the
  * format twin of the catalog read path, for users without a
  * configured catalog:
  *
  * {{{
  *   spark.read.format("graft-log").load(root)                  // latest
  *     .option("versionAsOf", 3)                                 // or time travel
  *     .option("timestampAsOf", "2026-01-01 00:00:00")
  *   spark.read.format("graft-log")                              // change feed
  *     .option("readChangeFeed", "true")
  *     .option("startingVersion", 0)   // diff BASE: changes AFTER it
  *     .option("endingVersion", 5)     // inclusive; -1 base = full history
  *     .load(root)
  * }}}
  *
  * Snapshot reads reuse [[GraftLogScanBuilder]] — Spark's own
  * vectorized parquet scan over the (possibly pinned) live file list,
  * with manifest stats + bloom FILE pruning on the pushed predicates.
  * The change-feed mode surfaces [[CommitLog.readChanges]] (insert /
  * delete row sets with `_change_type` / `_commit_version`) through
  * the V1Scan bridge — the feed is bounded by changed files, so scan
  * pushdown matters less than schema fidelity there. The streaming
  * twin is `graft-cdc` ([[graft.streaming.GraftCdcProvider]]). */
final class GraftLogSource extends TableProvider with DataSourceRegister
    with org.apache.spark.sql.sources.StreamSinkProvider {
  override def shortName(): String = "graft-log"

  private def spark = SparkSession.active

  /** STREAMING SINK: `df.writeStream.format("graft-log")` — the
    * format-level twin of [[graft.streaming.StreamMergeSink]], closing
    * the loop with the `graft-cdc` source (the log is now readable AND
    * writable as a registered stream format). Options:
    * `mergeKeys` (csv) selects keyed upsert semantics (`mergeMode` =
    * last-wins | insert-if-absent, default last-wins); absent keys
    * mean plain append. `partCol` routes through the partition-scoped
    * paths; `orderCol` collapses in-batch duplicates last-wins before
    * a keyed merge; `txnId` names the idempotent writer (default
    * derived from the path). Exactly-once table contents over
    * at-least-once replays: every micro-batch commits with
    * txn = (txnId, batchId) and the log skips absorbed epochs. */
  override def createSink(sqlContext: org.apache.spark.sql.SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: org.apache.spark.sql.streaming.OutputMode)
      : org.apache.spark.sql.execution.streaming.Sink = {
    import org.apache.spark.sql.streaming.OutputMode
    require(outputMode != OutputMode.Complete(),
      "graft-log sink: Complete mode re-emits the whole result every " +
        "trigger — use append/update with mergeKeys instead")
    val root = parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-log sink: a table root path is required — .option(\"path\", ...)"))
    val keys = parameters.get("mergeKeys").toSeq
      .flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)
    val mode = parameters.getOrElse("mergeMode", "last-wins") match {
      case "last-wins" => CommitLog.LastWins
      case "insert-if-absent" => CommitLog.InsertIfAbsent
      case other => throw new IllegalArgumentException(
        s"graft-log sink: unknown mergeMode '$other' " +
          "(last-wins | insert-if-absent)")
    }
    val partCol = parameters.get("partCol").map(_.trim).filter(_.nonEmpty)
    val orderCol = parameters.get("orderCol").map(_.trim).filter(_.nonEmpty)
    val txnId = parameters.getOrElse("txnId", s"graft-log-sink:$root")
    require(keys.nonEmpty || orderCol.isEmpty,
      "graft-log sink: orderCol without mergeKeys has nothing to dedup by")
    new org.apache.spark.sql.execution.streaming.Sink {
      override def name(): String = s"graft-log-sink:$root"
      override def addBatch(batchId: Long,
          data: org.apache.spark.sql.DataFrame): Unit = {
        // re-materialize as a BATCH frame (ForeachBatchSink's move) so
        // the merge can run its multi-action plan against it
        val batch = org.apache.spark.sql.graft.Bridge.asBatch(data)
        val unique = orderCol.fold(batch)(oc =>
          graft.operators.Dedup.lastWins(batch, keys, Seq(oc)))
        val log = CommitLog(batch.sparkSession, root)
        val txn = Some(txnId -> batchId)
        if (keys.isEmpty)
          partCol.fold(log.append(batch, txn): Unit)(pc =>
            log.appendPartitioned(batch, pc, txn))
        else
          partCol.fold(log.upsert(unique, keys, mode, txn): Unit)(pc =>
            log.upsertPartitioned(unique, keys, mode, pc, txn))
      }
    }
  }

  private def rootOf(options: CaseInsensitiveStringMap): String =
    Option(options.get("path")).getOrElse(throw new IllegalArgumentException(
      "graft-log: a table root path is required — .load(<root>)"))

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val root = rootOf(options)
    // a MISSING log returns an empty schema instead of throwing:
    // DataStreamWriter resolves the TableProvider (and calls this)
    // BEFORE falling back to the streaming sink, and a sink target
    // legitimately does not exist yet. Reads stay loud — the scan
    // builder re-checks and refuses a missing root at planning time.
    if (!CommitLog.exists(spark, root)) return new StructType()
    val log = CommitLog(spark, root)
    if (options.getBoolean("readChangeFeed", false))
      // latest schema + the feed columns; readChanges conforms every
      // per-version piece to it by name (missing evolved columns null)
      log.snapshot().schema.getOrElse(new StructType())
        .add("_change_type", StringType).add("_commit_version", LongType)
    else {
      val (v, ts) = GraftLogSource.timeTravelOf(options)
      val snap = v match {
        case Some(ver) =>
          val s = log.snapshotAt(ver)
          require(s.version == ver, s"graft-log: version $ver not in the log at $root")
          s
        case None => ts match {
          case Some(t) => log.snapshotAt(log.versionAtTime(t))
          case None => log.snapshot()
        }
      }
      snap.schema.getOrElse(new StructType())
    }
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new GraftLogTable(rootOf(opts), schema)
  }
}

object GraftLogSource {
  /** `timestampAsOf` value → epoch millis: a numeric string is epoch
    * millis; otherwise a `yyyy-MM-dd[ HH:mm:ss[.S]]` string
    * interpreted in the SESSION timezone (java.sql.Timestamp.valueOf
    * would use the JVM default zone, which on a real cluster need not
    * match `spark.sql.session.timeZone`). */
  private[sources] def parseTsMillis(v: String): Long =
    scala.util.Try(v.toLong).getOrElse {
      val zone = java.time.ZoneId.of(
        SparkSession.active.sessionState.conf.sessionLocalTimeZone)
      scala.util.Try {
        val iso = (if (v.length == 10) v + "T00:00:00" else v.replace(' ', 'T'))
        java.time.LocalDateTime.parse(iso).atZone(zone).toInstant.toEpochMilli
      }.getOrElse(throw new IllegalArgumentException(
        s"graft-log: timestampAsOf '$v' is neither epoch millis nor a timestamp"))
    }

  /** (versionAsOf, timestampAsOf-millis) from read options; mutually
    * exclusive. */
  private[sources] def timeTravelOf(
      options: CaseInsensitiveStringMap): (Option[Long], Option[Long]) = {
    val v = Option(options.get("versionAsOf")).map(s =>
      scala.util.Try(s.toLong).getOrElse(throw new IllegalArgumentException(
        s"graft-log: versionAsOf '$s' must be numeric")))
    val ts = Option(options.get("timestampAsOf")).map(parseTsMillis)
    require(v.isEmpty || ts.isEmpty,
      "graft-log: versionAsOf and timestampAsOf are mutually exclusive")
    (v, ts)
  }

  /** The snapshot scan for a commit-log table, shared by the path
    * source and the catalog — always [[GraftLogScanBuilder]] (Spark's
    * vectorized parquet scan with manifest file skipping and full
    * pushdown). Renamed (column-mapped) tables ride the same builder
    * since r12: it translates the relation's LOGICAL column names to
    * the stable PHYSICAL in-file names at its pushdown boundaries
    * (pruned columns + pushed predicates in, `readSchema` out), so the
    * mapping costs nothing at scan time — the r11 V1 fallback that
    * gave up scan-level pushdown after a rename is retired. `schema0`
    * is the RELATION schema the scan's output must resolve against
    * (its `PhysKey` metadata carries the mapping; a pinned version
    * surfaces under these names by stable-physical-name match, columns
    * the pinned files lack reading null, exactly like additive
    * evolution). */
  private[sources] def snapshotScanBuilder(root: String,
      version: Option[Long], tsMillis: Option[Long],
      schema0: StructType,
      options: CaseInsensitiveStringMap,
      partCol: Option[String] = None): ScanBuilder =
    new GraftLogScanBuilder(SparkSession.active, root, version, tsMillis,
      options, relationSchema = schema0,
      // catalog tables pass merge.partcol; path reads may opt in with
      // .option("partCol", ...) — enables the SPJ KeyGroupedPartitioning
      partCol = partCol.orElse(Option(options.get("partCol"))))
}

private[sources] final class GraftLogTable(root: String, schema0: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"graft-log:$root"
  override def schema(): StructType = schema0
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    require(CommitLog.exists(SparkSession.active, root),
      s"graft-log: no commit log at $root")
    if (options.getBoolean("readChangeFeed", false)) {
      val from = Option(options.get("startingVersion")).map(_.toLong).getOrElse(0L)
      val to = Option(options.get("endingVersion")).map(_.toLong).getOrElse(Long.MaxValue)
      new GraftChangeFeedScanBuilder(root, from, to, schema0)
    } else {
      val (v, ts) = GraftLogSource.timeTravelOf(options)
      GraftLogSource.snapshotScanBuilder(root, v, ts, schema0, options)
    }
  }
}

/** The change feed as a batch scan: [[CommitLog.readChanges]] through
  * the V1Scan bridge. The feed's volume is bounded by the CHANGED
  * files between the requested versions (never table size), so the
  * row-bridge cost is proportional to the delta being consumed. */
private[sources] final class GraftChangeFeedScanBuilder(root: String,
    from: Long, to: Long, schema0: StructType) extends ScanBuilder {
  override def build(): Scan = new V1Scan {
    override def readSchema(): StructType = schema0
    override def toV1TableScan[T <: BaseRelation with TableScan](
        context: SQLContext): T =
      new BaseRelation with TableScan {
        override def sqlContext: SQLContext = context
        override def schema: StructType = schema0
        override def buildScan(): RDD[Row] = {
          val df = CommitLog(context.sparkSession, root).readChanges(from, to)
          val present = df.columns.toSet
          df.select(schema0.map(f =>
            if (present(f.name)) col(f.name).cast(f.dataType).as(f.name)
            else lit(null).cast(f.dataType).as(f.name)): _*).rdd
        }
      }.asInstanceOf[T]
  }
}
