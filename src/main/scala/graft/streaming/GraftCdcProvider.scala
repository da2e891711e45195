package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

import graft.sources.CommitLog

/** STREAMING READ of a commit-log table's change feed — the missing
  * half of the streaming story (r7: the log could be written through
  * [[StreamMergeSink]] but not read from): each micro-batch is
  * [[CommitLog.readChanges]] over the versions committed since the
  * last trigger, so a downstream pipeline follows inserts/deletes
  * incrementally instead of re-diffing snapshots (the reference's
  * poller loop, /root/reference/index.js:41-59, as a real
  * `readStream`).
  *
  * {{{
  *   spark.readStream.format("graft-cdc").option("path", tableRoot)
  *     .option("startingVersion", "-1")        // default: full history
  *     .option("maxVersionsPerTrigger", "10")  // default: unbounded
  *     .load()                            // table schema + _change_type
  * }}}                                    //   + _commit_version
  *
  * `maxVersionsPerTrigger` bounds each micro-batch to that many log
  * versions — the backfill throttle every production CDC reader needs
  * (a consumer starting from `-1` against a long history would
  * otherwise take the WHOLE history as its first batch); the stream
  * drains the backlog across triggers and then follows the head.
  *
  * Offsets are log VERSIONS (LongOffset), so restart replay is exact:
  * manifests are immutable and a version range always reads the same
  * file diff — provided `prune()` has not dropped the range (document
  * retention ≥ downstream lag; a pruned-away restart offset fails
  * loudly in readChanges). The stream's schema is FIXED at start
  * (the table schema then, plus the change columns); a mid-stream
  * table evolution surfaces new columns only on restart — each batch
  * is conformed to the declared schema (missing columns null, extra
  * columns dropped), never a silent plan-schema change.
  *
  * V1 `Source` (not DSv2) deliberately: getBatch returns a DataFrame,
  * which is exactly what readChanges produces — the alternative is
  * re-implementing a parquet reader factory under MicroBatchStream for
  * zero behavioral gain. */
final class GraftCdcProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-cdc"

  private def tablePath(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-cdc requires option 'path' = the commit-log table root"))

  private def cdcSchema(sqlContext: SQLContext, path: String): StructType = {
    val snap = CommitLog(sqlContext.sparkSession, path).snapshot()
    val base = snap.schema.getOrElse(throw new IllegalArgumentException(
      s"$path: no committed schema — write the table before streaming its changes"))
    base.add("_change_type", "string").add("_commit_version", "long")
  }

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(), cdcSchema(sqlContext, tablePath(parameters)))

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val path = tablePath(parameters)
    val startingVersion = parameters.getOrElse("startingVersion", "-1").toLong
    val maxPerTrigger = parameters.get("maxVersionsPerTrigger").map(_.toLong)
    maxPerTrigger.foreach(m => require(m >= 1,
      s"graft-cdc: maxVersionsPerTrigger=$m must be >= 1"))
    new GraftCdcStreamSource(sqlContext, path, startingVersion, maxPerTrigger,
      metadataPath, schema.getOrElse(cdcSchema(sqlContext, path)))
  }
}

private[streaming] final class GraftCdcStreamSource(sqlContext: SQLContext,
    path: String, startingVersion: Long, maxPerTrigger: Option[Long],
    metadataPath: String, override val schema: StructType) extends Source {

  private def log = CommitLog(sqlContext.sparkSession, path)

  // High-water mark: the largest offset this source ever RETURNED,
  // persisted under the source's own metadata dir BEFORE it is handed
  // to the engine (in BOTH modes, so a restart that turns the rate
  // limit on still recovers the true mark). A restarted stream
  // recovers a mark ≥ every offset in the engine's WAL, so the bounded
  // getOffset can never step BELOW a committed offset (which would
  // make the engine re-run an already-emitted version range —
  // duplicates); getBatch additionally floors the mark with the
  // engine's own authoritative offsets, covering checkpoints that
  // predate the mark file.
  private val markPath =
    new org.apache.hadoop.fs.Path(metadataPath, "graft-cdc-last-seen")
  private val markTmp =
    new org.apache.hadoop.fs.Path(metadataPath, ".graft-cdc-last-seen.tmp")
  private def markFs = markPath.getFileSystem(
    sqlContext.sparkSession.sparkContext.hadoopConfiguration)

  private def readMark(p: org.apache.hadoop.fs.Path): Option[Long] =
    if (!markFs.exists(p)) None
    else scala.util.Try {
      val in = markFs.open(p)
      try in.readLong() finally in.close()
    }.toOption

  // mark, or the tmp a crash left mid-promotion — never LESS than a
  // value that may have been handed to the engine
  private var lastSeen: Long =
    (readMark(markPath).toSeq ++ readMark(markTmp).toSeq :+ startingVersion).max

  /** Tmp-then-rename so a crash mid-write can't truncate the ONLY
    * copy: the old mark survives until the new one is complete (the
    * window between delete and rename is covered by the tmp read
    * above). */
  private def persistMark(v: Long): Unit = {
    val out = markFs.create(markTmp, true)
    try out.writeLong(v) finally out.close()
    markFs.delete(markPath, false)
    if (!markFs.rename(markTmp, markPath))
      throw new java.io.IOException(s"graft-cdc: mark rename failed at $markPath")
  }

  override def getOffset: Option[Offset] = {
    val head = log.snapshot().version
    if (head <= startingVersion) return None
    val next = math.max(lastSeen, startingVersion)
    val bounded = maxPerTrigger.fold(head) { m =>
      // saturating add — m near Long.MaxValue must not wrap negative
      // (which would return None forever and silently stall the stream)
      val lim = if (next > Long.MaxValue - m) Long.MaxValue else next + m
      math.min(head, lim)
    }
    if (bounded > lastSeen) {
      persistMark(bounded)
      lastSeen = bounded
    }
    if (bounded <= startingVersion) None else Some(LongOffset(bounded))
  }

  private def ver(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case s: SerializedOffset => LongOffset(s).offset
    case other => throw new IllegalStateException(
      s"graft-cdc: unexpected offset type ${other.getClass}")
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(ver).getOrElse(startingVersion)
    // the engine's offsets are authoritative — floor the rate-limit
    // mark with them so a checkpoint that predates the mark file can
    // never drive getOffset below an already-committed offset
    val floor = math.max(from, ver(end))
    if (floor > lastSeen) {
      if (maxPerTrigger.isDefined) persistMark(floor)
      lastSeen = floor
    }
    val ch = log.readChanges(from, ver(end))
    // conform to the schema declared at stream start: missing columns
    // null-filled, later-evolved extras dropped — the plan schema is a
    // contract the engine asserts per batch. Columns bind by STABLE
    // PHYSICAL name first (r11 column mapping: a mid-stream RENAME
    // COLUMN changes the feed's logical names, and a name-only bind
    // would silently null the renamed column for the rest of the
    // stream), then by name (the change columns, and additive
    // evolution, have no mapping).
    val endSchema = log.snapshotAt(ver(end)).schema
    def physOfF(f: org.apache.spark.sql.types.StructField): String =
      if (f.metadata.contains(graft.sources.CommitLog.PhysKey))
        f.metadata.getString(graft.sources.CommitLog.PhysKey)
      else f.name
    def lcs(s: String) = s.toLowerCase(java.util.Locale.ROOT)
    val curByPhys: Map[String, String] = endSchema
      .map(_.fields.map(f => lcs(physOfF(f)) -> f.name).toMap)
      .getOrElse(Map.empty)
    val present = ch.columns.toSet
    val conformed = ch.select(schema.map { f =>
      curByPhys.get(lcs(physOfF(f))).filter(present) match {
        case Some(n) => col(s"`$n`").cast(f.dataType).as(f.name)
        case None if present(f.name) => col(s"`${f.name}`")
        case None => lit(null).cast(f.dataType).as(f.name)
      }
    }: _*)
    org.apache.spark.sql.graft.Bridge.asStreamingBatch(conformed)
  }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
