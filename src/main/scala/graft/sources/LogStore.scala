package graft.sources

import java.nio.file.{FileAlreadyExistsException, Files, Paths}
import java.util.UUID

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** The commit primitive behind every [[CommitLog]] manifest publish —
  * the ONE operation whose atomicity the multi-writer guarantee rests
  * on (the generalization of the reference's DynamoDB conditional put,
  * /root/reference/index.js:368: `attribute_not_exists(Id)`).
  *
  * Contract: [[putIfAbsent]] must return true for EXACTLY ONE caller
  * per destination path across all concurrent writers — other
  * processes, other hosts — and a false/failed call must leave no
  * partial or readable file at the destination. Readers may list the
  * log directory at any time; they must never observe a half-written
  * manifest.
  *
  * Which implementation is safe depends on the storage system:
  *
  *  - `file:` — POSIX `link(2)` fails with EEXIST atomically; rename
  *    REPLACES an existing destination, so rename is NOT a CAS here.
  *  - HDFS-like (hdfs, viewfs, ...) — namenode rename-without-
  *    overwrite is atomic.
  *  - S3-class object stores (s3/s3a/gs/abfs/...) — NEITHER primitive
  *    exists: rename is copy+delete and "check-then-put" races. A safe
  *    implementation needs a conditional PUT (`If-None-Match: *`,
  *    which S3/GCS/Azure all support today) or an external lock/CAS
  *    table (the role DynamoDB plays for Delta on S3). Plug one in via
  *    `spark.graft.logStore.class`; the default REFUSES to commit on
  *    these schemes rather than corrupt the log silently.
  *
  * Configure: `spark.conf.set("spark.graft.logStore.class",
  * "com.example.S3ConditionalPutLogStore")` — any class with a no-arg
  * constructor implementing this trait. One instance is created per
  * [[CommitLog]] handle; implementations must be thread-safe.
  *
  * CONFORMANCE: `graft.LogStoreContractSpec` is the runnable contract
  * — register a new implementation in its `conformance(...)` calls and
  * the suite races N writers per path asserting exactly-one-winner,
  * loser-reads-winner's-bytes, no-clobber, and no temp garbage.
  * [[InMemoryCasLogStore]] is the external-CAS-table reference
  * implementation (the DynamoDB-shaped design) and passes it alongside
  * the Hadoop default.
  */
trait LogStore {
  /** Atomically publish `json` (UTF-8) at `dst` iff nothing exists
    * there; true iff THIS caller created it. */
  def putIfAbsent(fs: FileSystem, dst: Path, json: String): Boolean
}

object LogStore {
  /** Spark conf key naming a custom [[LogStore]] implementation class. */
  val ConfKey = "spark.graft.logStore.class"

  /** Schemes where neither hard-link nor rename-without-overwrite is
    * an atomic create-if-absent — committing through the Hadoop
    * primitives there would be a silent lost-update generator. */
  private[sources] val NonAtomicSchemes: Set[String] =
    Set("s3", "s3a", "s3n", "gs", "abfs", "abfss", "wasb", "wasbs", "oss", "cos")

  /** The store for this session: the configured class, else the
    * filesystem-primitive default. Resolved per CommitLog handle so a
    * conf change takes effect on the next handle, not mid-commit. */
  def forSession(spark: SparkSession): LogStore =
    spark.conf.getOption(ConfKey) match {
      case Some(cls) =>
        try Class.forName(cls).getDeclaredConstructor().newInstance()
          .asInstanceOf[LogStore]
        catch {
          case e: Exception => throw new IllegalArgumentException(
            s"$ConfKey=$cls could not be instantiated as a graft.sources.LogStore", e)
        }
      case None => HadoopLogStore
    }
}

/** Default [[LogStore]]: the strongest atomic create-if-absent the
  * underlying Hadoop filesystem offers — hard-link create on `file:`,
  * rename-without-overwrite elsewhere — and a LOUD refusal on object-
  * store schemes where neither is atomic (configure a conditional-PUT
  * store there instead; silent corruption is the one unacceptable
  * outcome for a commit log). */
object HadoopLogStore extends LogStore {
  override def putIfAbsent(fs: FileSystem, dst: Path, json: String): Boolean = {
    val scheme = Option(fs.makeQualified(dst).toUri.getScheme).getOrElse("file")
    require(!LogStore.NonAtomicSchemes.contains(scheme.toLowerCase),
      s"commit log at $dst: scheme '$scheme' has no atomic create-if-absent " +
        "(rename is copy+delete; check-then-put races) — configure a " +
        s"conditional-PUT or lock-table LogStore via ${LogStore.ConfKey} " +
        "instead of risking silent lost commits")
    val tmp = new Path(dst.getParent, s".tmp-${UUID.randomUUID()}.json")
    val out = fs.create(tmp, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
    val won =
      if (scheme == "file") {
        // local FS: POSIX rename REPLACES an existing destination, so
        // rename is not a safe CAS here — hard-link create is (EEXIST)
        val tmpNio = Paths.get(fs.makeQualified(tmp).toUri)
        val dstNio = Paths.get(fs.makeQualified(dst).toUri)
        try { Files.createLink(dstNio, tmpNio); true }
        catch { case _: FileAlreadyExistsException => false }
      } else {
        // HDFS-like: rename fails (returns false) when dst exists
        !fs.exists(dst) && fs.rename(tmp, dst)
      }
    fs.delete(tmp, false)
    won
  }
}
