package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet sinks (SURVEY B2): append, partitioned write, atomic overwrite,
  * and the upsert/snapshot write paths of the reference
  * (/root/reference/index.js:329-375).
  *
  * `prices`-style history is date-partitioned so the reference's
  * `(Id, Timestamp)` sort-key range read becomes partition pruning +
  * parquet min/max skipping at scale.
  */
object Sinks {

  /** Overwrite via write-temp-then-rename: readers never observe a
    * half-written directory. (Non-transactional across concurrent
    * writers — the reference's two sequential puts aren't atomic either,
    * SURVEY §3 EP2.) */
  def writeAtomic(df: DataFrame, path: String): Unit = {
    val spark = df.sparkSession
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(path + ".__tmp__")
    val dst = new Path(path)
    fs.delete(tmp, true)
    df.write.mode("overwrite").parquet(tmp.toString)
    fs.delete(dst, true)
    if (!fs.rename(tmp, dst))
      throw new java.io.IOException(s"atomic rename $tmp -> $dst failed")
  }

  /** A8: append a timestamped snapshot, partitioned by snapshot date. */
  def appendSnapshot(df: DataFrame, path: String, tsCol: String = "Timestamp"): Unit =
    df.withColumn(tsCol, current_timestamp())
      .withColumn("snapshot_date", to_date(col(tsCol)))
      .write.mode("append").partitionBy("snapshot_date").parquet(path)

  /** Bucketed table write: pre-shuffles once at write time so future
    * equi-joins/aggregations on `keys` read co-located buckets with NO
    * shuffle — the right layout for repeatedly-joined 100 TB fact tables.
    * (Bucketing requires the catalog, hence saveAsTable.) */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** A7 as a storage op: merge incoming into the parquet table at `path`
    * with insert-if-absent semantics. */
  def upsertParquet(spark: SparkSession, path: String, incoming: DataFrame,
      keys: Seq[String]): Unit = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val merged =
      if (fs.exists(new Path(path)))
        Upsert.insertIfAbsent(spark.read.parquet(path), incoming, keys)
      else incoming
    writeAtomic(merged, path)
  }
}
