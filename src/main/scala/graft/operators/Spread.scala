package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Guard against under-parallelized scans feeding compute-heavy
  * per-row expansions (gram/bigram explode + hashing): a small table
  * often arrives as ONE parquet split, which runs the whole expansion
  * on a single task no matter how many cores the cluster has.
  *
  * `byKey` hash-repartitions to the shuffle width — but ONLY when the
  * scan width is below half of it, so at real scale (file splits ≥
  * shuffle width) it is a no-op and costs nothing. The check reads the
  * plan's partitioning (no job is run).
  */
object Spread {
  def byKey(df: DataFrame, key: String): DataFrame = {
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    if (df.rdd.getNumPartitions < parts / 2) df.repartition(parts, col(key))
    else df
  }
}
