package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic dedup-by-key (the reference's last-wins JS-Map dedup on
  * `DataAtualizacao`, /root/reference/index.js:63-79, generalized —
  * SURVEY A10/C1).
  *
  * One shuffle on the keys; the window sort is per-key (no global sort),
  * so it scales with the largest key group, not the table. Skewed keys
  * are AQE's problem only for joins — for pathological single-key skew
  * pre-aggregate with max_by instead.
  */
object Dedup {

  /** Keep exactly one row per key: the first under `order` (pass explicit
    * asc/desc columns; include a unique tie-break for determinism). */
  def keepOne(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Last-wins by a recency ordering (columns sorted descending). */
  def lastWins(df: DataFrame, keys: Seq[String], recency: Seq[String]): DataFrame =
    keepOne(df, keys, recency.map(col(_).desc))

  /** First-wins by the same ordering ascending. */
  def firstWins(df: DataFrame, keys: Seq[String], recency: Seq[String]): DataFrame =
    keepOne(df, keys, recency.map(col(_).asc))

  /** Top-k rows per group under `order` (B8), rank column included. */
  def topKPerGroup(df: DataFrame, keys: Seq[String], order: Seq[Column], k: Int,
      rankCol: String = "rk"): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn(rankCol, row_number().over(w)).filter(col(rankCol) <= k)
  }
}
