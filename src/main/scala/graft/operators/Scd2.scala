package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 history (SURVEY §2 A7/A9 extension):
  * validity-interval tracking of attribute changes over time — what the
  * reference's append-only price snapshots (index.js:329-345) become
  * when a consumer needs "what was the price between t1 and t2" instead
  * of "latest as of t".
  *
  * Two forms:
  *  - [[fromChangeLog]]: batch rebuild from an event log — collapse
  *    consecutive duplicates per key (the q68 change-detection step,
  *    here as a declarative LAG window) and close each version with the
  *    next change's timestamp (LEAD). Two windows over the same
  *    (key, ts) partitioning → ONE shuffle; open versions have null
  *    `valid_to`.
  *  - [[mergeSnapshot]]: one incremental merge step — close the open
  *    version of keys whose value changed and append the new open
  *    version. The per-key comparison touches only open rows, so the
  *    closed history never reshuffles: at 100 TB the history table is
  *    write-once, and only the open slice (≤ one row per key) joins the
  *    incoming snapshot.
  */
object Scd2 {

  /** Rebuild the full SCD2 history from a change log. Output columns:
    * the key columns, `valueCol`, `valid_from`, `valid_to` (null while
    * open). `tieBreak` orders simultaneous events deterministically. */
  def fromChangeLog(log: DataFrame, keys: Seq[String], ts: String,
      valueCol: String, tieBreak: Seq[String] = Nil): DataFrame = {
    val order = (col(ts) +: tieBreak.map(col)).map(_.asc)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    log
      // null is a legal tracked value, so "no previous row" must be
      // detected by position (row_number), not by lag() returning null
      .withColumn("__rn", row_number().over(w))
      .withColumn("__prev", lag(col(valueCol), 1).over(w))
      .filter(col("__rn") === 1 || !(col("__prev") <=> col(valueCol)))
      .withColumn("valid_to", lead(col(ts), 1).over(w))
      .select(keys.map(col) ++ Seq(col(valueCol),
        col(ts).as("valid_from"), col("valid_to")): _*)
  }

  /** One SCD2 merge step. `current` must be a well-formed history
    * (unique open row per present key); `snapshot` carries one row per
    * key with `valueCol` and the observation time `ts`. Keys absent
    * from the snapshot are left open (upsert semantics, no delete).
    * Returns the new history. */
  def mergeSnapshot(current: DataFrame, snapshot: DataFrame,
      keys: Seq[String], ts: String, valueCol: String): DataFrame = {
    val closed = current.filter(col("valid_to").isNotNull)
    val open = current.filter(col("valid_to").isNull)
    val snap = snapshot.select(
      keys.map(col) ++ Seq(col(valueCol).as("__new_v"), col(ts).as("__new_ts"),
        lit(true).as("__present")): _*)
    // null is a legal attribute value on BOTH sides, so presence is
    // tracked explicitly: valid_from (never null in a well-formed
    // history) marks an open version; __present marks a snapshot row.
    val joined = open.join(snap, keys, "full_outer")
    val unchanged = joined
      .filter(col("valid_from").isNotNull &&
        (col("__present").isNull || col("__new_v") <=> col(valueCol)))
      .select(current.columns.map(col): _*)
    // a changed key contributes its closed old version and a new open one;
    // a brand-new key contributes only the open version
    val changed = joined
      .filter(col("__present").isNotNull && !(col("__new_v") <=> col(valueCol)))
    val closedNow = changed.filter(col("valid_from").isNotNull)
      .withColumn("valid_to", col("__new_ts"))
      .select(current.columns.map(col): _*)
    val opened = changed
      .select(keys.map(col) ++ Seq(col("__new_v").as(valueCol),
        col("__new_ts").as("valid_from"),
        lit(null).cast(current.schema("valid_to").dataType).as("valid_to")): _*)
    closed.unionByName(unchanged).unionByName(closedNow).unionByName(opened)
  }
}
