package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY §4 partitioning design; the 100 TB story).
  *
  * AQE's skew-join handling covers sort-merge joins at runtime; these
  * utilities cover the cases it doesn't: explicit salting when one hot
  * key dominates a shuffle (join or aggregation) and the operator must
  * stay a hash join, plus two-stage aggregation that pre-combines per
  * salt before the final combine per key.
  *
  * Salts are deterministic (hash of the row's key + a uniform spreader),
  * never Math.random — plans stay reproducible and retry-safe.
  */
object Skew {

  /** Equi-join with the left (large, skewed) side salted into `salt`
    * sub-keys and the right side replicated `salt` times. One hot key's
    * rows spread over `salt` tasks instead of one. */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      salt: Int, joinType: String = "inner"): DataFrame = {
    require(salt > 0)
    // spread rows of the same key deterministically: hash the whole row
    val leftSalted = left.withColumn("__salt",
      pmod(xxhash64(struct(left.columns.map(col): _*)), lit(salt)).cast("int"))
    val rightSalted = right.withColumn("__salt",
      explode(array((0 until salt).map(lit): _*)))
    leftSalted.join(rightSalted, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Two-stage (salted) aggregation: partial combine on (keys, salt),
    * final combine on keys. `aggs` maps output column name to a
    * re-combinable aggregate over an input column: sum | count | min | max. */
  def saltedAgg(df: DataFrame, keys: Seq[String],
      aggs: Map[String, (String, String)], salt: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(struct(df.columns.map(col): _*)), lit(salt)).cast("int"))
    val partialExprs = aggs.toSeq.map { case (out, (fn, in)) =>
      (fn match {
        case "sum"   => sum(col(in))
        case "count" => count(col(in))
        case "min"   => min(col(in))
        case "max"   => max(col(in))
        case other   => throw new IllegalArgumentException(s"not re-combinable: $other")
      }).as(out)
    }
    val partial = salted.groupBy((keys :+ "__salt").map(col): _*).agg(partialExprs.head, partialExprs.tail: _*)
    val finalExprs = aggs.toSeq.map { case (out, (fn, _)) =>
      (fn match {
        case "sum" | "count" => sum(col(out)) // counts re-combine by summing
        case "min"           => min(col(out))
        case "max"           => max(col(out))
      }).as(out)
    }
    partial.groupBy(keys.map(col): _*).agg(finalExprs.head, finalExprs.tail: _*)
  }
}
