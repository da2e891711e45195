package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k aggregate (B15 custom-aggregate surface; B8 at scale).
  *
  * `topk(value)` keeps a size-≤-k sorted buffer through reduce/merge, so
  * top-k-per-group runs as a normal partial aggregation: map-side combine
  * shrinks every partition to k values BEFORE the shuffle, and no per-group
  * full sort ever happens — unlike the window row_number() formulation,
  * which shuffles every row and sorts each group. At 100 TB that's the
  * difference between shuffling k×groups values and shuffling the table.
  */
class TopKDoubles(k: Int) extends Aggregator[Double, Seq[Double], Seq[Double]] {
  require(k > 0)

  override def zero: Seq[Double] = Vector.empty

  /** Insert keeping the buffer sorted descending and bounded at k. */
  override def reduce(buf: Seq[Double], x: Double): Seq[Double] =
    if (buf.size >= k && x <= buf.last) buf
    else ((buf :+ x).sortBy(-_)).take(k)

  override def merge(a: Seq[Double], b: Seq[Double]): Seq[Double] =
    (a ++ b).sortBy(-_).take(k)

  override def finish(r: Seq[Double]): Seq[Double] = r

  override def bufferEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}

object TopKAgg {
  /** Register `topk_<k>(double) -> array<double>` for the session. */
  def register(spark: SparkSession, k: Int): String = {
    val name = s"topk_$k"
    spark.udf.register(name, udaf(new TopKDoubles(k)))
    name
  }
}
