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

  /** Bounded insert: rejected values (x ≤ current k-th) cost O(1) — the
    * common case once the buffer fills; accepted values binary-search the
    * slot and splice, O(k) worst-case on the array copy, never a re-sort. */
  override def reduce(buf: Seq[Double], x: Double): Seq[Double] = {
    if (buf.size >= k && x <= buf.last) buf
    else {
      val v = buf.toIndexedSeq
      // first index whose value < x (buffer sorted descending)
      var lo = 0
      var hi = v.length
      while (lo < hi) {
        val m = (lo + hi) >>> 1
        if (v(m) >= x) lo = m + 1 else hi = m
      }
      ((v.take(lo) :+ x) ++ v.drop(lo)).take(k)
    }
  }

  /** Linear merge of two sorted-descending buffers, stopping at k. */
  override def merge(a: Seq[Double], b: Seq[Double]): Seq[Double] = {
    val av = a.toIndexedSeq
    val bv = b.toIndexedSeq
    val out = Vector.newBuilder[Double]
    var i = 0
    var j = 0
    var n = 0
    val limit = math.min(k, av.length + bv.length)
    while (n < limit) {
      if (j >= bv.length || (i < av.length && av(i) >= bv(j))) { out += av(i); i += 1 }
      else { out += bv(j); j += 1 }
      n += 1
    }
    out.result()
  }

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
    if (!spark.catalog.functionExists(name))
      spark.udf.register(name, udaf(new TopKDoubles(k)))
    name
  }
}

/** [[TopKDoubles]] carrying an id with each score: the bounded buffer
  * holds (score, id) pairs totally ordered by (score DESC, id ASC) —
  * the exact tie-break every searcher's `ROW_NUMBER() OVER (ORDER BY
  * cosine DESC, c_id)` oracle uses — so top-k-per-query runs as a
  * partial aggregation instead of a window: each shuffle-map task
  * shrinks its local candidates to ≤ k pairs per query BEFORE the
  * shuffle (the merge step of an IVF search, as an Aggregator). */
class TopKScored(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
  require(k > 0)

  private def before(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: Seq[(Double, Long)] = Vector.empty

  override def reduce(buf: Seq[(Double, Long)], x: (Double, Long)): Seq[(Double, Long)] = {
    if (buf.size >= k && !before(x, buf.last)) buf
    else {
      val v = buf.toIndexedSeq
      var lo = 0
      var hi = v.length
      while (lo < hi) {
        val m = (lo + hi) >>> 1
        if (before(v(m), x) || v(m) == x) lo = m + 1 else hi = m
      }
      ((v.take(lo) :+ x) ++ v.drop(lo)).take(k)
    }
  }

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] = {
    val av = a.toIndexedSeq
    val bv = b.toIndexedSeq
    val out = Vector.newBuilder[(Double, Long)]
    var i = 0
    var j = 0
    var n = 0
    val limit = math.min(k, av.length + bv.length)
    while (n < limit) {
      if (j >= bv.length || (i < av.length && !before(bv(j), av(i)))) {
        out += av(i); i += 1
      } else { out += bv(j); j += 1 }
      n += 1
    }
    out.result()
  }

  override def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = r

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}

object TopKScoredAgg {
  /** Register `topk_scored_<k>(score double, id bigint) ->
    * array<struct<_1 double, _2 bigint>>` for the session. */
  def register(spark: SparkSession, k: Int): String = {
    val name = s"topk_scored_$k"
    if (!spark.catalog.functionExists(name))
      spark.udf.register(name, udaf(new TopKScored(k)))
    name
  }
}
