package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Vector similarity search over embedding columns (SURVEY §2.C C3).
  *
  * Brute-force cosine top-k is the exact baseline: broadcast the (small)
  * query set against the candidate table — one pass over candidates, no
  * shuffle of the big side, window top-k per query. Scales linearly in
  * candidates × queries; right up to a few hundred queries.
  *
  * The scale path is random-hyperplane LSH ([[withLshBucket]]): candidates
  * hash into sign-pattern buckets once (a narrow map), queries probe only
  * their own bucket — candidate volume per query drops 2^planes-fold in
  * exchange for approximate recall. Both use pure column expressions
  * (higher-order functions), staying codegen-friendly.
  */
object Similarity {

  private def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Sequential-fold dot product (deterministic double summation). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def l2Norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x))

  def cosine(a: Column, b: Column): Column = {
    val ad = toDouble(a)
    val bd = toDouble(b)
    dot(ad, bd) / (l2Norm(ad) * l2Norm(bd))
  }

  /** Exact top-k: for each query row, the k nearest candidates by cosine
    * (ties broken by candidate id). Queries are broadcast. */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame,
      qId: String, cId: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(qId).as("q_id"), col(vecCol).as("__qv"))
    val c = candidates.select(col(cId).as("c_id"), col(vecCol).as("__cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("cosine", cosine(col("__qv"), col("__cv")))
    Dedup.topKPerGroup(scored, Seq("q_id"),
        Seq(col("cosine").desc, col("c_id")), k, "rank")
      .select(col("q_id"), col("rank"), col("c_id"), col("cosine"))
  }

  /** Deterministic pseudo-random hyperplanes (seeded), as literal columns. */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-pattern LSH bucket id: bit j set iff dot(vec, plane_j) > 0. */
  def lshBucket(vec: Column, planes: Array[Array[Double]]): Column = {
    val vd = toDouble(vec)
    planes.zipWithIndex.map { case (p, j) =>
      when(dot(vd, typedlit(p.toSeq)) > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  def withLshBucket(df: DataFrame, vecCol: String, planes: Array[Array[Double]],
      bucketCol: String = "bucket"): DataFrame =
    df.withColumn(bucketCol, lshBucket(col(vecCol), planes))

  /** Approximate top-k: probe only the query's own bucket. */
  def lshTopK(queries: DataFrame, candidates: DataFrame,
      qId: String, cId: String, vecCol: String, k: Int,
      planes: Array[Array[Double]]): DataFrame = {
    val q = withLshBucket(queries.select(col(qId).as("q_id"), col(vecCol).as("__qv")), "__qv", planes)
    val c = withLshBucket(candidates.select(col(cId).as("c_id"), col(vecCol).as("__cv")), "__cv", planes)
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("cosine", cosine(col("__qv"), col("__cv")))
    Dedup.topKPerGroup(scored, Seq("q_id"),
        Seq(col("cosine").desc, col("c_id")), k, "rank")
      .select(col("q_id"), col("rank"), col("c_id"), col("cosine"))
  }
}
