package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Symmetric int8 embedding quantization — the storage/bandwidth
  * compression step of a vector pipeline (4× smaller than float32, the
  * standard trick for serving ANN indexes and shipping embedding tables
  * between stages). Per vector: scale = max|x| / 127, q_i =
  * round-half-up(x_i / scale) ∈ [-127, 127], reconstruction x̂_i =
  * q_i·scale.
  *
  * Scale shape: a pure per-row projection of codegen'd higher-order
  * functions (`transform`/`aggregate`/`zip_with`) — no UDF, no explode,
  * no shuffle; it runs inside whole-stage codegen wherever the embedding
  * column already is. The scale is materialized into its own column
  * BEFORE the per-element lambdas (folding it into the element
  * expression would re-evaluate the max-fold once per element — O(d²)
  * per row). All arithmetic is explicitly double (float×float stays
  * float in Spark and would diverge from any double-math oracle); the
  * half-up rounding is floor(v + 0.5), which every engine agrees on,
  * rather than banker's-rounding `round`. */
object Quantize {

  private def d(x: Column): Column = x.cast("double")

  /** max|x_i| / 127 (the symmetric int8 scale; 0 for the zero vector). */
  def int8Scale(vec: Column): Column =
    aggregate(vec, lit(0.0), (a, x) => greatest(a, abs(d(x)))) / 127.0

  /** array<long> of int8 codes given a precomputed [[int8Scale]] column
    * (all 0 for the zero vector). */
  def int8Codes(vec: Column, scale: Column): Column =
    transform(vec, x =>
      when(scale === 0.0, lit(0L)).otherwise(floor(d(x) / scale + 0.5)))

  /** Adds `{out}_scale: double`, `{out}_codes: array<long>` for
    * `vecCol`. */
  def int8(df: DataFrame, vecCol: String, out: String): DataFrame =
    df.withColumn(s"${out}_scale", int8Scale(col(vecCol)))
      .withColumn(s"${out}_codes", int8Codes(col(vecCol), col(s"${out}_scale")))

  /** Per-vector quantization report:
    * (idCol, dim, norm, scale, q_sum, mse) — l2 norm and scale of the
    * original, sum of codes (an order-free integer checksum of the code
    * stream), and mean squared reconstruction error. Rounding: norm 6dp,
    * scale 9dp, mse 12dp (error magnitudes are ~(scale/2)²). */
  def int8Report(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = col(vecCol)
    val staged = df.select(col(idCol), v, int8Scale(v).as("__s"))
      .select(col(idCol), v, col("__s"),
        int8Codes(v, col("__s")).as("__q"))
    staged.select(col(idCol),
      size(v).cast("long").as("dim"),
      round(sqrt(aggregate(v, lit(0.0), (a, x) => a + d(x) * d(x))), 6)
        .as("norm"),
      round(col("__s"), 9).as("scale"),
      aggregate(col("__q"), lit(0L), (a, q) => a + q).as("q_sum"),
      round(
        aggregate(zip_with(v, col("__q"), (x, q) => {
          val e = d(x) - q.cast("double") * col("__s")
          e * e
        }), lit(0.0), (a, e) => a + e) / size(v).cast("double"), 12)
        .as("mse"))
  }
}
