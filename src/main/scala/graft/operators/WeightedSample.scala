package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic weighted sampling without replacement
  * (Efraimidis & Spirakis, "Weighted random sampling with a reservoir",
  * IPL 2006): each row gets key = Exp(weight) = -ln(u)/w with u a
  * DETERMINISTIC md5-derived uniform, and the k smallest keys per group
  * are the sample. P(row in sample) follows the E-S weighted-reservoir
  * distribution, yet reruns — on any cluster, any partitioning — pick
  * the same rows, and any engine with md5 can replay the draw (the
  * q71 seeded-Bernoulli idea extended to weights).
  *
  * Scale shape: one codegen'd pass computes keys, one shuffle on the
  * group key ranks them (bounded per-partition by group size; for a
  * single giant group use TopKAgg instead of the window). No RNG state,
  * no driver coordination.
  *
  * FP caveat (q76 precedent): ln/division may differ by ulps across
  * engines, so ranks compare on round(key, 9) with a unique tie-break —
  * a flip needs two keys within 5e-10 straddling a rounding boundary;
  * validated empirically at both SFs.
  */
object WeightedSample {

  /** Uniform(0,1) from a seeded md5 of the id: 60 bits of the digest
    * scaled by 2^60 (never exactly 0, so ln(u) is finite). */
  def seededUniform(id: Column, seed: String): Column =
    (conv(substring(md5(concat(lit(s"$seed:"), id.cast("string"))), 1, 15), 16, 10)
      .cast("double") + lit(1.0)) / lit(1.152921504606846976e18)

  /** Exponential sampling key, rounded for cross-engine rank parity. */
  def samplingKey(id: Column, weight: Column, seed: String): Column =
    round(-log(seededUniform(id, seed)) / weight, 9)

  /** k-per-group weighted sample: rows of `df` whose keys rank in the
    * smallest k within their group. Emits `rankCol` (1..k) and the key. */
  def samplePerGroup(df: DataFrame, idCol: String, weightCol: String,
      groupCols: Seq[String], k: Int, seed: String,
      rankCol: String = "rk", keyCol: String = "skey"): DataFrame = {
    val keyed = df.withColumn(keyCol, samplingKey(col(idCol), col(weightCol), seed))
    Dedup.topKPerGroup(keyed, groupCols,
      Seq(col(keyCol).asc, col(idCol).asc), k, rankCol)
  }
}
