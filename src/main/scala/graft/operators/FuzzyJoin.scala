package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalable fuzzy string self-join: all pairs within levenshtein
  * distance ≤ d, WITHOUT the all-pairs product — candidates come from
  * FastSS/SymSpell-style deletion neighborhoods (Bocek et al. 2007,
  * "Fast Similarity Search in Large Dictionaries": two strings within
  * edit distance d share a variant obtained by deleting ≤ d chars from
  * each), then exact `levenshtein` verifies. The typo-clustering /
  * entity-resolution primitive of a cleaning pipeline (fuzzy B10/B5
  * closure; exact-recall oracle the same way q47 proves LSH recall).
  *
  * Scale shape: each string explodes to O(len^d) deletion variants that
  * ride the shuffle as xxhash64 longs, never strings; candidate pairs
  * are emitted per variant bucket with the [[NearDup.candidatePairs]]
  * sorted-ids/slice pattern (i<j, no self-pairs), deduped once, and
  * verified with the codegen'd levenshtein on a join back to the (id,
  * string) relation. A `maxBucket` cap bounds degenerate variants (mass
  * near-identical strings) the same way the LSH bucket cap does.
  */
object FuzzyJoin {

  /** All single-character deletions of `s`, plus `s` itself. */
  private def delOnce(s: Column): Column =
    when(length(s) === 0, array(s)).otherwise(
      concat(array(s), transform(sequence(lit(1), length(s)), i =>
        concat(substr(s, lit(1), i - 1),
          substr(s, i + 1, length(s) - i)))))

  /** Distinct deletion variants of `s` up to depth `d` (1 or 2). */
  def deletionVariants(s: Column, d: Int): Column = {
    require(d >= 1 && d <= 2, s"maxDist must be 1 or 2, got $d")
    val v1 = delOnce(s)
    if (d == 1) array_distinct(v1)
    else array_distinct(flatten(transform(v1, v => delOnce(v))))
  }

  /** All (a_id, b_id, dist) with a_id < b_id and
    * levenshtein(str_a, str_b) ≤ maxDist. Variant buckets larger than
    * `maxBucket` are dropped (degenerate mass-duplicate strings — dedup
    * those exactly first); audit with [[overflowVariants]]. */
  def selfPairs(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int = 1, maxBucket: Int = 4096): DataFrame = {
    // single-split inputs would run the O(len^d) variant explode on
    // one task — spread first (no-op at scale, see [[Spread]])
    val variants = Spread.byKey(df, idCol).select(
        col(idCol).as("__id"),
        explode(deletionVariants(col(strCol), maxDist)).as("__v"))
      .select(col("__id"), xxhash64(col("__v")).as("__vk"))
      .distinct()
    val n = size(col("__ids"))
    val cands = variants.groupBy(col("__vk"))
      .agg(sort_array(collect_list(col("__id"))).as("__ids"))
      .filter(n > 1 && n <= maxBucket)
      .select(explode(flatten(transform(col("__ids"), (x, i) =>
        transform(slice(col("__ids"), i + lit(2), size(col("__ids"))),
          y => struct(x.as("a_id"), y.as("b_id")))))).as("p"))
      .select(col("p.a_id"), col("p.b_id"))
      .distinct()
    cands
      .join(df.select(col(idCol).as("a_id"), col(strCol).as("__sa")), "a_id")
      .join(df.select(col(idCol).as("b_id"), col(strCol).as("__sb")), "b_id")
      .withColumn("dist", levenshtein(col("__sa"), col("__sb")))
      .filter(col("dist") <= maxDist)
      .select(col("a_id"), col("b_id"), col("dist"))
  }

  /** Two-table form (entity linking): all (l_id, r_id, dist) with
    * levenshtein(left.strCol, right.strCol) ≤ maxDist. Same candidate
    * machinery as [[selfPairs]]; variant keys whose side exceeds
    * `maxBucket` are dropped on that side. */
  def pairs(left: DataFrame, right: DataFrame, idCol: String,
      strCol: String, maxDist: Int = 1, maxBucket: Int = 4096): DataFrame = {
    def side(df: DataFrame, as: String): DataFrame = {
      val v = Spread.byKey(df, idCol).select(col(idCol).as(as),
          explode(deletionVariants(col(strCol), maxDist)).as("__v"))
        .select(col(as), xxhash64(col("__v")).as("__vk"))
        .distinct()
      val hot = v.groupBy(col("__vk")).agg(count(lit(1)).as("__n"))
        .filter(col("__n") > maxBucket).select(col("__vk"))
      v.join(broadcast(hot), Seq("__vk"), "left_anti")
    }
    val cands = side(left, "l_id").join(side(right, "r_id"), "__vk")
      .select(col("l_id"), col("r_id")).distinct()
    cands
      .join(left.select(col(idCol).as("l_id"), col(strCol).as("__sl")), "l_id")
      .join(right.select(col(idCol).as("r_id"), col(strCol).as("__sr")), "r_id")
      .withColumn("dist", levenshtein(col("__sl"), col("__sr")))
      .filter(col("dist") <= maxDist)
      .select(col("l_id"), col("r_id"), col("dist"))
  }

  /** The variant buckets [[selfPairs]] would drop at `maxBucket`, for
    * audit (same role as [[NearDup.overflowBuckets]]). */
  def overflowVariants(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int = 1, maxBucket: Int = 4096): DataFrame =
    df.select(col(idCol).as("__id"),
        explode(deletionVariants(col(strCol), maxDist)).as("__v"))
      .select(col("__id"), xxhash64(col("__v")).as("__vk"))
      .distinct()
      .groupBy(col("__vk")).agg(count(lit(1)).as("n_ids"))
      .filter(col("n_ids") > maxBucket)
}
