package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data curation — the two
  * operations every dataset build runs between cleaning and packing:
  * per-stratum subsampling (balance sources/languages/length buckets)
  * and the train/validation/test split. Both are HASH-derived, never
  * `rand()`:
  *
  *  - reruns, retries, and speculative tasks pick the SAME rows (a
  *    `rand()` sample is non-reproducible under task retry — silent
  *    train/test contamination across pipeline re-executions);
  *  - membership is a pure function of the row's id, so a row's split
  *    NEVER changes as the corpus grows — new data lands in splits
  *    without resplitting history (the leakage property that matters
  *    when eval sets must stay frozen across dataset versions);
  *  - the DuckDB oracle replays the exact md5 arithmetic, so both are
  *    hash-checkable end to end (the repo's established 60-bit md5
  *    discipline — same form as the bloom/minhash family).
  *
  * The reference's analog is its deterministic per-item identity (the
  * DynamoDB partition key, /root/reference/index.js:352-375): identity
  * decides placement, not chance.
  *
  * 100 TB shape: [[stratifiedTake]] is ONE shuffle on the stratum key
  * + a per-group sort (window row_number — spills, never buffers a
  * group in memory); [[hashSplit]] is a pure per-row projection, no
  * shuffle at all.
  */
object Sampling {

  /** 60-bit uniform hash of (seed, idCols...) — Spark side of the md5
    * discipline; `':'`-joined string forms, so id columns must be
    * non-null and, for string ids, free of the separator if several
    * are combined. Null ids FAIL AT RUNTIME rather than silently
    * colliding: `concat_ws` skips nulls, so a null id would hash as
    * just the seed — every null-id row lands on one hash value and the
    * sample/split is silently wrong (and diverges from the DuckDB
    * oracle, where md5(NULL) is NULL). */
  def hash60(seed: String, idCols: Seq[Column]): Column = {
    val guarded = idCols.map(c =>
      when(c.isNull, raise_error(lit(
        "Sampling.hash60: null id column — deterministic sampling needs " +
          "non-null ids (a null would hash as just the seed and collide " +
          "all null-id rows onto one value)")))
        .otherwise(c.cast("string")))
    conv(substring(md5(concat_ws(":", lit(seed) +: guarded: _*)), 1, 15), 16, 10)
      .cast("long")
  }

  /** Exactly `min(n, |stratum|)` rows per stratum, chosen by rank over
    * [[hash60]] (ties broken by the id columns, so the result is a
    * total function of the data). A uniform-without-replacement sample
    * per group that every rerun reproduces bit-for-bit. */
  def stratifiedTake(df: DataFrame, keyCols: Seq[String], idCols: Seq[String],
      n: Int, seed: String = "graft"): DataFrame = {
    require(n >= 1, s"stratifiedTake n=$n must be >= 1")
    require(keyCols.nonEmpty && idCols.nonEmpty,
      "stratifiedTake needs >=1 stratum key and >=1 id column")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(hash60(seed, idCols.map(col)).asc +: idCols.map(col(_).asc): _*)
    df.withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") <= n)
      .drop("__graft_rn")
  }

  /** The integer thresholds [[hashSplit]] compares against — exposed
    * so oracles can embed the SAME constants: cumulative weight
    * fractions scaled to 2^60 and floored. */
  def splitThresholds(weights: Seq[Double]): Seq[Long] = {
    require(weights.nonEmpty && weights.forall(_ > 0),
      s"split weights must be positive, got $weights")
    val total = weights.sum
    weights.scanLeft(0.0)(_ + _).tail
      .map(c => math.floor(c / total * (1L << 60).toDouble).toLong)
  }

  /** Leakage-free deterministic split: adds `outCol` naming the split
    * whose cumulative-weight interval the row's [[hash60]] falls in.
    * Pure projection — no shuffle, no state; a row's split is a
    * function of (seed, id) alone, frozen forever. */
  def hashSplit(df: DataFrame, idCols: Seq[String], weights: Seq[Double],
      names: Seq[String], seed: String = "graft",
      outCol: String = "split"): DataFrame = {
    require(names.length == weights.length, "one name per weight")
    val cuts = splitThresholds(weights)
    val h = hash60(seed, idCols.map(col))
    val expr = names.zip(cuts).reverse.foldLeft(lit(names.last): Column) {
      case (acc, (name, cut)) => when(h < cut, lit(name)).otherwise(acc)
    }
    df.withColumn(outCol, expr)
  }
}
