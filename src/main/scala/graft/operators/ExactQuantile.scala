package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StructField, StructType}

/** Exact quantiles WITHOUT buffering the column: iterative histogram
  * narrowing (distributed selection by multi-pass counting; cf.
  * Munro-Paterson 1980 on selection with bounded memory). Each level
  * bins every surviving candidate interval into `bins` equal-width
  * buckets with ONE map-side-combinable aggregate per level (count +
  * min + max per bucket), keeps the bucket holding the target rank,
  * and recurses; once a selection's candidate set is small it is
  * collected VALUE-DISTINCT (`groupBy(v).count`) and selected exactly.
  *
  * This is the scale answer to `percentile`'s per-group value buffer
  * (SURVEY §9): memory per task is O(bins) regardless of row count.
  * The grouped form ([[quantilesByGroup]]) carries the grouping key
  * through the same narrowing — ALL groups and all ranks advance in the
  * same per-level job, so a 5000-group exact-percentile computation
  * still runs O(levels) jobs, not O(groups); at 100× data none of the
  * 10⁸-value groups ever materializes in an aggregation buffer.
  *
  * Candidate sets are tracked as CLOSED value intervals [lo, hi] taken
  * from the observed per-bucket min/max (never from computed bin edges,
  * which can disagree with floor-binning by one ulp): floor-binning is
  * monotone in v, so every value between a bucket's observed min and
  * max belongs to that bucket — the interval IS the exact candidate
  * set. When an interval degenerates (lo == hi, or its width underflows
  * `(hi-lo)/bins == 0` — at most ~bins representable doubles left) the
  * value-distinct collect finishes it, so duplicate-heavy plateaus and
  * denormal-packed tails terminate without a histogram pass.
  *
  * Convergence is UNCONDITIONAL: each level shrinks a surviving
  * interval by ×bins in FP space, and a double interval can only be
  * subdivided ~2100/log2(bins) times before width underflow forces the
  * collect path. Past `EscalateLevel` levels the collect threshold also
  * doubles per level (capped) purely as a speed valve for adversarial
  * heavy-tailed inputs — there is no convergence `require` to trip.
  */
object ExactQuantile {

  /** Exact interpolated quantiles of non-null, non-NaN `valueCol`
    * (global). Returns one (p, value) per requested p, interpolating as
    * `quantile_cont`: pos = p·(n−1)+1, v(⌊pos⌋) + frac·(v(⌊pos⌋+1) −
    * v(⌊pos⌋)). */
  def quantiles(df: DataFrame, valueCol: String, ps: Seq[Double],
      bins: Int = 2048, collectThreshold: Int = 65536): Seq[(Double, Double)] = {
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1),
      s"quantile fractions must be in [0,1], got $ps")
    val vals = df.select(col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull && !isnan(col("v")))
      .localCheckpoint()
    val base = vals.agg(count(lit(1)), min(col("v")), max(col("v"))).head()
    val n = base.getLong(0)
    require(n > 0, "exact quantile of an empty column")
    val wanted = ps.map { p =>
      val pos = p * (n - 1) + 1
      (p, math.floor(pos).toLong, pos - math.floor(pos))
    }
    val ranks = wanted.flatMap { case (_, lo, frac) =>
      if (frac == 0) Seq(lo) else Seq(lo, lo + 1) }.distinct
    val emptyKey = Row.empty
    val byRank = selectRanks(vals, Nil,
      Map(emptyKey -> GroupStats(n, base.getDouble(1), base.getDouble(2), ranks)),
      bins, collectThreshold)
    wanted.map { case (p, lo, frac) =>
      val vLo = byRank((emptyKey, lo))
      p -> (if (frac == 0) vLo else vLo + frac * (byRank((emptyKey, lo + 1)) - vLo))
    }
  }

  /** Exact interpolated quantiles PER GROUP, one output column per p —
    * the scale-safe replacement for `groupBy(k).agg(percentile(...))`,
    * whose aggregation buffer holds every value of the largest group.
    *
    * `names(i)` names the column for `ps(i)`; `countCol`, if set, adds
    * the per-group non-null row count. Interpolation replays Spark's
    * `percentile` exactly — pos = p·(n−1) 0-based, result =
    * (⌈pos⌉−pos)·v(⌊pos⌋) + (pos−⌊pos⌋)·v(⌈pos⌉) — so swapping this in
    * for the built-in is bit-identical. Groups are keyed by the
    * distinct values of `keyCols` (grouping-key-sized: the driver holds
    * O(groups × ps) interval state, the same order as the result
    * itself); rows whose value is NULL or NaN are ignored, and groups
    * with no surviving rows are absent (inner-join semantics, like
    * `groupBy` over the filtered input). */
  def quantilesByGroup(df: DataFrame, keyCols: Seq[String], valueCol: String,
      ps: Seq[Double], names: Seq[String], countCol: Option[String] = None,
      bins: Int = 512, collectThreshold: Int = 65536): DataFrame = {
    require(keyCols.nonEmpty, "quantilesByGroup needs ≥1 key column (use quantiles for global)")
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1),
      s"quantile fractions must be in [0,1], got $ps")
    require(names.length == ps.length, "one output name per fraction")
    val spark = df.sparkSession
    val vals = df.select(keyCols.map(col) :+ col(valueCol).cast("double").as("v"): _*)
      .filter(col("v").isNotNull && !isnan(col("v")))
      .localCheckpoint()
    val keySchema = StructType(vals.schema.fields.dropRight(1))
    val base = vals.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__n"), min(col("v")).as("__mn"), max(col("v")).as("__mx"))
      .collect()
    // per group: 0-based positions → 1-based ranks to select
    val wanted = base.map { r =>
      val key = Row.fromSeq(r.toSeq.dropRight(3))
      val n = r.getLong(keyCols.length)
      val poss = ps.map { p =>
        val pos = p * (n - 1)
        (pos, math.floor(pos).toLong, math.ceil(pos).toLong)
      }
      val ranks = poss.flatMap { case (_, lo, hi) => Seq(lo + 1, hi + 1) }.distinct
      (key, GroupStats(n, r.getDouble(keyCols.length + 1),
        r.getDouble(keyCols.length + 2), ranks), poss)
    }
    val byRank = selectRanks(vals, keyCols,
      wanted.map { case (k, st, _) => k -> st }.toMap, bins, collectThreshold)
    val outRows = wanted.map { case (key, st, poss) =>
      val qs = poss.map { case (pos, lo, hi) =>
        if (lo == hi) byRank((key, lo + 1))
        else (hi - pos) * byRank((key, lo + 1)) + (pos - lo) * byRank((key, hi + 1))
      }
      Row.fromSeq(key.toSeq ++ qs ++ countCol.map(_ => st.n).toSeq)
    }
    val outSchema = StructType(keySchema.fields
      ++ names.map(StructField(_, DoubleType, nullable = false))
      ++ countCol.map(StructField(_, LongType, nullable = false)))
    spark.createDataFrame(
      new java.util.ArrayList[Row](java.util.Arrays.asList(outRows: _*)), outSchema)
  }

  /** Initial per-group state: row count, value range, 1-based ranks. */
  private final case class GroupStats(n: Long, mn: Double, mx: Double, ranks: Seq[Long])

  /** One in-flight selection: group key, original rank, rank within the
    * current candidate interval, and that interval's [lo, hi, cnt]. */
  private final case class Sel(key: Row, k: Long, kRem: Long,
      lo: Double, hi: Double, cnt: Long)

  private val EscalateLevel = 64
  private val MaxCollect = 8 << 20 // escalation cap: ≤8M distinct values on the driver

  /** Values at 1-based ranks (ascending, per group). Each level runs at
    * most TWO jobs total across all groups and ranks: one histogram
    * aggregate over every still-narrowing interval, one value-distinct
    * collect for every finished one. */
  private def selectRanks(vals: DataFrame, keyCols: Seq[String],
      groups: Map[Row, GroupStats], bins: Int,
      collectThreshold: Int): Map[(Row, Long), Double] = {
    val spark = vals.sparkSession
    val keySchema = StructType(vals.schema.fields.dropRight(1))
    val done = mutable.Map.empty[(Row, Long), Double]
    var sels: Seq[Sel] = groups.toSeq.flatMap { case (key, st) =>
      st.ranks.map { k =>
        require(k >= 1 && k <= st.n, s"rank $k outside group of ${st.n}")
        Sel(key, k, k, st.mn, st.mx, st.n)
      }
    }
    var level = 0
    while (sels.nonEmpty) {
      level += 1
      val effTh = math.min(MaxCollect.toLong, collectThreshold.toLong
        << math.max(0, math.min(level - EscalateLevel, 30))).toInt
      val (trivial, live) = sels.partition(s => s.lo == s.hi)
      trivial.foreach(s => done((s.key, s.k)) = s.lo)
      // width underflow ⇒ ≤ ~bins representable doubles left: collect
      val (small, big) = live.partition(s =>
        s.cnt <= effTh || (s.hi - s.lo) / bins == 0d)
      // work units: selections sharing (key, interval) share the pass.
      // Intervals of distinct units within a group are disjoint (they
      // are different buckets of some ancestor histogram), so each row
      // joins at most one unit per group and per-unit counts are exact.
      val bigUnits = big.groupBy(s => (s.key, s.lo, s.hi)).toSeq
      val smallUnits = small.groupBy(s => (s.key, s.lo, s.hi)).toSeq
      val next = mutable.ArrayBuffer.empty[Sel]
      if (bigUnits.nonEmpty) {
        val hist = runJob(spark, vals, keyCols, keySchema, bigUnits.map(_._1),
          joined => {
            val w = (col("__hi") - col("__lo")) / bins
            val bin = least(greatest(
              floor((col("v") - col("__lo")) / w).cast("int"), lit(0)), lit(bins - 1))
            joined.groupBy(col("__uid"), bin.as("__b"))
              .agg(count(lit(1)).as("__c"), min(col("v")).as("__bmn"),
                max(col("v")).as("__bmx"))
          })
          .groupBy(_.getInt(0))
          .map { case (uid, rows) =>
            uid -> rows.map(r => r.getInt(1) -> (r.getLong(2), r.getDouble(3), r.getDouble(4)))
              .toMap
          }
        bigUnits.zipWithIndex.foreach { case ((_, unit), uid) =>
          val h = hist.getOrElse(uid,
            sys.error(s"histogram pass lost unit $uid (${unit.head})"))
          val cum = new Array[Long](bins + 1)
          for (b <- 0 until bins) cum(b + 1) = cum(b) + h.get(b).map(_._1).getOrElse(0L)
          unit.foreach { s =>
            require(cum(bins) == s.cnt && s.kRem >= 1 && s.kRem <= s.cnt,
              s"rank ${s.kRem} outside candidate set (${cum(bins)} vs ${s.cnt})")
            val t = (0 until bins).find(b => cum(b + 1) >= s.kRem).get
            val (c, bmn, bmx) = h(t)
            next += s.copy(kRem = s.kRem - cum(t), lo = bmn, hi = bmx, cnt = c)
          }
        }
      }
      if (smallUnits.nonEmpty) {
        val byUnit = runJob(spark, vals, keyCols, keySchema, smallUnits.map(_._1),
          _.groupBy(col("__uid"), col("v")).agg(count(lit(1)).as("__c")))
          .groupBy(_.getInt(0))
          .map { case (uid, rows) =>
            uid -> rows.map(r => (r.getDouble(1), r.getLong(2))).sortBy(_._1)
          }
        smallUnits.zipWithIndex.foreach { case ((_, unit), uid) =>
          val vc = byUnit.getOrElse(uid,
            sys.error(s"collect pass lost unit $uid (${unit.head})"))
          val cum = vc.scanLeft(0L)(_ + _._2).tail
          unit.foreach { s =>
            require(cum.last == s.cnt && s.kRem >= 1 && s.kRem <= s.cnt,
              s"rank ${s.kRem} outside candidate set (${cum.last} vs ${s.cnt})")
            val i = cum.indexWhere(_ >= s.kRem)
            done((s.key, s.k)) = vc(i)._1
          }
        }
      }
      sels = next.toSeq
    }
    done.toMap
  }

  /** Join `vals` to the broadcast unit-interval table (equality on the
    * group key, value within the closed interval), then run `agg` and
    * collect — the one driver-blocking job of a level. */
  private def runJob(spark: SparkSession, vals: DataFrame, keyCols: Seq[String],
      keySchema: StructType, units: Seq[(Row, Double, Double)],
      agg: DataFrame => DataFrame): Array[Row] = {
    val ivSchema = StructType(keySchema.fields ++ Seq(
      StructField("__uid", IntegerType, nullable = false),
      StructField("__lo", DoubleType, nullable = false),
      StructField("__hi", DoubleType, nullable = false)))
    val ivRows = units.zipWithIndex.map { case ((key, lo, hi), uid) =>
      Row.fromSeq(key.toSeq ++ Seq[Any](uid, lo, hi))
    }
    val iv = broadcast(spark.createDataFrame(
      new java.util.ArrayList[Row](java.util.Arrays.asList(ivRows: _*)), ivSchema))
    val joined0 = if (keyCols.nonEmpty) vals.join(iv, keyCols) else vals.crossJoin(iv)
    agg(joined0.filter(col("v") >= col("__lo") && col("v") <= col("__hi"))).collect()
  }
}
