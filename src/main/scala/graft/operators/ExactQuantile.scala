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
  * Convergence is UNCONDITIONAL over FINITE values: each level shrinks
  * a surviving interval by ×bins in FP space, and a double interval can
  * only be subdivided ~2100/log2(bins) times before width underflow
  * forces the collect path. ±Infinity would break that argument (an
  * infinite interval never narrows), so both entry points fail fast on
  * an infinite min/max — NaN/null are filtered, ±Inf is refused loudly.
  * Past `EscalateLevel` levels the collect threshold also doubles per
  * level (capped) purely as a speed valve for adversarial heavy-tailed
  * inputs — there is no convergence `require` to trip on finite data.
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
    try {
      val base = vals.agg(count(lit(1)), min(col("v")), max(col("v"))).head()
      val n = base.getLong(0)
      require(n > 0, "exact quantile of an empty column")
      // an infinite endpoint makes every histogram width infinite — the
      // narrowing could loop forever on a large-enough input. Fail fast
      // instead (NaN/null are already filtered; ±Inf is a data bug the
      // caller must clamp or filter before asking for exact quantiles).
      require(!base.getDouble(1).isInfinite && !base.getDouble(2).isInfinite,
        "±Infinity in the value column — histogram narrowing cannot bound " +
          "an infinite interval; filter or clamp non-finite values first")
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
    } finally graft.util.Ckpt.release(vals) // result is driver-side: zero blocks survive
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
  /** Past `driverGroupLimit` distinct groups the computation switches
    * from the driver-coordinated engine (per-group interval state +
    * broadcast unit tables — 2 jobs/level, the best plan when groups
    * are few and rows are many) to [[quantilesByGroupDistributed]]
    * (state, selection and output all DataFrames — nothing per-group
    * ever lands on the driver; VERDICT r7 #2). The two engines are
    * bit-identical (spec-pinned), so the switch is hash-invisible; the
    * probe is a bounded `take`, never a full collect. */
  def quantilesByGroup(df: DataFrame, keyCols: Seq[String], valueCol: String,
      ps: Seq[Double], names: Seq[String], countCol: Option[String] = None,
      bins: Int = 1024, collectThreshold: Int = 65536,
      driverGroupLimit: Int = 16384): DataFrame = {
    require(keyCols.nonEmpty, "quantilesByGroup needs ≥1 key column (use quantiles for global)")
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1),
      s"quantile fractions must be in [0,1], got $ps")
    require(names.length == ps.length, "one output name per fraction")
    val vals = df.select(keyCols.map(col) :+ col(valueCol).cast("double").as("v"): _*)
      .filter(col("v").isNotNull && !isnan(col("v")))
      .localCheckpoint()
    // prepped's result is INDEPENDENT of vals (driver rows, or the
    // distributed engine's materialized output), so the projection's
    // blocks are releasable the moment it returns.
    try quantilesByGroupPrepped(vals, keyCols, ps, names, countCol,
      bins, collectThreshold, driverGroupLimit)
    finally graft.util.Ckpt.release(vals)
  }

  /** The post-projection core of [[quantilesByGroup]], taking `vals` =
    * (keyCols..., v double) with null/NaN already removed and ALREADY
    * materialized (the narrowing levels re-scan it). Exposed inside
    * the package so a caller computing SEVERAL dependent quantile
    * passes over the same rows ([[Robust.madScores]]: median, then
    * median of deviations) shares ONE materialized projection instead
    * of re-scanning and re-checkpointing the source per pass.
    *
    * Block-lifecycle contract: the returned frame NEVER reads from
    * `vals` or from any checkpoint this call allocated — the driver
    * engine returns driver-built rows, the distributed engine
    * materializes its output and releases its internals — so the
    * caller may `Ckpt.release(vals)` as soon as this returns. The
    * distributed engine's result is itself one group-domain-sized
    * checkpoint (the same order as the answer); release it after the
    * terminal action if the session is long-lived. */
  private[operators] def quantilesByGroupPrepped(vals: DataFrame,
      keyCols: Seq[String], ps: Seq[Double], names: Seq[String],
      countCol: Option[String] = None, bins: Int = 1024,
      collectThreshold: Int = 65536, driverGroupLimit: Int = 16384): DataFrame = {
    val spark = vals.sparkSession
    // per-group (n, min, max) — needed by BOTH engines, so materialize
    // it once; counting the (group-domain-sized) checkpoint is then a
    // trivial job, and the engine choice never collects an unbounded
    // group domain to the driver
    val baseDf = vals.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__n"), min(col("v")).as("__mn"), max(col("v")).as("__mx"))
      .localCheckpoint()
    // ONE probe job over the group-sized checkpoint answers BOTH
    // driver questions — group count (engine choice) and the ±Inf
    // fail-fast (an infinite group interval never narrows; same
    // reason as the global path). These were two separate actions;
    // the narrowing's cost is sequential driver-blocking jobs, so
    // every merged action is one scheduler round-trip saved per pass
    // (q146 runs two passes).
    val probe = baseDf
      .agg(count(lit(1)), min(col("__mn")), max(col("__mx"))).head()
    val nGroups = probe.getLong(0)
    require(nGroups == 0 ||
        (!probe.getDouble(1).isInfinite && !probe.getDouble(2).isInfinite),
      s"±Infinity in the quantile value column — histogram narrowing cannot bound an " +
        "infinite interval; filter or clamp non-finite values first")
    if (nGroups > driverGroupLimit)
      return quantilesByGroupDistributed(
        vals.withColumnRenamed("v", "__v"), baseDf, keyCols, ps, names,
        countCol, bins, collectThreshold) // releases baseDf itself
    val keySchema = StructType(vals.schema.fields.dropRight(1))
    val base = baseDf.collect()
    graft.util.Ckpt.release(baseDf) // fully collected; nothing below reads it
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

  /** The unbounded-group-count engine: selection state, per-level
    * histograms, rank selection and the final interpolation are all
    * DataFrames — the driver holds a level counter and nothing
    * per-group, so 10⁷-group calls never materialize on it (VERDICT
    * r7 #2). Each level is still O(1) jobs for ANY group count; the
    * per-level unit table rides a keyed join (Spark broadcasts it
    * while it is small, shuffles when it is not) instead of an
    * unconditional driver broadcast. The arithmetic replays the
    * driver-coordinated engine IEEE-exactly (same binning, same
    * cumulative-rank bucket choice, same (n−1)·p interpolation), so
    * which engine ran is hash-invisible (spec-pinned parity).
    * `vals` must be (keyCols..., __v double) with null/NaN removed;
    * `baseDf` its checkpointed per-group (__n, __mn, __mx). */
  private def quantilesByGroupDistributed(vals: DataFrame, baseDf: DataFrame,
      keyCols: Seq[String], ps: Seq[Double], names: Seq[String],
      countCol: Option[String], bins: Int, collectThreshold: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val key = keyCols.map(col)
    // per-(group, p): the 0-based position and its two 1-based ranks
    val poss = baseDf
      .select(key ++ Seq(col("__n"), col("__mn"), col("__mx"),
        explode(array(ps.indices.map(i =>
          struct(lit(i).as("pi"),
            (lit(ps(i)) * (col("__n") - 1).cast("double")).as("pos"))): _*))
          .as("__p")): _*)
      .select(key ++ Seq(col("__n"), col("__mn"), col("__mx"),
        col("__p.pi").as("__pi"), col("__p.pos").as("__pos"),
        (floor(col("__p.pos")).cast("long") + 1).as("__klo"),
        (ceil(col("__p.pos")).cast("long") + 1).as("__khi")): _*)
      .localCheckpoint()
    graft.util.Ckpt.release(baseDf) // folded into poss; nothing below reads it
    // distinct wanted ranks → initial selection state: one row per
    // (group, rank) with its candidate interval [lo, hi] and count
    var state = poss
      .select(key ++ Seq(explode(array(col("__klo"), col("__khi"))).as("__k"),
        col("__n"), col("__mn"), col("__mx")): _*)
      .distinct()
      .select(key ++ Seq(col("__k"), col("__k").as("__krem"),
        col("__mn").as("__lo"), col("__mx").as("__hi"),
        col("__n").as("__cnt")): _*)
      .localCheckpoint()
    val doneParts = mutable.ArrayBuffer.empty[DataFrame]
    val unitKey = keyCols ++ Seq("__lo", "__hi")
    var level = 0
    while (!state.isEmpty) {
      level += 1
      val effTh = math.min(MaxCollect.toLong, collectThreshold.toLong
        << math.max(0, math.min(level - EscalateLevel, 30))).toInt
      // Each round's finished selections are materialized (they are
      // selection-sized — O(groups × ranks) rows) so the superseded
      // round's state blocks can be released at the bottom of the loop
      // instead of pinning every round's checkpoint until the final
      // action (VERDICT r14 #1).
      val prev = state
      // degenerate interval: the value IS the selection
      doneParts += prev.filter(col("__lo") === col("__hi"))
        .select(key ++ Seq(col("__k"), col("__lo").as("__val")): _*)
        .localCheckpoint()
      val live = prev.filter(col("__lo") =!= col("__hi"))
      // width underflow ⇒ ≤ ~bins representable doubles left: finish
      val isSmall = col("__cnt") <= effTh ||
        (col("__hi") - col("__lo")) / bins === 0.0
      val small = live.filter(isSmall)
      val big = live.filter(!isSmall)
      // ONE histogram pass over every still-narrowing interval. Work
      // units (key, lo, hi) within a group have disjoint intervals
      // (different buckets of some ancestor histogram), so each row
      // joins at most one unit per group and per-unit counts are exact.
      val bigUnits = big.select(unitKey.map(col): _*).distinct()
      val w = (col("__hi") - col("__lo")) / bins
      val bin = least(greatest(
        floor((col("__v") - col("__lo")) / w).cast("int"), lit(0)), lit(bins - 1))
      val hist = vals.join(bigUnits, keyCols)
        .filter(col("__v") >= col("__lo") && col("__v") <= col("__hi"))
        .groupBy(unitKey.map(col) :+ bin.as("__b"): _*)
        .agg(count(lit(1)).as("__c"), min(col("__v")).as("__bmn"),
          max(col("__v")).as("__bmx"))
      val cumB = Window.partitionBy(unitKey.map(col): _*).orderBy(col("__b"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // the bucket holding the rank: first with cumulative ≥ kRem;
      // recurse into its OBSERVED [min, max] with the in-bucket rank
      state = big.join(hist.withColumn("__cum", sum(col("__c")).over(cumB)),
          unitKey)
        .filter(col("__cum") - col("__c") < col("__krem")
          && col("__krem") <= col("__cum"))
        .select(key ++ Seq(col("__k"),
          (col("__krem") - (col("__cum") - col("__c"))).as("__krem"),
          col("__bmn").as("__lo"), col("__bmx").as("__hi"),
          col("__c").as("__cnt")): _*)
        .localCheckpoint()
      // finished intervals: value-distinct selection, executor-side.
      // Guarded by a cheap probe of the (checkpointed, selection-sized)
      // state: materializing an empty part would still cost a join job
      // against `vals` on rounds where nothing finished.
      if (small.limit(1).count() > 0) {
        val smallUnits = small.select(unitKey.map(col): _*).distinct()
        val cumV = Window.partitionBy(unitKey.map(col): _*).orderBy(col("__v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        doneParts += small.join(
            vals.join(smallUnits, keyCols)
              .filter(col("__v") >= col("__lo") && col("__v") <= col("__hi"))
              .groupBy(unitKey.map(col) :+ col("__v"): _*)
              .agg(count(lit(1)).as("__c"))
              .withColumn("__cum", sum(col("__c")).over(cumV)),
            unitKey)
          .filter(col("__cum") - col("__c") < col("__krem")
            && col("__krem") <= col("__cum"))
          .select(key ++ Seq(col("__k"), col("__v").as("__val")): _*)
          .localCheckpoint()
      }
      graft.util.Ckpt.release(prev) // both done parts + next state materialized
    }
    graft.util.Ckpt.release(state) // the loop exit saw it empty
    val done = doneParts.reduce(_.unionByName(_))
    // interpolation replaying Spark's percentile exactly: pos = p·(n−1)
    // 0-based, (⌈pos⌉−pos)·v(⌊pos⌋) + (pos−⌊pos⌋)·v(⌈pos⌉), both rank
    // values fetched by joining the distributed selections back
    val dlo = done.select(key ++ Seq(col("__k").as("__klo"),
      col("__val").as("__vlo")): _*)
    val dhi = done.select(key ++ Seq(col("__k").as("__khi"),
      col("__val").as("__vhi")): _*)
    val q = poss.join(dlo, keyCols :+ "__klo").join(dhi, keyCols :+ "__khi")
      .withColumn("__q", when(col("__klo") === col("__khi"), col("__vlo"))
        .otherwise((col("__khi") - 1 - col("__pos")) * col("__vlo")
          + (col("__pos") - (col("__klo") - 1)) * col("__vhi")))
    val aggCols = ps.indices.map(i =>
      max(when(col("__pi") === i, col("__q"))).as(names(i))) ++
      countCol.map(c => max(col("__n")).as(c))
    // Materialize the answer (group-domain-sized — the same order as
    // the result itself) so every internal checkpoint can be released
    // NOW and the caller's `vals` is provably unreferenced (the
    // result-independence contract in quantilesByGroupPrepped's doc).
    val out = q.groupBy(key: _*).agg(aggCols.head, aggCols.tail: _*)
      .localCheckpoint()
    graft.util.Ckpt.release(poss +: doneParts.toSeq: _*)
    out
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
