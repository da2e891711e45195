package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the newest right row with equal keys and
  * `right.ts <= left.ts` — the reference's latest-price read
  * (`Id = :id AND Timestamp <= :t`, DESC, Limit 1;
  * /root/reference/index.js:301-321) generalized from point lookup to join
  * (SURVEY A9 → B13).
  *
  * Implementation is union + ordered window (sort-merge style): both sides
  * shuffle ONCE on the keys and are sorted together; the carried right
  * payload propagates via `last(_, ignoreNulls)` over the ordered frame.
  * This is O(n log n) per key group and scales linearly with executors —
  * unlike the naive inequality join, which Spark plans as a nested loop.
  * At equal timestamps the right row sorts first, so `<=` is inclusive.
  *
  * Right rows must be unique per (keys, ts) for full determinism —
  * pre-dedup with [[Dedup.lastWins]] otherwise.
  *
  * NULL join keys follow SQL equi-join semantics: a NULL key never
  * matches, so null-keyed right rows are dropped before the merge and
  * null-keyed left rows come back with a null match (left-join shape).
  */
object AsOf {

  /** Drop right rows whose join key (any component) is null — NULL never
    * matches in an equi-join, but window partitionBy / groupBy treat
    * nulls as equal, so they must be excluded up front. */
  private def nonNullKeys(df: DataFrame, keys: Seq[String]): DataFrame =
    if (keys.isEmpty) df // keyless (global single-series) as-of join
    else df.filter(keys.map(col(_).isNotNull).reduce(_ && _))

  /** `direction` extends the reference's backward lookup to the full
    * merge_asof family:
    *  - `backward` (default): newest right with `rts <= lts`;
    *  - `forward`: earliest right with `rts >= lts` (the symmetric
    *    window over descending time — still one shuffle, the second
    *    sort reuses the key exchange);
    *  - `nearest`: whichever of the two is closer in time, ties to the
    *    backward match (pandas semantics);
    *  - `both`: BOTH bracketing matches side by side — backward under
    *    `rightPrefix`, forward under `forwardPrefix` (the
    *    interpolation input shape; one union + one keyed shuffle, the
    *    two window passes share the exchange).
    * `tolerance` (an INTERVAL column, e.g. `expr("INTERVAL 1 HOUR")`)
    * nulls out matches farther than the interval from the left
    * timestamp — applied per direction BEFORE the nearest choice. */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightPrefix: String = "r_",
      direction: String = "backward",
      tolerance: Option[Column] = None,
      forwardPrefix: String = "f_"): DataFrame = {
    require(Seq("backward", "forward", "nearest", "both").contains(direction),
      s"direction must be backward | forward | nearest | both, got '$direction'")
    // direction="both" emits every right payload column twice, once per
    // prefix — equal prefixes would silently produce duplicate column
    // names that only fail on later reference. Refuse loudly instead.
    require(direction != "both" || rightPrefix != forwardPrefix,
      s"direction='both' needs distinct prefixes, got rightPrefix = " +
        s"forwardPrefix = '$rightPrefix'")
    val rightNN = nonNullKeys(right, keys)
    val rightPayload = right.columns.filterNot(keys.contains(_)).toIndexedSeq
    require(rightPayload.contains(rightTs),
      s"right ts column $rightTs must not be a join key")
    val rStructCols = rightPayload.map(c => col(c).as(c))
    val rStructType = right.select(rStructCols: _*).schema

    val keyCols: Seq[Column] = keys.map(col)
    val lTagged = left.select(
      keyCols ++ Seq(
        col(leftTs).cast("timestamp").as("__ts"),
        lit(1).as("__side"),
        struct(left.columns.toIndexedSeq.map(col): _*).as("__l"),
        lit(null).cast(org.apache.spark.sql.types.StructType(rStructType)).as("__r")): _*)
    val rTagged = rightNN.select(
      keyCols ++ Seq(
        col(rightTs).cast("timestamp").as("__ts"),
        lit(0).as("__side"),
        lit(null).cast(lTagged.schema("__l").dataType).as("__l"),
        struct(rStructCols: _*).as("__r")): _*)

    // at equal timestamps the right row sorts first in BOTH orderings
    // (side 0 < 1 ascending on the tie column), so <= / >= stay inclusive
    def w(order: Column) = Window.partitionBy(keys.map(col): _*)
      .orderBy(order, col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def mts(m: Column) = m.getField(rightTs).cast("timestamp")
    // tolerance nulls out a directional match farther than tol from lts
    def tolB(m: Column): Column = tolerance.fold(m)(tol =>
      when(m.isNotNull && mts(m) >= col("__ts") - tol, m))
    def tolF(m: Column): Column = tolerance.fold(m)(tol =>
      when(m.isNotNull && mts(m) <= col("__ts") + tol, m))
    val mBack = last(col("__r"), ignoreNulls = true).over(w(col("__ts").asc))
    val mFwd = last(col("__r"), ignoreNulls = true).over(w(col("__ts").desc))

    val union = lTagged.unionByName(rTagged)
    val matched = direction match {
      case "backward" =>
        union.withColumn("__mb", mBack)
          .withColumn("__match", tolB(col("__mb")))
      case "forward" =>
        union.withColumn("__mf", mFwd)
          .withColumn("__match", tolF(col("__mf")))
      case "nearest" =>
        union
          .withColumn("__mb", mBack).withColumn("__mf", mFwd)
          .withColumn("__mb", tolB(col("__mb")))
          .withColumn("__mf", tolF(col("__mf")))
          .withColumn("__match",
            when(col("__mb").isNull, col("__mf"))
              .when(col("__mf").isNull, col("__mb"))
              // strict <: a tie in distance keeps the backward match
              .when(unix_micros(mts(col("__mf"))) - unix_micros(col("__ts"))
                  < unix_micros(col("__ts")) - unix_micros(mts(col("__mb"))),
                col("__mf"))
              .otherwise(col("__mb")))
      case "both" =>
        union.withColumn("__mb", mBack).withColumn("__mf", mFwd)
          .withColumn("__mb", tolB(col("__mb")))
          .withColumn("__mf", tolF(col("__mf")))
    }
    val joined = matched.filter(col("__side") === 1)
    val leftOut = left.columns.toIndexedSeq.map(c => col(s"__l.$c").as(c))
    val rightOut =
      if (direction == "both")
        rightPayload.map(c => col(s"__mb.$c").as(rightPrefix + c)) ++
          rightPayload.map(c => col(s"__mf.$c").as(forwardPrefix + c))
      else rightPayload.map(c => col(s"__match.$c").as(rightPrefix + c))
    joined.select(leftOut ++ rightOut: _*)
  }

  /** Merge-based as-of join through the engine's custom operator
    * ([[graft.plans.AsOfJoinNode]] → [[graft.plans.AsOfJoinMergeExec]]):
    * same semantics and output shape as [[asofJoin]], but executed as a
    * single forward merge over co-partitioned sorted children — O(n+m)
    * per partition with one buffered right row, no window state.
    * `leftTs`/`rightTs` must be TimestampType. */
  def asofJoinMerge(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightPrefix: String = "r_"): DataFrame = {
    // Keyless merge would need AllTuples distribution (single partition);
    // the window form already handles that shape — delegate rather than
    // fail inside the planner with ClusteredDistribution(Nil).
    if (keys.isEmpty) return asofJoin(left, right, keys, leftTs, rightTs, rightPrefix)
    val spark = left.sparkSession
    org.apache.spark.sql.graft.Bridge.registerStrategy(spark, graft.plans.AsOfJoinStrategy)
    val rightPrefixed = nonNullKeys(right, keys)
      .toDF(right.columns.toIndexedSeq.map(rightPrefix + _): _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = rightPrefixed.queryExecution.analyzed
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, name: String) =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found in ${plan.output.map(_.name)}"))
    val node = graft.plans.AsOfJoinNode(
      lPlan, rPlan,
      keys.map(attr(lPlan, _)),
      keys.map(k => attr(rPlan, rightPrefix + k)),
      attr(lPlan, leftTs),
      attr(rPlan, rightPrefix + rightTs))
    org.apache.spark.sql.graft.Bridge.ofRows(spark, node)
      .drop(keys.map(rightPrefix + _): _*)
  }

  /** A9 point form: latest row per key as of time `t`. */
  def latestAsOf(df: DataFrame, keys: Seq[String], tsCol: String, t: String,
      tieBreak: Seq[String] = Seq.empty): DataFrame = {
    val order = col(tsCol).desc +: tieBreak.map(col(_).desc)
    Dedup.keepOne(df.filter(col(tsCol) <= lit(t).cast("timestamp")), keys, order)
  }

  /** RESAMPLE + FORWARD FILL: the irregular per-key series `obs`
    * projected onto a regular time grid, each grid point carrying the
    * key's last observation at-or-before it — the reference's as-of
    * price read (`Timestamp <= :t` DESC Limit 1,
    * /root/reference/index.js:305-314) evaluated for EVERY key at
    * EVERY grid step in one relational plan (the "daily price table
    * from an event stream" shape every time-series consumer builds).
    *
    * The grid is `distinct keys × sequence(start, end, step)` — one
    * key-domain aggregate, then a per-row `sequence`+`explode` (grid
    * generation is distributed, never a driver loop), and the fill is
    * [[asofJoinMerge]]: the engine's co-partitioned single-forward-
    * merge plan, O(|grid| + |obs|) per partition with no window state.
    * Grid points before a key's first observation carry nulls (left
    * as-of semantics — there is nothing to fill from yet).
    *
    * `obs` must be unique per (keys, tsCol) — equal-timestamp
    * duplicates would make the fill nondeterministic, so they are
    * refused loudly via a one-aggregate probe (dedup last-wins
    * upstream; [[graft.operators.Dedup.lastWins]] is the tool).
    * 100 TB shape: the probe and the grid build ride the same keyed
    * shuffle cadence as the join itself; nothing is collected. */
  def resampleFfill(obs: DataFrame, keys: Seq[String], tsCol: String,
      start: String, end: String, step: Column,
      gridCol: String = "grid_ts", obsPrefix: String = "last_"): DataFrame = {
    require(keys.nonEmpty, "resampleFfill needs ≥1 key column")
    val obsNN = nonNullKeys(obs, keys).filter(col(tsCol).isNotNull)
    val dupes = obsNN.groupBy((keys :+ tsCol).map(col): _*)
      .agg(count(lit(1)).as("__n")).filter(col("__n") > 1).limit(1).count()
    require(dupes == 0L,
      s"resampleFfill: duplicate (${keys.mkString(", ")}, $tsCol) " +
        "observations — forward fill would be nondeterministic; dedup " +
        "last-wins first (Dedup.lastWins)")
    val grid = obsNN.select(keys.map(col): _*).distinct()
      .withColumn(gridCol, explode(sequence(
        lit(start).cast("timestamp"), lit(end).cast("timestamp"), step)))
    asofJoinMerge(grid, obsNN, keys, gridCol, tsCol, obsPrefix)
  }

  /** RESAMPLE + LINEAR INTERPOLATION: [[resampleFfill]]'s grid with
    * each point carrying the time-weighted blend of its two BRACKETING
    * observations — prev (last at-or-before) and next (first
    * at-or-after):
    * {{{ interp = prev + (next − prev) · (grid − prev_ts)/(next_ts − prev_ts) }}}
    * A grid point landing exactly on an observation returns that value
    * (both brackets are the observation itself); a point before a
    * key's first or after its last observation returns null — NO
    * extrapolation (the honest answer outside the observed range; the
    * caller composes [[resampleFfill]] for hold-last semantics).
    *
    * One keyed shuffle total: the `both` direction of [[asofJoin]]
    * computes the two brackets in a single union + two window passes
    * over the same exchange. The blend is ONE closed-form expression
    * over epoch-microsecond arithmetic (no accumulation), so a SQL
    * oracle replays it bit-exactly. Same uniqueness precondition as
    * [[resampleFfill]], refused the same way. */
  def resampleInterpolate(obs: DataFrame, keys: Seq[String], tsCol: String,
      valCol: String, start: String, end: String, step: Column,
      gridCol: String = "grid_ts", outCol: String = "interp"): DataFrame = {
    require(keys.nonEmpty, "resampleInterpolate needs ≥1 key column")
    val obsNN = nonNullKeys(obs, keys)
      .filter(col(tsCol).isNotNull)
      .select((keys.map(col) :+ col(tsCol) :+
        col(valCol).cast("double").as(valCol)): _*)
    val dupes = obsNN.groupBy((keys :+ tsCol).map(col): _*)
      .agg(count(lit(1)).as("__n")).filter(col("__n") > 1).limit(1).count()
    require(dupes == 0L,
      s"resampleInterpolate: duplicate (${keys.mkString(", ")}, $tsCol) " +
        "observations — interpolation would be nondeterministic; dedup " +
        "last-wins first (Dedup.lastWins)")
    val grid = obsNN.select(keys.map(col): _*).distinct()
      .withColumn(gridCol, explode(sequence(
        lit(start).cast("timestamp"), lit(end).cast("timestamp"), step)))
    val prevTs = col(s"prev_$tsCol")
    val nextTs = col(s"next_$tsCol")
    asofJoin(grid, obsNN, keys, gridCol, tsCol,
        rightPrefix = "prev_", direction = "both", forwardPrefix = "next_")
      .withColumn(outCol,
        when(prevTs.isNull || nextTs.isNull, lit(null).cast("double"))
          .when(unix_micros(nextTs) === unix_micros(prevTs),
            col(s"prev_$valCol"))
          .otherwise(col(s"prev_$valCol") +
            (col(s"next_$valCol") - col(s"prev_$valCol")) *
              ((unix_micros(col(gridCol)) - unix_micros(prevTs)).cast("double") /
                (unix_micros(nextTs) - unix_micros(prevTs)).cast("double"))))
  }
}
