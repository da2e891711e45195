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

  /** HOF reference formulation — kept as the readable spec of the fold
    * semantics. HigherOrderFunction is CodegenFallback in Spark, so this
    * interprets its lambdas per element. */
  def cosineHof(a: Column, b: Column): Column = {
    val ad = toDouble(a)
    val bd = toDouble(b)
    dot(ad, bd) / (l2Norm(ad) * l2Norm(bd))
  }

  /** Production cosine: the fused codegen'd native expression
    * ([[graft.functions.CosineSim]]) — bit-identical to [[cosineHof]]
    * (same sequential fold), ~one typed loop per row instead of three
    * interpreted HOF passes. */
  def cosine(a: Column, b: Column): Column =
    call_function("cosine_sim", a, b)

  /** Per-row L2 norm with the exact element fold of [[cosine]]'s norm
    * accumulators (cast-to-double, ascending index, sequential adds) —
    * computed ONCE per row so the O(pairs) scorers pay only the dot.
    * Production form is the fused native [[graft.functions.VecNormNative]]
    * (bit-identical to [[normDHof]], parity-tested — HOFs are
    * CodegenFallback and interpret per element, r19). */
  private def normD(v: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(graft.functions.VecNormNative(
      org.apache.spark.sql.graft.Bridge.expression(v)))

  /** HOF reference formulation of [[normD]] — the readable spec the
    * native expression is parity-tested against. */
  private[graft] def normDHof(v: Column): Column =
    sqrt(aggregate(transform(v, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, x) => acc + x))

  /** Cast-to-double-first dot product (the int8 rerank fold) as the
    * fused native [[graft.functions.DotProdNative]] — bit-identical to
    * [[dotDHof]], parity-tested (r19). */
  private[graft] def dotD(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(graft.functions.DotProdNative(
      org.apache.spark.sql.graft.Bridge.expression(a),
      org.apache.spark.sql.graft.Bridge.expression(b)))

  /** HOF reference formulation of [[dotD]]. */
  private[graft] def dotDHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, q) => x.cast("double") * q.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** (q_id, __qv, __qn) / (c_id, __cv, __cn) projections shared by the
    * top-k searchers. */
  private def qSide(df: DataFrame, id: String, vec: String): DataFrame =
    df.select(col(id).as("q_id"), col(vec).as("__qv"), normD(col(vec)).as("__qn"))
  private def cSide(df: DataFrame, id: String, vec: String): DataFrame =
    // the candidate side carries all the per-row vector math (norms,
    // assignment argmins, int8 codes) — a single-split scan would run
    // it on one task, so spread first (no-op at scale, see [[Spread]])
    Spread.byKey(df, id)
      .select(col(id).as("c_id"), col(vec).as("__cv"), normD(col(vec)).as("__cn"))

  /** Shared tail of every top-k searcher: drop self-matches, score with
    * dot/(‖q‖·‖c‖) — bit-identical to the fused cosine, with the norms
    * precomputed per row — keep k per query with the (cosine desc, c_id)
    * tie-break. Expects columns q_id, c_id, __qv, __cv, __qn, __cn. */
  private def rerankTopK(pairs: DataFrame, k: Int): DataFrame = {
    val scored = pairs.filter(col("q_id") =!= col("c_id"))
      .withColumn("cosine",
        dotNative(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")))
    Dedup.topKPerGroup(scored, Seq("q_id"),
        Seq(col("cosine").desc, col("c_id")), k, "rank")
      .select(col("q_id"), col("rank"), col("c_id"), col("cosine"))
  }

  /** Exact top-k: for each query row, the k nearest candidates by cosine
    * (ties broken by candidate id). Queries are broadcast. */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame,
      qId: String, cId: String, vecCol: String, k: Int): DataFrame =
    rerankTopK(cSide(candidates, cId, vecCol)
      .crossJoin(broadcast(qSide(queries, qId, vecCol))), k)

  /** Approximate top-k over int8-QUANTIZED candidates — asymmetric
    * distance computation: the float query scores directly against the
    * candidate's integer codes ([[Quantize.int8Codes]]); for symmetric
    * quantization the scale cancels out of the cosine entirely, so
    * cos(q, ĉ) = Σ q_i·code_i / (‖q‖·√Σ code_i²) needs no
    * dequantization. The point at 100 TB: the candidate side shuffles /
    * caches 4× smaller than float32 (codes are small ints; the float
    * vectors never leave their scan), which is what makes a
    * billion-vector index fit executor memory. Ranking ties break on
    * (approx_cosine desc, c_id) like every other searcher. */
  def quantizedTopK(queries: DataFrame, candidates: DataFrame,
      qId: String, cId: String, vecCol: String, k: Int): DataFrame = {
    val cq = candidates
      .select(col(cId).as("c_id"), col(vecCol).as("__v0"),
        Quantize.int8Scale(col(vecCol)).as("__s"))
      .select(col("c_id"),
        Quantize.int8Codes(col("__v0"), col("__s")).as("__cc"))
      .withColumn("__cn", normD(col("__cc"))) // native: long codes square exactly
      .filter(col("__cn") > 0)
    val scored = cq.crossJoin(broadcast(qSide(queries, qId, vecCol)))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("approx_cosine",
        dotD(col("__qv"), col("__cc")) / (col("__qn") * col("__cn")))
    Dedup.topKPerGroup(scored, Seq("q_id"),
        Seq(col("approx_cosine").desc, col("c_id")), k, "rank")
      .select(col("q_id"), col("rank"), col("c_id"), col("approx_cosine"))
  }

  /** Deterministic pseudo-random hyperplanes (seeded), as literal columns. */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** L independent hyperplane sets — multi-table LSH (random-hyperplane
    * hashing per Charikar 2002; multi-table amplification per
    * Indyk/Motwani 1998). Recall compounds as 1-(1-p^bits)^L, which is
    * what makes random-projection LSH usable on weakly-correlated (e.g.
    * near-orthogonal random) embeddings. */
  def hyperplaneTables(tables: Int, bitsPerTable: Int, dim: Int,
      seed: Long = 42L): Array[Array[Array[Double]]] =
    Array.tabulate(tables)(l => hyperplanes(bitsPerTable, dim, seed + l))

  /** md5-derived hyperplanes, exactly replicable in ANSI SQL:
    * w(l,j,d) = bigint(first 15 hex chars of md5("l:j:d")) / 2^59 − 1,
    * uniform in [−1, 1). Uniform (not Gaussian) components lose strict
    * rotation invariance but sign-LSH only needs symmetric directions;
    * the payoff is that a DuckDB oracle can regenerate the planes and
    * replay the whole pipeline (see q50). Bit-parity holds because both
    * engines do IEEE BIGINT→DOUBLE rounding and the 2^59 divisor is a
    * power of two (exact). */
  def hashPlanes(tables: Int, bits: Int, dim: Int): Array[Array[Array[Double]]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(tables, bits, dim) { (l, j, d) =>
      val hex = md.digest(s"$l:$j:$d".getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString.take(15)
      java.lang.Long.parseLong(hex, 16).toDouble / 576460752303423488.0 - 1.0
    }
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

  /** Embedding-cosine near-dup pairs (the last dedup flavor in §2.C:
    * semantic near-dups that share no surface text). Exact all-pairs form.
    *
    * Physical strategy: a BroadcastNestedLoopJoin — Spark's own broadcast
    * machinery ships one copy of the vector relation and every executor
    * streams its rows through the codegen'd pair pipeline; the O(n²) pair
    * rows are never shuffled or materialized, and no driver-side collect
    * happens in this code (the engine builds the broadcast with its usual
    * memory accounting). Exact all-pairs is inherently O(n²) — at corpus
    * scale feed LSH/IVF candidates through the same `tau` filter instead
    * (compose [[lshNearDupPairs]]/[[lshTopK]]/[[ivfTopK]]). */
  def cosineNearDupPairs(df: DataFrame, id: String, vecCol: String,
      tau: Double): DataFrame =
    cosineNearDupPairsJoin(df, id, vecCol, tau, hintBroadcast = true)

  /** Codegen'd dot product ([[graft.functions.DotProduct]] — the dot
    * fold of [[cosine]], alone). */
  def dotNative(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.functions.DotProduct(
        org.apache.spark.sql.graft.Bridge.expression(a),
        org.apache.spark.sql.graft.Bridge.expression(b)))

  /** Declarative self-join formulation — the readable spec of
    * [[cosineNearDupPairs]] (identical output; parity-tested).
    * `hintBroadcast` pins the build side to a broadcast nested loop; left
    * unhinted Spark may pick a cartesian product instead.
    *
    * Norms are computed once per ROW before the join; each of the O(n²)
    * pairs pays only the dot. `dot/(an·bn)` is bit-identical to the
    * fused [[cosine]]: every factor comes from the same sequential fold,
    * only the evaluation site moves off the quadratic path. Same
    * precondition as the other vector ops: no null ELEMENTS inside
    * vectors (a null element null-poisons the norm fold and drops the
    * row; whole-null vectors are dropped either way). */
  def cosineNearDupPairsJoin(df: DataFrame, id: String, vecCol: String,
      tau: Double, hintBroadcast: Boolean = false): DataFrame = {
    val a = df.select(col(id).as("a_id"), col(vecCol).as("__av"),
      normD(col(vecCol)).as("__an"))
    val b0 = df.select(col(id).as("b_id"), col(vecCol).as("__bv"),
      normD(col(vecCol)).as("__bn"))
    val b = if (hintBroadcast) broadcast(b0) else b0
    a.join(b, col("a_id") < col("b_id"))
      .withColumn("cosine",
        dotNative(col("__av"), col("__bv")) / (col("__an") * col("__bn")))
      .filter(col("cosine") >= tau)
      .select(col("a_id"), col("b_id"), col("cosine"))
  }

  /** Hand-blocked broadcast nested loop — an opt-in micro-optimization of
    * [[cosineNearDupPairs]] (bit-identical output; parity-tested in
    * CTierSpec). Each row binary-searches the id-sorted broadcast index
    * and scores only higher-id vectors, halving the flops of the
    * declarative join. The index is materialized on the driver, so this
    * variant fails fast past `maxIndexRows` instead of OOMing the driver
    * at plan time, and null ids / null vector arrays are dropped up front
    * to match the join form's null-drop semantics. Not the default: the
    * driver materialization makes it a single-node tool, not a 100 TB one. */
  def cosineNearDupPairsBlocked(df: DataFrame, id: String, vecCol: String,
      tau: Double, maxIndexRows: Int = 1 << 20): DataFrame = {
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val isFloat = df.schema(vecCol).dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (!isFloat) return cosineNearDupPairsJoin(df, id, vecCol, tau)
    import df.sparkSession.implicits._
    val typed = df
      .filter(col(id).isNotNull && col(vecCol).isNotNull)
      .select(col(id).cast("long").as("a"), col(vecCol).as("v"))
      .as[(Long, Array[Float])]
    // take(max+1), not collect(): stops reading once the cap is proven
    // exceeded, so oversized inputs error before driver memory fills.
    val taken = typed.take(maxIndexRows + 1)
    require(taken.length <= maxIndexRows,
      s"cosineNearDupPairsBlocked: input exceeds maxIndexRows=$maxIndexRows; " +
        "use cosineNearDupPairs (distributed) or LSH candidates at this scale")
    val index = taken.sortBy(_._1)
    val bc = df.sparkSession.sparkContext.broadcast(index)
    typed.mapPartitions { it =>
      val arr = bc.value
      it.flatMap { case (aId, av) =>
        // first index with id > aId (ids unique, ascending)
        var lo = 0
        var hi = arr.length
        while (lo < hi) {
          val m = (lo + hi) >>> 1
          if (arr(m)._1 <= aId) lo = m + 1 else hi = m
        }
        Iterator.range(lo, arr.length).flatMap { j =>
          val (bId, bv) = arr(j)
          val c = cosineArrays(av, bv)
          // Spark SQL's total order puts NaN above every double, so the
          // declarative `cosine >= tau` KEEPS NaN (zero-norm vectors);
          // Java's >= would drop it — match Spark semantics for parity.
          if (c >= tau || c.isNaN) Some((aId, bId, c)) else None
        }
      }
    }.toDF("a_id", "b_id", "cosine")
  }

  /** Same sequential fold as [[graft.functions.CosineSim]].compute over
    * raw float arrays — bit-identical to the cosine column expression. */
  private def cosineArrays(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a(i).toDouble
      val y = b(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    var j = n
    while (j < a.length) { val x = a(j).toDouble; na += x * x; j += 1 }
    var k = n
    while (k < b.length) { val y = b(k).toDouble; nb += y * y; k += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Squared L2 as the same deterministic sequential fold on both
    * engines (cast-to-double, ascending index, sequential adds) —
    * shared by every coarse-quantizer assignment/probe so the oracle
    * can replay cell boundaries bit-exactly. Production form is the
    * fused native [[graft.functions.SqDistNative]] (bit-identical to
    * [[sqDistHof]], parity-tested, r19). */
  private def sqDist(v: Column, w: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(graft.functions.SqDistNative(
      org.apache.spark.sql.graft.Bridge.expression(v),
      org.apache.spark.sql.graft.Bridge.expression(w)))

  /** HOF reference formulation of [[sqDist]] — the readable spec the
    * native expression is parity-tested against. */
  private[graft] def sqDistHof(v: Column, w: Column): Column =
    aggregate(zip_with(toDouble(v), toDouble(w), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

  /** The n nearest codebook cells per row, RELATIONALLY: `cb` is a
    * one-row broadcast of sorted (cell, v) structs, so this is a
    * BroadcastNestedLoopJoin row-attach plus ONE projection —
    * `array_sort` over (d2, cell) structs gives the exact
    * (distance, cell-id) tie-break, `slice` keeps n, explode emits one
    * row per probed cell. No per-row closure, no window shuffle: the
    * corpus-sized side never shuffles at all for assignment (n = 1
    * explodes to exactly one row). */
  private def probeCells(vecs: DataFrame, vc: String, cb: DataFrame,
      n: Int): DataFrame =
    vecs.crossJoin(cb)
      .withColumn("cell", explode(transform(
        slice(array_sort(transform(col("__cb"),
          e => struct(sqDist(col(vc), e("v")).as("d2"), e("cell").as("cell")))),
          1, n),
        s => s("cell"))))
      .drop("__cb")

  /** One-row broadcast codebook from (cell, v) rows — the shape
    * [[probeCells]]/[[assignCells]] consume. */
  private def broadcastCodebook(cbRows: DataFrame): DataFrame =
    broadcast(
      cbRows.agg(sort_array(collect_list(struct(col("cell"), col("v")))).as("__cb")))

  /** IVF (inverted-file) approximate top-k: a seeded KMeans coarse
    * quantizer assigns every candidate to one of `nlist` cells ONCE; each
    * query probes only its `nprobe` nearest cells. The classic
    * Voronoi-partition ANN layout (IVFADC family, Jégou et al. 2011,
    * minus the PQ compression) — candidate volume per query drops
    * nlist/nprobe-fold. Deterministic via fixed seed.
    *
    * Scale shape: the ONLY per-row closure is the ml-Vector conversion
    * feeding KMeans.fit (the ML API's required input type); the trained
    * centroids then become an ordinary broadcast codebook and both the
    * corpus assignment and the query probe run through the relational
    * argmin of [[probeCells]] — codegen'd projections, no UDF on the
    * corpus-sized path, no shuffle for assignment. */
  def ivfTopK(queries: DataFrame, candidates: DataFrame,
      qId: String, cId: String, vecCol: String, k: Int,
      nlist: Int = 16, nprobe: Int = 3, seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.linalg.Vectors
    val toVec = udf((a: Seq[Float]) => Vectors.dense(a.map(_.toDouble).toArray))
    val c = cSide(candidates, cId, vecCol)
    // Random init + few Lloyd iterations: a coarse quantizer only needs
    // rough Voronoi cells (recall comes from nprobe), and k-means|| init
    // alone costs more scheduler round-trips than the whole refinement.
    val model = new KMeans().setK(nlist).setSeed(seed)
      .setInitMode("random").setMaxIter(5)
      .fit(c.withColumn("features", toVec(col("__cv"))))
    val s = candidates.sparkSession
    import s.implicits._
    val cb = broadcastCodebook(
      model.clusterCenters.zipWithIndex.toSeq
        .map { case (ctr, i) => (i.toLong, ctr.toArray.toSeq) }
        .toDF("cell", "v"))
    val cAssigned = probeCells(c, "__cv", cb, 1)
    val qProbes = probeCells(qSide(queries, qId, vecCol), "__qv", cb, nprobe)
    rerankTopK(cAssigned.join(broadcast(qProbes), Seq("cell")), k)
  }

  /** All L bucket ids in one fused native pass (the production form of
    * per-table [[lshBucket]] HOF columns; parity-tested). */
  def lshBucketsAll(vec: Column, tables: Array[Array[Array[Double]]]): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.functions.LshBuckets(
        org.apache.spark.sql.graft.Bridge.expression(vec),
        tables.flatten.flatten.toIndexedSeq,
        tables.length, tables(0).length, tables(0)(0).length))

  /** IVF with a FIXED sampled codebook: the coarse quantizer's centroids
    * are the `nlist` lowest-id candidate vectors instead of KMeans means.
    * Same inverted-file structure and nprobe search as [[ivfTopK]] —
    * codebook choice is orthogonal to the IVF idea (at corpus scale the
    * codebook is trained offline anyway; data-point codebooks are the
    * classic bootstrap) — but every step is deterministic relational
    * algebra, so the DuckDB oracle replays assignment, probing, and
    * re-ranking exactly (q59). Ties break on (distance, cell id).
    * Precondition: fixed-length vectors with no null elements (a null
    * element would null-poison the engine's d2 fold while SQL SUM skips
    * nulls — the oracle assumes well-formed vectors). */
  def ivfTopKFixedCodebook(queries: DataFrame, candidates: DataFrame,
      qId: String, cId: String, vecCol: String, k: Int,
      nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    val c = cSide(candidates, cId, vecCol)
    val cb = broadcastCodebook(
      c.orderBy(col("c_id")).limit(nlist)
        .select(col("c_id").as("cell"), col("__cv").as("v")))
    // Assignment and probing are [[probeCells]] projections — the old
    // form ranked cells with a per-id window (a corpus-wide shuffle)
    // and joined the assignment back onto the corpus (a second one);
    // both are gone, with the identical (d2, cell) tie-break.
    val cAssigned = probeCells(c, "__cv", cb, 1)
    val qProbes = probeCells(qSide(queries, qId, vecCol), "__qv", cb, nprobe)
    rerankTopK(cAssigned.join(broadcast(qProbes), Seq("cell")), k)
  }

  /** kNN JOIN with a LARGE query side — [[ivfTopKFixedCodebook]]'s
    * semantics (identical results, pinned by the same oracle) with the
    * query broadcast REMOVED: every other searcher ships the query
    * table to all executors, which caps the query side at broadcast
    * size; here BOTH sides shuffle on `cell` into a hash join, so a
    * billion-query batch (corpus-vs-corpus linking, full-table
    * self-search) scales exactly like the candidate side. The second
    * scale move is the top-k itself: instead of the window rank over
    * every scored pair (a full shuffle of |pairs| rows sorted per
    * query), a bounded [[graft.functions.TopKScored]] aggregation
    * rides the existing shuffle — each map task shrinks its local
    * pairs to ≤ k per query, so the q_id shuffle moves at most
    * nprobe·k rows per query regardless of cell sizes (the merge step
    * of a sharded ANN search, as partial aggregation).
    *
    * Parallelism is cell-count-bound: size `nlist` with [[nlistFor]]
    * at scale (the fixture default 16 keeps the oracle replayable). */
  def ivfKnnJoinLargeQ(queries: DataFrame, candidates: DataFrame,
      qId: String, cId: String, vecCol: String, k: Int,
      nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    val s = queries.sparkSession
    val c = cSide(candidates, cId, vecCol)
    val cb = broadcastCodebook(
      c.orderBy(col("c_id")).limit(nlist)
        .select(col("c_id").as("cell"), col("__cv").as("v")))
    val cAssigned = probeCells(c, "__cv", cb, 1)
    val qProbes = probeCells(
      qSide(Spread.byKey(queries, qId), qId, vecCol), "__qv", cb, nprobe)
    val scored = cAssigned.hint("shuffle_hash").join(qProbes, Seq("cell"))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("cosine",
        dotNative(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")))
      .select(col("q_id"), col("c_id"), col("cosine"))
    val fn = graft.functions.TopKScoredAgg.register(s, k)
    scored.groupBy(col("q_id"))
      .agg(expr(s"$fn(cosine, c_id)").as("__top"))
      .select(col("q_id"), posexplode(col("__top")).as(Seq("__pos", "__e")))
      .select(col("q_id"), (col("__pos") + 1).cast("int").as("rank"),
        col("__e._2").as("c_id"), col("__e._1").as("cosine"))
  }

  /** IVF-SQ: inverted-file probing + int8 asymmetric scoring — the two
    * scale levers composed (the scalar-quantization member of the
    * IVFADC family, Jégou et al. 2011: cells bound how MANY candidates
    * a query touches, quantization bounds how WIDE each candidate is).
    * Fixed sampled codebook as in [[ivfTopKFixedCodebook]], so every
    * step — assignment, probing, code generation, ADC scoring — is
    * deterministic relational algebra the oracle replays exactly.
    * Candidate float vectors are dropped right after assignment; only
    * (cell, id, codes) survive onto the probe join. */
  def ivfTopKQuantizedFixedCodebook(queries: DataFrame, candidates: DataFrame,
      qId: String, cId: String, vecCol: String, k: Int,
      nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    val c = cSide(candidates, cId, vecCol)
    val cb = broadcastCodebook(
      c.orderBy(col("c_id")).limit(nlist)
        .select(col("c_id").as("cell"), col("__cv").as("v")))
    val cAssigned = probeCells(c, "__cv", cb, 1)
      .withColumn("__s", Quantize.int8Scale(col("__cv")))
      .select(col("c_id"), col("cell"),
        Quantize.int8Codes(col("__cv"), col("__s")).as("__cc"))
      .withColumn("__cn8", normD(col("__cc"))) // native: long codes square exactly
      .filter(col("__cn8") > 0)
    val qProbes = probeCells(qSide(queries, qId, vecCol), "__qv", cb, nprobe)
    val scored = cAssigned.join(broadcast(qProbes), Seq("cell"))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("approx_cosine",
        dotD(col("__qv"), col("__cc")) / (col("__qn") * col("__cn8")))
    Dedup.topKPerGroup(scored, Seq("q_id"),
        Seq(col("approx_cosine").desc, col("c_id")), k, "rank")
      .select(col("q_id"), col("rank"), col("c_id"), col("approx_cosine"))
  }

  /** SemDeDup (Abbas et al., "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication", arXiv:2303.09540):
    * partition the embedding space with a coarse codebook and hunt
    * near-duplicates ONLY within each cell — all-pairs O(n²) work drops
    * to Σ|cell|². A row is dropped iff a LOWER-id row in its own cell
    * has cosine ≥ tau (the keep-first rule; pairwise, not transitive, so
    * every decision is local and replayable as relational algebra).
    * Emits every input id with its cell, the keep bit, and — for dropped
    * rows — the best (highest-cosine, lowest-id) in-cell duplicate.
    *
    * Codebook: the nlist lowest-id vectors by default (the same
    * deterministic bootstrap as [[ivfTopKFixedCodebook]]); pass
    * `codebook` — a (cell: LONG, vec: ARRAY) DataFrame — to use
    * offline-trained centroids instead (at corpus scale the codebook IS
    * trained offline; the bootstrap is the self-contained default).
    * Scale shape: the codebook collapses to ONE broadcast row of
    * (cell, vec) structs, so assignment is a single codegen'd projection
    * over the corpus — argmin over an array of (d2, cell) structs, NO
    * shuffle, no per-row row explosion. The only corpus shuffles are the
    * in-cell self-join (keyed by cell) and the bounded best-dup window.
    *
    * Cell skew is bounded the same way as [[NearDup.candidatePairs]]'s
    * band buckets: a cell larger than `maxCell` would make the in-cell
    * self-join emit O(|cell|²) pairs in one task (a collapsed embedding
    * space, or a fixed nlist left at its default against a grown
    * corpus), so oversized cells are EXCLUDED from pair generation —
    * their rows come back `is_kept = true`, undeduped — with the
    * overflow reported on [[NearDup.BucketCapMetric]], never silently
    * (standalone audit: [[semanticOverflowCells]]). The non-degenerate
    * fix is a finer codebook: grow nlist with the corpus ([[nlistFor]])
    * or train one offline and pass it in. */
  /** Voronoi-cell assignment shared by [[semanticDedup]] and
    * [[semanticOverflowCells]] (so the operator and its audit can never
    * diverge on assignment semantics): projects `df` to
    * (c_id, __cv, __cn) and adds `cell` — the nearest codebook entry by
    * squared L2, ties on lowest cell id. The codebook collapses to ONE
    * broadcast row of (cell, vec) structs, so assignment is a single
    * codegen'd argmin projection over the corpus: NO shuffle, no row
    * explosion. `cell` is LONG in BOTH modes (the offline-codebook path
    * casts, the bootstrap path casts the id-derived label the same way)
    * so downstream schemas don't depend on which mode produced them. */
  private[graft] def assignCells(df: DataFrame, id: String, vecCol: String,
      nlist: Int, codebook: Option[DataFrame]): DataFrame = {
    val c = cSide(df, id, vecCol)
    val cbRows = codebook match {
      case Some(k) => k.select(col("cell").cast("long").as("cell"), col("vec").as("v"))
      case None => c.orderBy(col("c_id")).limit(nlist)
        .select(col("c_id").cast("long").as("cell"), col("__cv").as("v"))
    }
    val cb = broadcastCodebook(cbRows)
    // argmin (not probeCells' sort-and-slice): array_min over the same
    // (d2, cell) structs is one pass, and n is always 1 here.
    c.crossJoin(cb)
      .withColumn("cell",
        array_min(transform(col("__cb"),
          e => struct(sqDist(col("__cv"), e("v")).as("d2"), e("cell").as("cell"))))("cell"))
      .drop("__cb")
  }

  def semanticDedup(df: DataFrame, id: String, vecCol: String, tau: Double,
      nlist: Int = 16, maxCell: Int = NearDup.DefaultMaxBucket,
      codebook: Option[DataFrame] = None): DataFrame = {
    val assigned = assignCells(df, id, vecCol, nlist, codebook)
    // Hot-cell guard: cell populations are a tiny aggregate (the shuffle
    // moves only cell longs; ≤ nlist groups) broadcast-joined back onto
    // the corpus rows — no corpus shuffle. Rows in overflowing cells
    // skip the quadratic join entirely. The overflow observation rides
    // the OUTPUT lineage (every row flows through it at action time),
    // not the broadcast subtree, where CollectMetrics can be erased;
    // `__rep` (the cell's min id) lets dropped_buckets count each hot
    // cell exactly once without a distinct aggregate (observe forbids
    // those).
    val (outLeft, inCell) = if (maxCell == Int.MaxValue) {
      (assigned.select(col("c_id"), col("cell")), assigned)
    } else {
      // Null-SAFE count join: a degenerate codebook (empty DataFrame, or
      // cell ids that cast to null) assigns rows a null cell; an equi-join
      // here would silently drop them from the output, violating the
      // "emits every input id" contract. <=> keeps them — they count as
      // one group, never match in the in-cell equi-join below, and come
      // back `is_kept = true` (undeduped), same as hot-cell rows.
      val counts = assigned.groupBy(col("cell"))
        .agg(count(lit(1)).as("__n"), min(col("c_id")).as("__rep"))
        .withColumnRenamed("cell", "__ccell")
      val withN = assigned.join(broadcast(counts), col("cell") <=> col("__ccell"))
        .drop("__ccell")
      val n = col("__n")
      val observed = withN
        .observe(NearDup.nextBucketCapMetricName(),
          sum(when(n > maxCell && col("c_id") === col("__rep"), 1L)
            .otherwise(0L)).as("dropped_buckets"),
          sum(when(n > maxCell, 1L).otherwise(0L)).as("dropped_rows"),
          coalesce(max(n), lit(0L)).as("largest_bucket"))
        .select(col("c_id"), col("cell"))
      (observed, withN.filter(n <= maxCell).drop("__n", "__rep"))
    }
    val left = inCell.select(col("cell"), col("c_id").as("a_id"),
      col("__cv").as("__av"), col("__cn").as("__an"))
    val right = inCell.select(col("cell"), col("c_id").as("b_id"),
      col("__cv").as("__bv"), col("__cn").as("__bn"))
    val dups = left.join(right, Seq("cell"))
      .filter(col("a_id") > col("b_id"))
      .withColumn("cosine",
        dotNative(col("__av"), col("__bv")) / (col("__an") * col("__bn")))
      .filter(col("cosine") >= tau)
    val best = Dedup.keepOne(dups, Seq("a_id"),
        Seq(col("cosine").desc, col("b_id").asc))
      .select(col("a_id"), col("b_id").as("dup_of"), col("cosine"))
    outLeft.select(col("c_id").as(id), col("cell"))
      .join(best, col(id) === col("a_id"), "left")
      .select(col(id), col("cell"), col("dup_of").isNull.as("is_kept"),
        col("dup_of"), col("cosine"))
  }

  /** nlist that bounds the EXPECTED cell population of [[semanticDedup]]
    * at `targetCell` rows — the "grow nlist with the corpus" knob. The
    * cap ([[NearDup.DefaultMaxBucket]]) still guards the worst case;
    * this sizes the average so the cap rarely fires. */
  def nlistFor(rows: Long, targetCell: Int = 4096): Int = {
    require(rows >= 0, s"rows must be non-negative, got $rows")
    require(targetCell > 0, s"targetCell must be positive, got $targetCell")
    // non-overflowing ceiling division: rows + targetCell - 1 would wrap
    // near Long.MaxValue
    val cells = rows / targetCell + (if (rows % targetCell == 0) 0L else 1L)
    math.max(16L, math.min(1L << 20, cells)).toInt
  }

  /** Standalone overflow accounting for [[semanticDedup]]: the cells
    * whose population exceeds `maxCell` (whose rows the capped operator
    * returns undeduped), with sizes. Independent of the main plan — same
    * audit role as [[lshOverflowBuckets]] / [[NearDup.overflowBuckets]]. */
  def semanticOverflowCells(df: DataFrame, id: String, vecCol: String,
      nlist: Int = 16, maxCell: Int = NearDup.DefaultMaxBucket,
      codebook: Option[DataFrame] = None): DataFrame =
    assignCells(df, id, vecCol, nlist, codebook)
      .groupBy(col("cell")).agg(count(lit(1)).as("n_ids"))
      .filter(col("n_ids") > maxCell)

  /** Multi-table bucket ids: one (table, bucket) row per input row per
    * table — candidates are any pair colliding in ANY table. */
  private def withLshTables(df: DataFrame, vecCol: String,
      tables: Array[Array[Array[Double]]]): DataFrame =
    df.select(col("*"),
      posexplode(lshBucketsAll(col(vecCol), tables)).as(Seq("table", "bucket")))

  /** The production near-dup pattern at corpus scale: LSH bucket
    * collisions as the candidate generator, exact cosine ≥ tau as the
    * verifier. With enough tables the collision probability of a
    * true ≥-tau pair approaches 1 (miss rate (1-p_bit^bits)^tables), so
    * the output EQUALS the exact all-pairs result — which is exactly what
    * the q67 oracle checks — while only scoring candidate pairs instead
    * of n²/2. Short bucket ids (few bits) + many tables trade candidate
    * volume for recall. */
  def lshNearDupPairs(df: DataFrame, id: String, vecCol: String,
      tau: Double, tables: Array[Array[Array[Double]]],
      broadcastThresholdBytes: Long = 64L << 20,
      maxBucket: Int = NearDup.DefaultMaxBucket): DataFrame = {
    val spark = df.sparkSession
    val base = df.select(col(id).as("__id"), col(vecCol).as("__v"))
    // The signature table (id + L bucket ids, ~8·L bytes/row) is computed
    // ONCE and localCheckpointed: a self-join would otherwise re-evaluate
    // the L·bits·dim signature expression (and re-compile its generated
    // code) on every side. The checkpoint is linear in input rows — the
    // one relation this operator is allowed to materialize. Inputs
    // narrower than the cluster are widened to defaultParallelism first
    // so the bucket probe fans out; already-wide inputs keep their layout.
    val sig0 = base
      .withColumn("__bkts", lshBucketsAll(col("__v"), tables))
      .select(col("__id"), col("__bkts"))
      .repartition(spark.sparkContext.defaultParallelism)
    val sig = sig0.localCheckpoint()
    // Hot-bucket guard: one degenerate (table, bucket) key (all-zero
    // vectors, constant embeddings) would make the self-join below emit
    // O(n_bucket²) pairs in a single task. Oversized buckets are NULLED
    // OUT of the signature arrays — a null slot neither joins nor counts
    // as a collision — with the overflow reported on
    // [[NearDup.BucketCapMetric]] (never silently; AQE can erase the
    // in-plan observation when nothing was dropped — use
    // [[lshOverflowBuckets]] for standalone audit). Hot keys are bounded
    // by rows/maxBucket per table, so table → hot-bucket-set aggregates
    // to a tiny single-row map joined in by broadcast; nulling is then a
    // narrow per-row transform over the checkpointed signatures — no
    // re-shuffle of the signature relation.
    val pruned = if (maxBucket == Int.MaxValue) sig else {
      val n = col("__n")
      val hotMap = sig
        .select(posexplode(col("__bkts")).as(Seq("table", "bucket")))
        .groupBy(col("table"), col("bucket"))
        .agg(count(lit(1)).as("__n"))
        .observe(NearDup.nextBucketCapMetricName(),
          sum(when(n > maxBucket, 1L).otherwise(0L)).as("dropped_buckets"),
          sum(when(n > maxBucket, n).otherwise(0L)).as("dropped_rows"),
          coalesce(max(n), lit(0L)).as("largest_bucket"))
        .filter(n > maxBucket)
        .groupBy(col("table")).agg(collect_set(col("bucket")).as("__hb"))
        .agg(map_from_entries(collect_list(struct(col("table"), col("__hb"))))
          .as("__hot"))
      sig.crossJoin(broadcast(hotMap))
        .select(col("__id"), transform(col("__bkts"), (b, i) =>
          when(array_contains(element_at(col("__hot"), i), b),
            lit(null).cast("long")).otherwise(b)).as("__bkts"))
    }
    // Pair generation: equi-join on (table, bucket), then keep each pair
    // only at its FIRST shared live bucket ([[graft.functions.FirstCollision]])
    // — unique by construction, so no O(candidates × collision
    // multiplicity) dropDuplicates shuffle exists at all. Only ids +
    // signatures ride the join — never the vectors.
    val b = pruned.select(col("__id"), col("__bkts"),
        posexplode(col("__bkts")).as(Seq("table", "bucket")))
      .filter(col("bucket").isNotNull)
    val firstCollision = org.apache.spark.sql.graft.Bridge.column(
      graft.functions.FirstCollision(
        org.apache.spark.sql.graft.Bridge.expression(col("a.__bkts")),
        org.apache.spark.sql.graft.Bridge.expression(col("b.__bkts"))))
    val cand = b.as("a").join(b.as("b"),
        col("a.table") === col("b.table") && col("a.bucket") === col("b.bucket") &&
          col("a.__id") < col("b.__id"))
      .filter(firstCollision === col("a.table"))
      .select(col("a.__id").as("a_id"), col("b.__id").as("b_id"))
    // Vectors rejoin the already-unique candidates, so the rejoin is
    // proportional to distinct pairs, not collision multiplicity.
    // Size-aware: under the threshold the
    // vector relation broadcasts (both joins broadcast the IDENTICAL
    // relation so ReuseExchange ships one copy, not two); above it — a
    // real corpus won't fit any executor's broadcast budget — fall back
    // to shuffle-hash joins on id. The estimate comes from Catalyst's
    // plan statistics (parquet file stats × selectivity), so no extra
    // job runs to make the decision.
    val vecBytes = base.queryExecution.optimizedPlan.stats.sizeInBytes
    val smallEnough = vecBytes <= BigInt(broadcastThresholdBytes)
    val vecs = if (smallEnough) broadcast(base) else base.hint("shuffle_hash")
    cand.join(vecs.as("va"), col("a_id") === col("va.__id"))
      .join(vecs.as("vb"), col("b_id") === col("vb.__id"))
      .withColumn("cosine", cosine(col("va.__v"), col("vb.__v")))
      .filter(col("cosine") >= tau)
      .select(col("a_id"), col("b_id"), col("cosine"))
  }

  /** Per-subspace squared L2: the deterministic [[sqDist]] fold applied
    * to slice j (1-based slice at j·dsub+1, length dsub) of both
    * vectors — the distance every PQ assignment and distance table is
    * built from, so the oracle can replay sub-quantizer boundaries
    * bit-exactly. `j` may be a lambda variable (the subspace loop runs
    * inside one projection, no explode). */
  private def subSqDist(v: Column, w: Column, j: Column, dsub: Int): Column =
    aggregate(zip_with(
        slice(toDouble(v), j * dsub + 1, lit(dsub)),
        slice(toDouble(w), j * dsub + 1, lit(dsub)),
        (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

  /** PQ encoding, HOF formulation: for each of the m subspaces, the
    * POSITION (0-based, in cell-sorted codebook order) of the nearest
    * sub-centroid — ties break on (d2, position) exactly like every
    * other assignment. Positions, not cell ids, are the codes so ADC
    * distance tables index contiguously. Kept as the readable SPEC of
    * the encoding semantics (parity-tested); production encoding is
    * the fused native [[graft.functions.PqCodes]] — HOF lambdas
    * interpret m·ksub folds per row. */
  private[graft] def pqEncodeHof(df: DataFrame, vecCol: String, cb: DataFrame,
      m: Int, dsub: Int): DataFrame =
    df.crossJoin(cb)
      .withColumn("__codes",
        transform(sequence(lit(0), lit(m - 1)), j =>
          element_at(array_sort(transform(col("__cb"), (e, idx) =>
            struct(subSqDist(col(vecCol), e("v"), j, dsub).as("d2"),
              idx.as("code")))), 1)("code")))
      .drop("__cb")

  /** Driver-side flat codebook (cell-sorted, (cell, dim)-major) for
    * the native encoder — ksub rows, the same metadata-sized
    * bounded-collect class as ExactQuantile's thresholds. */
  private def collectCodebook(cbRows: DataFrame, ksub: Int,
      dim: Int): Array[Double] = {
    val rows = cbRows.orderBy(col("cell")).collect()
    require(rows.length == ksub,
      s"PQ codebook needs $ksub rows, got ${rows.length} — candidate set smaller than ksub")
    val flat = new Array[Double](ksub * dim)
    rows.zipWithIndex.foreach { case (r, c) =>
      val v = r.getSeq[Any](1)
      require(v.length == dim, s"codebook vector ${r.get(0)} has dim ${v.length}, want $dim")
      v.zipWithIndex.foreach {
        case (x: Float, i)  => flat(c * dim + i) = x.toDouble
        case (x: Double, i) => flat(c * dim + i) = x
        case (x, i) => throw new IllegalArgumentException(
          s"codebook element $i of ${r.get(0)}: expected float/double, got $x")
      }
    }
    flat
  }

  /** Production PQ encoding: the fused native expression
    * ([[graft.functions.PqCodes]], bit-identical to [[pqEncodeHof]],
    * parity-tested) — one typed loop per row, codegen'd, no broadcast
    * join on the candidate scan at all. */
  private[graft] def pqCodesNative(vec: Column, flat: Array[Double],
      m: Int, ksub: Int, dim: Int): Column =
    org.apache.spark.sql.graft.Bridge.column(
      graft.functions.PqCodes(
        org.apache.spark.sql.graft.Bridge.expression(vec),
        flat.toIndexedSeq, m, ksub, dim))

  /** Per-query ADC distance table: d2(sub_j(q), sub-centroid c) for all
    * (j, c), flattened j-major so entry (j, code) sits at
    * j·ksub+code+1 — m·ksub doubles per query row, broadcast with the
    * (small) query side. */
  private def pqQueryTable(q: DataFrame, cb: DataFrame, m: Int,
      dsub: Int): DataFrame =
    q.crossJoin(cb)
      .select(col("q_id"),
        flatten(transform(sequence(lit(0), lit(m - 1)), j =>
          transform(col("__cb"), e => subSqDist(col("__qv"), e("v"), j, dsub))))
          .as("__qtab"))

  /** Shared ADC tail of [[pqTopK]]/[[ivfPqTopK]]: sum the m distance-
    * table lookups (ascending j — the order the oracle replays) and
    * keep k per query ascending (approx_d2, c_id). Expects q_id, c_id,
    * __codes, __qtab. */
  private def adcTopK(pairs: DataFrame, m: Int, ksub: Int, k: Int): DataFrame = {
    val scored = pairs.filter(col("q_id") =!= col("c_id"))
      // native ADC fold ([[graft.functions.AdcSumNative]]), bit-identical
      // to the HOF spec `aggregate(zip_with(sequence(0, m-1), __codes,
      // (j, code) => element_at(__qtab, j*ksub+code+1)), 0.0, +)` —
      // this runs per (query, candidate) PAIR, the hottest row count
      // of the PQ family (r19)
      .withColumn("approx_d2",
        org.apache.spark.sql.graft.Bridge.column(graft.functions.AdcSumNative(
          org.apache.spark.sql.graft.Bridge.expression(col("__codes")),
          org.apache.spark.sql.graft.Bridge.expression(col("__qtab")),
          m, ksub)))
    Dedup.topKPerGroup(scored, Seq("q_id"),
        Seq(col("approx_d2"), col("c_id")), k, "rank")
      .select(col("q_id"), col("rank"), col("c_id"), col("approx_d2"))
  }

  /** Product quantization (PQ) approximate top-k — the compressed
    * linear scan of the IVFADC family (Jégou et al. 2011): each
    * candidate vector becomes m sub-quantizer codes (here m bytes vs
    * dim floats — a dim·4/m-fold payload cut, 32× at dim=64/m=8), and
    * a query scores a candidate by summing m table lookups
    * (asymmetric distance, no decompression). Sub-codebooks are the
    * ksub lowest-id candidate vectors sliced per subspace (the same
    * deterministic bootstrap as [[ivfTopKFixedCodebook]] — codebook
    * training is offline at corpus scale), so encoding, distance
    * tables, and scores are all relational algebra the oracle replays
    * exactly. Ranking ascends (approx_d2, c_id).
    *
    * Scale shape: codes are computed in ONE projection on the scan
    * (no shuffle, floats never leave it); the scored join ships only
    * (c_id, m codes) against a broadcast query table. At 100 TB the
    * candidate side of a PQ scan is the smallest representation of
    * the corpus any searcher here ships. */
  def pqTopK(queries: DataFrame, candidates: DataFrame,
      qId: String, cId: String, vecCol: String, k: Int,
      m: Int = 8, ksub: Int = 16, dim: Int = 64): DataFrame = {
    require(dim % m == 0, s"dim=$dim must be divisible by m=$m")
    val dsub = dim / m
    val c = cSide(candidates, cId, vecCol)
    val cbRows = c.orderBy(col("c_id")).limit(ksub)
      .select(col("c_id").as("cell"), col("__cv").as("v"))
    val flat = collectCodebook(cbRows, ksub, dim)
    val cc = c.select(col("c_id"),
      pqCodesNative(col("__cv"), flat, m, ksub, dim).as("__codes"))
    val qt = pqQueryTable(qSide(queries, qId, vecCol),
      broadcastCodebook(cbRows), m, dsub)
    adcTopK(cc.crossJoin(broadcast(qt)), m, ksub, k)
  }

  /** PQ scan + exact refine (FAISS's IndexRefineFlat pattern): the PQ
    * codes SELECT r candidates per query, the float vectors re-rank
    * only those r by exact cosine. This is how PQ is actually deployed
    * — compressed codes answer "which r of a billion", floats answer
    * "which k of r" — and the float fetch is a join proportional to
    * r·|queries|, never a corpus scan. On near-random fixtures raw PQ
    * ranking is noise-limited (all distances concentrate; see the
    * recall specs), so the refine factor r/k is the recall knob; with
    * r ≥ |candidates| this DEGRADES GRACEFULLY to exact brute force
    * (spec-pinned), so r trades cost for recall with a safe ceiling. */
  def pqTopKReranked(queries: DataFrame, candidates: DataFrame,
      qId: String, cId: String, vecCol: String, k: Int, r: Int,
      m: Int = 8, ksub: Int = 16, dim: Int = 64): DataFrame = {
    require(r >= k, s"refine set r=$r must be >= k=$k")
    val cand = pqTopK(queries, candidates, qId, cId, vecCol, k = r, m, ksub, dim)
      .select(col("q_id"), col("c_id"))
    rerankTopK(cand
      .join(cSide(candidates, cId, vecCol), Seq("c_id"))
      .join(broadcast(qSide(queries, qId, vecCol)), Seq("q_id")), k)
  }

  /** IVF-PQ: inverted-file probing + PQ asymmetric scoring — the full
    * IVFADC composition (cells bound how MANY candidates a query
    * touches, PQ codes bound how WIDE each one is; q59 is the IVF
    * half, [[pqTopK]] the ADC half, [[ivfTopKQuantizedFixedCodebook]]
    * the scalar-quantization sibling). Vectors are PQ-encoded raw (no
    * residual — FAISS's by_residual=false layout) so one global
    * distance table per query serves every probed cell and the whole
    * pipeline stays oracle-replayable. Fixed sampled codebooks for
    * both quantizers; candidate floats are dropped at assignment. */
  def ivfPqTopK(queries: DataFrame, candidates: DataFrame,
      qId: String, cId: String, vecCol: String, k: Int,
      nlist: Int = 16, nprobe: Int = 4,
      m: Int = 8, ksub: Int = 16, dim: Int = 64): DataFrame = {
    require(dim % m == 0, s"dim=$dim must be divisible by m=$m")
    val dsub = dim / m
    val c = cSide(candidates, cId, vecCol)
    // ONE TakeOrdered job feeds both quantizers (they sample the same
    // lowest-id rows; under the defaults they are identical) — the
    // checkpoint is max(nlist, ksub) rows, metadata-sized
    val sampled = c.orderBy(col("c_id")).limit(math.max(nlist, ksub))
      .select(col("c_id").as("cell"), col("__cv").as("v"))
      .localCheckpoint()
    // re-ordered before each limit: rows of a checkpointed DataFrame
    // carry no order contract, so a bare limit over it could pick a
    // different codebook subset than the lowest-id rows the oracle
    // assumes whenever nlist != ksub (ADVICE r7)
    val coarse = broadcastCodebook(sampled.orderBy(col("cell")).limit(nlist))
    val flat = collectCodebook(sampled.orderBy(col("cell")).limit(ksub), ksub, dim)
    val pqcb = broadcastCodebook(sampled.orderBy(col("cell")).limit(ksub))
    val cc = probeCells(c, "__cv", coarse, 1)
      .select(col("c_id"), col("cell"),
        pqCodesNative(col("__cv"), flat, m, ksub, dim).as("__codes"))
    val q = qSide(queries, qId, vecCol)
    val qp = probeCells(q, "__qv", coarse, nprobe).select(col("q_id"), col("cell"))
      .join(pqQueryTable(q, pqcb, m, dsub), Seq("q_id"))
    adcTopK(cc.join(broadcast(qp), Seq("cell")), m, ksub, k)
  }

  /** Codebook source for [[buildIvfPqIndex]] — where the persisted
    * index's quantizers come from. Whatever the source, the chosen
    * codebooks are PERSISTED with the index and every later operation
    * (append, delete, search) reads them back, so the choice is made
    * exactly once per index lifetime.
    *
    *  - [[Codebooks.Sampled]] — the `nlist`/`ksub` lowest-id candidate
    *    vectors (the deterministic bootstrap; DuckDB-replayable, the
    *    declared-query default).
    *  - [[Codebooks.Trained]] — KMeans on a bounded deterministic
    *    sample: coarse = Lloyd over full vectors; PQ = per-subspace
    *    Lloyd, sub-centroids concatenated back into full-dim rows so
    *    the persisted (kind, cell, v) schema and every encode/search
    *    path are unchanged. Removes the data-point-codebook quality
    *    floor AND the append-parity assumption (parity no longer needs
    *    the build slice to hold the lowest ids — the persisted
    *    codebooks ARE the quantizers, whatever slice trained them).
    *  - [[Codebooks.Provided]] — offline-trained centroids: (cell, v)
    *    DataFrames for coarse and PQ (the production shape at 100 TB,
    *    and how a rebuild replays an existing index's quantizers via
    *    [[readIndexCodebooks]]). */
  sealed trait Codebooks
  object Codebooks {
    case object Sampled extends Codebooks
    final case class Trained(sampleSize: Int = 16384, iters: Int = 10,
        seed: Long = 42L) extends Codebooks
    final case class Provided(coarse: DataFrame, pq: DataFrame) extends Codebooks
  }

  /** Deterministic driver-side Lloyd: fixed init (k points evenly
    * spaced over the caller's deterministically-ordered sample), fixed
    * iteration count, ties to the lowest centroid index, an emptied
    * cluster keeps its previous centroid. Pure function of (sample
    * order, k, iters) — no RNG, so two builds over the same corpus
    * train bit-identical codebooks regardless of partitioning. The
    * sample is bounded (metadata-sized collect, the ExactQuantile
    * thresholds class); at 100 TB the sample IS how codebooks are
    * trained — quantizer quality saturates far below corpus size. */
  /** Past this many centroids the Trained path switches from the
    * driver loop to [[lloydDistributedMulti]] — the driver's
    * O(sample·k·iters·dim) flops stop being "metadata-sized" around
    * k ≈ a few hundred; below it, per-iteration job overhead costs
    * more than the loop. The engines are BIT-IDENTICAL (spec-pinned),
    * so the switch is invisible in every persisted codebook. */
  private val DistributedLloydMinK = 256

  /** Distributed deterministic Lloyd over PARTITIONED bounded samples:
    * `parts` = (__p int, __h string, __id, __v array<double>) — one
    * independent k-means per distinct `__p` (the PQ sub-quantizers
    * train all m subspaces in ONE job per iteration; coarse is a
    * single part). Returns part → k centroids, collected (k·dim
    * doubles per part — metadata-sized; the SAMPLE never lands on the
    * driver, which is the point at large k).
    *
    * Bit-parity with [[lloyd]], by construction:
    *  - init: centroid j = the sample element at rank j·n/k in the
    *    global (__h, __id) order — exactly `sample(j*n/k)` over the
    *    driver path's deterministically-ordered collected sample;
    *  - assignment: same squared-distance loop, strict `<` keeps the
    *    LOWEST centroid index on ties;
    *  - accumulation: per-cluster LEFT FOLD over members sorted by
    *    sample rank — the same floating-point association order as the
    *    driver's sequential `sums(best) += v` sweep;
    *  - an emptied cluster keeps its previous centroid; division by
    *    the member count happens once per iteration, like the driver.
    * Pure function of (sample content, k, iters) — repartitioning the
    * input cannot move a bit (AnnIndexSpec pins both properties). */
  private[graft] def lloydDistributedMulti(parts: DataFrame, k: Int,
      iters: Int): Map[Int, Array[Array[Double]]] = {
    val spark = parts.sparkSession
    val wOrd = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__p")).orderBy(col("__h"), col("__id"))
    // the global sample rank is the ONE total order everything keys on;
    // a per-part window over a bounded sample is fine by contract
    val ranked = parts
      .withColumn("__rn", row_number().over(wOrd) - 1)
      .select(col("__p"), col("__rn"), col("__v"))
      .localCheckpoint()
    val ns: Map[Int, Long] = ranked.groupBy(col("__p"))
      .agg(count(lit(1)).as("__n")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    ns.foreach { case (p, n) => require(n >= k,
      s"KMeans needs >= $k sample vectors, got $n (part $p)") }
    // init: rank j*n/k per part, fetched in one filtered collect
    val initIdx: Map[Int, Set[Long]] = ns.map { case (p, n) =>
      p -> (0 until k).map(j => j.toLong * n / k).toSet
    }
    val wantInit = udf((p: Int, rn: Int) => initIdx(p).contains(rn.toLong))
    var cents: Map[Int, Array[Array[Double]]] = {
      val rows = ranked.filter(wantInit(col("__p"), col("__rn")))
        .select(col("__p"), col("__rn"), col("__v")).collect()
      val byPart = rows.groupBy(_.getInt(0))
      ns.map { case (p, n) =>
        val byRank = byPart(p)
          .map(r => r.getInt(1).toLong -> r.getSeq[Double](2).toArray).toMap
        p -> Array.tabulate(k)(j => byRank(j.toLong * n / k).clone())
      }
    }
    var it = 0
    while (it < iters) {
      val bc = spark.sparkContext.broadcast(cents)
      val assign = udf { (p: Int, v: Seq[Double]) =>
        val cs = bc.value(p)
        val dim = cs(0).length
        require(v.length == dim,
          s"training vector has dim ${v.length}, want $dim")
        var best = 0
        var bestD = Double.MaxValue
        var j = 0
        while (j < cs.length) {
          var d = 0.0
          var i = 0
          while (i < dim) { val t = v(i) - cs(j)(i); d += t * t; i += 1 }
          if (d < bestD) { bestD = d; best = j }
          j += 1
        }
        best
      }
      // per-(part, cluster) rank-sorted member list, summed by a LEFT
      // FOLD — the fixed association order that makes the result
      // independent of partitioning AND equal to the driver sweep
      val memberVs = transform(
        sort_array(collect_list(struct(col("__rn"), col("__v")))),
        s => s("__v"))
      val zeros = transform(element_at(col("__vs"), 1), _ => lit(0.0))
      val summed = ranked
        .withColumn("__c", assign(col("__p"), col("__v")))
        .groupBy(col("__p"), col("__c"))
        .agg(count(lit(1)).as("__n"), memberVs.as("__vs"))
        .select(col("__p"), col("__c"), col("__n"),
          aggregate(col("__vs"), zeros,
            (acc, x) => zip_with(acc, x, (a, b) => a + b)).as("__sum"))
        .collect()
      val next = cents.map { case (p, cs) => p -> cs.map(_.clone()) }
      summed.foreach { r =>
        val (p, cIdx, n) = (r.getInt(0), r.getInt(1), r.getLong(2))
        val s = r.getSeq[Double](3)
        val tgt = next(p)(cIdx)
        var i = 0
        while (i < tgt.length) { tgt(i) = s(i) / n; i += 1 }
      }
      bc.destroy()
      cents = next
      it += 1
    }
    // Dataset.unpersist only uncaches CacheManager entries — it never
    // touches a localCheckpoint's RDD blocks. Ckpt.release does.
    graft.util.Ckpt.release(ranked)
    cents
  }

  private[graft] def lloyd(sample: Array[Array[Double]], k: Int,
      iters: Int): Array[Array[Double]] = {
    require(sample.length >= k,
      s"KMeans needs >= $k sample vectors, got ${sample.length}")
    val dim = sample(0).length
    val centroids = Array.tabulate(k)(j => sample(j * sample.length / k).clone())
    var it = 0
    while (it < iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      sample.foreach { v =>
        var best = 0
        var bestD = Double.MaxValue
        var j = 0
        while (j < k) {
          var d = 0.0
          var i = 0
          while (i < dim) { val t = v(i) - centroids(j)(i); d += t * t; i += 1 }
          if (d < bestD) { bestD = d; best = j }
          j += 1
        }
        counts(best) += 1
        var i = 0
        while (i < dim) { sums(best)(i) += v(i); i += 1 }
      }
      var j = 0
      while (j < k) {
        if (counts(j) > 0) {
          var i = 0
          while (i < dim) { centroids(j)(i) = sums(j)(i) / counts(j); i += 1 }
        }
        j += 1
      }
      it += 1
    }
    centroids
  }

  /** Bounded deterministic training sample: the `sampleSize` rows with
    * the lowest md5(seed, id) — a pure function of (seed, ids), so the
    * sample (hence the trained codebooks) is stable under partitioning,
    * retries, and insertion order, and a TakeOrdered job (no full
    * sort). Returns vectors in hash order (the order [[lloyd]]'s init
    * indexes into). */
  private def trainingSample(c: DataFrame, dim: Int, sampleSize: Int,
      seed: Long): Array[Array[Double]] =
    c.select(col("__cv"),
        md5(concat_ws(":", lit(seed), col("c_id").cast("string"))).as("__h"),
        col("c_id"))
      .orderBy(col("__h"), col("c_id"))
      .limit(sampleSize)
      .select(col("__cv"))
      .collect()
      .map { r =>
        val v = r.getSeq[Any](0)
        require(v.length == dim,
          s"training vector has dim ${v.length}, want $dim")
        v.map {
          case x: Float => x.toDouble
          case x: Double => x
          case x => throw new IllegalArgumentException(
            s"expected float/double vector element, got $x")
        }.toArray
      }

  /** Resolve a [[Codebooks]] spec to (coarseRows, pqRows) — both
    * (cell: LONG, v) DataFrames, `v` double-typed for trained/provided
    * paths (float data-point rows stay float; [[collectCodebook]] and
    * [[broadcastCodebook]] accept either and all arithmetic casts to
    * double first). */
  private def resolveCodebooks(c: DataFrame, nlist: Int, m: Int, ksub: Int,
      dim: Int, spec: Codebooks): (DataFrame, DataFrame) = spec match {
    case Codebooks.Sampled =>
      // ONE takeOrdered job; the sample is ≤ max(nlist, ksub) rows —
      // metadata-sized by definition (it IS the codebook), so it lands
      // on the driver like every persisted codebook does anyway
      // (collectCodebook/broadcastCodebook re-collect it downstream).
      // r12: this replaces a localCheckpoint of the same takeOrdered
      // plus three re-reads of the checkpoint — one corpus pass and
      // several driver round-trips fewer per index build (q133 drift).
      val spark = c.sparkSession
      val proj = c.orderBy(col("c_id")).limit(math.max(nlist, ksub))
        .select(col("c_id").as("cell"), col("__cv").as("v"))
      val rows = proj.collect() // ascending c_id == ascending cell
      def local(n: Int): DataFrame = spark.createDataFrame(
        java.util.Arrays.asList(rows.take(n): _*), proj.schema)
      (local(nlist), local(ksub))
    case Codebooks.Trained(sampleSize, iters, seed) =>
      val spark = c.sparkSession
      import spark.implicits._
      val dsub = dim / m
      val (coarse, subs) =
        if (math.max(nlist, ksub) < DistributedLloydMinK) {
          // few centroids: the driver loop's flops are metadata-sized
          // and it skips all per-iteration job overhead
          val sample = trainingSample(c, dim, sampleSize, seed)
          (lloyd(sample, nlist, iters),
            Array.tabulate(m) { i =>
              lloyd(sample.map(v =>
                java.util.Arrays.copyOfRange(v, i * dsub, (i + 1) * dsub)),
                ksub, iters)
            })
        } else {
          // large nlist/ksub: the SAMPLE stays distributed and only
          // centroids (k·dim doubles) ever land on the driver — the
          // distributed engine is bit-identical to the loop above
          // (same init/ties/fold order; see lloydDistributedMulti), so
          // which one ran is invisible in the persisted codebooks
          val sampleDf = c.select(
              md5(concat_ws(":", lit(seed), col("c_id").cast("string")))
                .as("__h"),
              col("c_id").as("__id"), toDouble(col("__cv")).as("__v"))
            .orderBy(col("__h"), col("__id")).limit(sampleSize)
            .localCheckpoint()
          val coarseParts = sampleDf.select(lit(0).as("__p"),
            col("__h"), col("__id"), col("__v"))
          // all m subspaces train in the SAME per-iteration job
          val pqParts = sampleDf.select(col("__h"), col("__id"),
              explode(array((0 until m).map(i => struct(lit(i).as("__p"),
                slice(col("__v"), i * dsub + 1, dsub).as("__v"))): _*))
                .as("__s"))
            .select(col("__s.__p").as("__p"), col("__h"), col("__id"),
              col("__s.__v").as("__v"))
          val co = lloydDistributedMulti(coarseParts, nlist, iters)(0)
          val su = lloydDistributedMulti(pqParts, ksub, iters)
          graft.util.Ckpt.release(sampleDf) // centroids are driver-side
          (co, Array.tabulate(m)(su))
        }
      // per-subspace Lloyd, concatenated: full-dim row j holds subspace
      // i's centroid j at slice i — slicing recovers exactly what each
      // sub-quantizer trained, so the persisted schema stays (cell, v)
      val pq = Array.tabulate(ksub)(j => Array.tabulate(m)(i => subs(i)(j)).flatten)
      (coarse.zipWithIndex.map { case (v, j) => (j.toLong, v.toSeq) }
         .toSeq.toDF("cell", "v"),
        pq.zipWithIndex.map { case (v, j) => (j.toLong, v.toSeq) }
          .toSeq.toDF("cell", "v"))
    case Codebooks.Provided(coarse, pq) =>
      // validate row counts up front (both frames are metadata-sized
      // by contract, so the counts are bounded): a coarse frame with
      // != nlist rows would otherwise build and persist an index whose
      // meta nlist no longer matches the actual cell count — searches
      // would silently probe against phantom or missing cells.
      val nCoarse = coarse.limit(nlist + 1).count()
      require(nCoarse == nlist,
        s"Codebooks.Provided: coarse codebook has ${
          if (nCoarse > nlist) s"> $nlist" else s"$nCoarse"} rows, " +
          s"expected exactly nlist=$nlist")
      val nPq = pq.limit(ksub + 1).count()
      require(nPq == ksub,
        s"Codebooks.Provided: pq codebook has ${
          if (nPq > ksub) s"> $ksub" else s"$nPq"} rows, " +
          s"expected exactly ksub=$ksub")
      (coarse.select(col("cell").cast("long").as("cell"), toDouble(col("v")).as("v")),
        pq.select(col("cell").cast("long").as("cell"), toDouble(col("v")).as("v")))
  }

  /** The persisted quantizers of an existing [[buildIvfPqIndex]] root as
    * (coarse, pq) — the [[Codebooks.Provided]] input that makes a
    * one-shot rebuild replay an index's exact quantizers (the
    * append/delete parity specs' independent arbiter). */
  def readIndexCodebooks(spark: org.apache.spark.sql.SparkSession,
      indexRoot: String): (DataFrame, DataFrame) = {
    val cb = graft.sources.CommitLog(spark, s"$indexRoot/codebook").read()
      .localCheckpoint()
    (cb.filter(col("kind") === "coarse").select(col("cell"), col("v")),
      cb.filter(col("kind") === "pq").select(col("cell"), col("v")))
  }

  /** IVF-PQ with RESIDUAL encoding — FAISS's default `by_residual=true`
    * layout, completing the IVFADC family ([[ivfPqTopK]] is the
    * no-residual sibling): each vector's PQ codes quantize
    * `v − centroid(cell(v))` instead of `v` itself. Residual magnitudes
    * are a cell-diameter, far smaller than vector magnitudes, so the
    * same ksub sub-centroids spend their resolution on the part of the
    * vector the coarse quantizer did NOT explain — the standard recall
    * win on clustered corpora. The price is a PER-PROBED-CELL query
    * distance table (the query's residual differs per cell): the
    * broadcast query side grows nprobe-fold, bounded by
    * nprobe · m · ksub doubles per query — still metadata-sized.
    *
    * Deterministic bootstrap codebooks as everywhere in this family:
    * coarse = nlist lowest-id vectors; PQ sub-codebooks = slices of
    * the ksub lowest-id RESIDUALS (residuals are what this quantizer
    * sees, so it samples from that distribution). Every step —
    * assignment, residual subtraction (cast-to-double, elementwise),
    * encoding, per-cell tables, ADC — is deterministic relational
    * algebra the oracle replays exactly (q161). Candidate floats are
    * dropped after encoding, same as [[ivfPqTopK]]. */
  def ivfPqTopKResidual(queries: DataFrame, candidates: DataFrame,
      qId: String, cId: String, vecCol: String, k: Int,
      nlist: Int = 16, nprobe: Int = 4,
      m: Int = 8, ksub: Int = 16, dim: Int = 64): DataFrame = {
    require(dim % m == 0, s"dim=$dim must be divisible by m=$m")
    val dsub = dim / m
    val c = cSide(candidates, cId, vecCol)
    val coarseRows = c.orderBy(col("c_id")).limit(nlist)
      .select(col("c_id").as("cell"), col("__cv").as("v"))
      .localCheckpoint() // consumed by broadcastCodebook AND the two
                         // centroid joins — three separate subtrees
    val coarse = broadcastCodebook(coarseRows)
    val resid = zip_with(col("__v0"), col("__ctr"),
      (x, y) => x.cast("double") - y.cast("double"))
    // candidate residuals: assign, then one broadcast join attaches the
    // winning centroid vector (nlist rows — always broadcast)
    val cRes = probeCells(c, "__cv", coarse, 1)
      .join(broadcast(coarseRows.select(col("cell"), col("v").as("__ctr"))), "cell")
      .withColumnRenamed("__cv", "__v0")
      .withColumn("__rv", resid)
      .select(col("c_id"), col("cell"), col("__rv"))
    // PQ codebook = the ksub lowest-id residuals (driver-collected,
    // metadata-sized, the collectCodebook class of bounded collect)
    val pqRows = cRes.orderBy(col("c_id")).limit(ksub)
      .select(col("c_id").as("cell"), col("__rv").as("v"))
      .localCheckpoint()
    val flat = collectCodebook(pqRows, ksub, dim)
    val pqcb = broadcastCodebook(pqRows)
    val cc = cRes.select(col("c_id"), col("cell"),
      pqCodesNative(col("__rv"), flat, m, ksub, dim).as("__codes"))
    // per-(query, probed-cell) residual → per-cell ADC table
    val qp = probeCells(qSide(queries, qId, vecCol), "__qv", coarse, nprobe)
      .join(broadcast(coarseRows.select(col("cell"), col("v").as("__ctr"))), "cell")
      .withColumnRenamed("__qv", "__v0")
      .withColumn("__qrv", resid)
      .crossJoin(pqcb)
      .select(col("q_id"), col("cell"),
        flatten(transform(sequence(lit(0), lit(m - 1)), j =>
          transform(col("__cb"), e => subSqDist(col("__qrv"), e("v"), j, dsub))))
          .as("__qtab"))
    adcTopK(cc.join(broadcast(qp), Seq("cell")), m, ksub, k)
  }

  /** PERSISTED IVF-PQ index — the build-once/query-many form of
    * [[ivfPqTopK]] (FAISS's deployment shape, and the reference's: it
    * STORES its lookup structure in a table with a seekable sort key,
    * /root/reference/index.js:333-337, rather than rebuilding it per
    * read). Three [[graft.sources.CommitLog]] tables under `indexRoot`:
    * {{{
    *   postings/  (c_id, cell, codes)  — partition-tagged BY CELL, so a
    *                                     search's inverted-list seek is
    *                                     manifest-level file pruning
    *   codebook/  (kind, cell, v)      — coarse + pq sub-codebooks
    *   meta/      (nlist, m, ksub, dim)
    * }}}
    * The corpus floats are gone after the build: postings carry m
    * int codes per vector (the smallest representation any searcher
    * here ships), and [[searchIvfPqIndex]] touches ONLY the probed
    * cells' files. Quantizers come from the [[Codebooks]] spec — the
    * default lowest-id sample matches [[ivfPqTopK]] exactly, so a
    * search over the persisted index is bit-identical to the
    * on-the-fly pipeline (q133 hash-matches q117's oracle);
    * [[Codebooks.Trained]]/[[Codebooks.Provided]] swap in KMeans or
    * offline centroids with every downstream path unchanged (they all
    * read the PERSISTED codebooks). Codebook vectors persist as doubles — float →
    * double widening is exact, and both pipelines cast to double
    * before any arithmetic. Re-building into the same root commits a
    * new version (readers on the old one are unaffected; vacuum when
    * idle). */
  def buildIvfPqIndex(candidates: DataFrame, cId: String, vecCol: String,
      indexRoot: String, nlist: Int = 16, m: Int = 8, ksub: Int = 16,
      dim: Int = 64, codebooks: Codebooks = Codebooks.Sampled): Unit = {
    import graft.sources.CommitLog
    require(dim % m == 0, s"dim=$dim must be divisible by m=$m")
    val spark = candidates.sparkSession
    val c = cSide(candidates, cId, vecCol)
    val (coarseRows, pqRows) = resolveCodebooks(c, nlist, m, ksub, dim, codebooks)
    val flat = collectCodebook(pqRows, ksub, dim)
    val postings = probeCells(c, "__cv", broadcastCodebook(coarseRows), 1)
      .select(col("c_id"), col("cell"),
        pqCodesNative(col("__cv"), flat, m, ksub, dim).as("codes"))
    CommitLog(spark, s"$indexRoot/postings")
      .replaceAllPartitioned(postings, "cell")
    CommitLog(spark, s"$indexRoot/codebook").replaceAll(
      coarseRows.select(lit("coarse").as("kind"), col("cell"),
          toDouble(col("v")).as("v"))
        .unionByName(pqRows.select(lit("pq").as("kind"), col("cell"),
          toDouble(col("v")).as("v"))))
    CommitLog(spark, s"$indexRoot/meta").replaceAll(
      spark.range(1).select(lit(nlist).as("nlist"), lit(m).as("m"),
        lit(ksub).as("ksub"), lit(dim).as("dim")))
  }

  /** Incrementally index NEW vectors into an existing
    * [[buildIvfPqIndex]] root: the batch is assigned and PQ-encoded
    * with the PERSISTED codebooks (an index's quantizers are fixed at
    * build time — re-training them would silently invalidate every
    * already-stored code) and appended as cell-tagged postings, one
    * commit-log version. Cost ∝ batch, never corpus: the existing
    * postings are not read, the corpus is not re-encoded. Incremental
    * ≡ one-shot parity: an append always equals a rebuild that replays
    * the SAME persisted quantizers ([[readIndexCodebooks]] →
    * [[Codebooks.Provided]]; spec-pinned on a shuffled build slice).
    * Under the Sampled default that collapses to the classic special
    * case — a batch ⊆ the build corpus's id range is bit-identical to
    * a plain rebuild (q136's oracle is q117's verbatim). */
  def appendToIvfPqIndex(spark: org.apache.spark.sql.SparkSession,
      indexRoot: String, batch: DataFrame, cId: String, vecCol: String): Unit = {
    import graft.sources.CommitLog
    CommitLog(spark, s"$indexRoot/postings").appendPartitioned(
      encodePostings(spark, indexRoot, batch, cId, vecCol), "cell")
  }

  /** Encode `batch` into the postings shape (`c_id`, `cell`, `codes`)
    * with the PERSISTED codebooks at `indexRoot` — the shared
    * assign+PQ-encode step behind [[appendToIvfPqIndex]] and
    * [[syncIvfPqIndex]]. Lazy: no job runs until the result is
    * written. */
  private def encodePostings(spark: org.apache.spark.sql.SparkSession,
      indexRoot: String, batch: DataFrame, cId: String,
      vecCol: String): DataFrame = {
    import graft.sources.CommitLog
    val meta = CommitLog(spark, s"$indexRoot/meta").read()
      .select(col("nlist"), col("m"), col("ksub"), col("dim")).head()
    val (m, ksub, dim) = (meta.getInt(1), meta.getInt(2), meta.getInt(3))
    val cb = CommitLog(spark, s"$indexRoot/codebook").read().localCheckpoint()
    val coarse = broadcastCodebook(
      cb.filter(col("kind") === "coarse").select(col("cell"), col("v")))
    val flat = collectCodebook(
      cb.filter(col("kind") === "pq").select(col("cell"), col("v")), ksub, dim)
    val c = cSide(batch, cId, vecCol)
    probeCells(c, "__cv", coarse, 1)
      .select(col("c_id"), col("cell"),
        pqCodesNative(col("__cv"), flat, m, ksub, dim).as("codes"))
  }

  /** ATOMIC index maintenance (r12, VERDICT r11 #3): remove the
    * postings of every id in `touchedIds` AND insert the fresh
    * encodings of `liveRows` in ONE postings-table commit
    * ([[graft.sources.CommitLog.deleteAndAppend]]) — a searcher at any
    * version sees the index before or after the swap, never the
    * between state where a re-encoded id's postings are missing (the
    * delete-then-append pair's one-trigger window). Same cost shape as
    * the pair it fuses: the id envelope prunes candidate postings
    * files, only files holding a touched id rewrite, the new postings
    * ride the same cell-tagged write job, and codebooks stay fixed.
    * Returns the postings table's new version. */
  def syncIvfPqIndex(spark: org.apache.spark.sql.SparkSession,
      indexRoot: String, touchedIds: DataFrame, liveRows: DataFrame,
      cId: String, vecCol: String): Long = {
    import graft.sources.CommitLog
    val ids = touchedIds.select(col(cId).as("c_id")).distinct()
    CommitLog(spark, s"$indexRoot/postings").deleteAndAppend(
      ids, Seq("c_id"),
      encodePostings(spark, indexRoot, liveRows, cId, vecCol),
      partCol = Some("cell"))
  }

  /** Propagate base-corpus DELETEs into a persisted [[buildIvfPqIndex]]
    * root: remove the postings of `deletedIds` (any DataFrame carrying
    * the deleted ids in column `cId` — e.g. the `delete` rows of the
    * base table's [[graft.sources.CommitLog.readChanges]] feed) in ONE
    * commit, so searches never surface vectors that no longer exist.
    * Implemented as a [[graft.sources.CommitLog.merge]] with a single
    * WHEN MATCHED DELETE clause over the cell-tagged postings table:
    * the batch's id envelope prunes candidate files against manifest
    * stats, only files actually holding a deleted id rewrite (cells
    * the batch never touched are not even read), and partition tags
    * survive, so the searcher's probed-cells-only pruning is intact.
    * Codebooks are untouched — an index's quantizers are fixed at
    * build time, and removing postings never invalidates the codes of
    * the survivors, so a post-delete search is bit-identical to a
    * fresh rebuild over the surviving corpus (spec-pinned, provided
    * the rebuild would sample the same codebook rows). Cost ∝ touched
    * cells, never corpus. Returns the postings table's new version
    * (or the current one when no posting matched). */
  def deleteFromIvfPqIndex(spark: org.apache.spark.sql.SparkSession,
      indexRoot: String, deletedIds: DataFrame, cId: String): Long = {
    import graft.sources.CommitLog
    val ids = deletedIds.select(col(cId).as("c_id")).distinct()
    CommitLog(spark, s"$indexRoot/postings").merge(ids, Seq("c_id"),
      Seq(CommitLog.WhenMatchedDelete()), partCol = Some("cell"))
  }

  /** Query a [[buildIvfPqIndex]] index: probe `nprobe` cells per query
    * against the persisted coarse codebook, read ONLY those cells'
    * postings files (manifest-level pruning — the inverted-list seek),
    * and ADC-score the stored codes. The corpus is never re-read or
    * re-encoded; the only non-index input is the query vectors. The
    * probed-cell collect is bounded by nlist (metadata-sized). */
  def searchIvfPqIndex(spark: org.apache.spark.sql.SparkSession,
      indexRoot: String, queries: DataFrame, qId: String, vecCol: String,
      k: Int, nprobe: Int = 4): DataFrame = {
    import graft.sources.CommitLog
    val meta = CommitLog(spark, s"$indexRoot/meta").read()
      .select(col("nlist"), col("m"), col("ksub"), col("dim")).head()
    val (m, ksub, dim) = (meta.getInt(1), meta.getInt(2), meta.getInt(3))
    val cb = CommitLog(spark, s"$indexRoot/codebook").read().localCheckpoint()
    val coarse = broadcastCodebook(
      cb.filter(col("kind") === "coarse").select(col("cell"), col("v")))
    val pqcb = broadcastCodebook(
      cb.filter(col("kind") === "pq").select(col("cell"), col("v")))
    val q = qSide(queries, qId, vecCol)
    val qp0 = probeCells(q, "__qv", coarse, nprobe)
      .select(col("q_id"), col("cell")).localCheckpoint()
    val probed = qp0.select(col("cell").cast("string")).distinct()
      .collect().map(_.getString(0)).toSeq
    val postings = CommitLog(spark, s"$indexRoot/postings")
      .readPartitions(probed)
      .select(col("c_id"), col("cell"), col("codes").as("__codes"))
    val qp = qp0.join(pqQueryTable(q, pqcb, m, dim / m), Seq("q_id"))
    adcTopK(postings.join(broadcast(qp), Seq("cell")), m, ksub, k)
  }

  /** Standalone overflow accounting for [[lshNearDupPairs]]: the
    * (table, bucket) keys whose population exceeds `maxBucket`, with
    * sizes. Independent of the main query plan, so it survives the AQE
    * empty-relation collapse that can erase the in-plan
    * [[NearDup.BucketCapMetric]] observation when the capped result is
    * empty — count, log, or sink it next to the dedup output. */
  def lshOverflowBuckets(df: DataFrame, id: String, vecCol: String,
      tables: Array[Array[Array[Double]]],
      maxBucket: Int = NearDup.DefaultMaxBucket): DataFrame =
    withLshTables(df.select(col(id).as("__id"), col(vecCol).as("__v")), "__v", tables)
      .groupBy(col("table"), col("bucket"))
      .agg(count(lit(1)).as("n_ids"))
      .filter(col("n_ids") > maxBucket)

  /** Approximate top-k via multi-table LSH: candidates = bucket collisions
    * in any of the L tables, then exact cosine + window top-k. Candidate
    * volume per query shrinks ~2^bits-fold per table; recall compounds
    * across tables. */
  def lshTopK(queries: DataFrame, candidates: DataFrame,
      qId: String, cId: String, vecCol: String, k: Int,
      tables: Array[Array[Array[Double]]]): DataFrame = {
    val q = withLshTables(qSide(queries, qId, vecCol), "__qv", tables)
    val c = withLshTables(cSide(candidates, cId, vecCol), "__cv", tables)
    val pairs = c.join(broadcast(q), Seq("table", "bucket"))
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"), col("__qv"), col("__cv"),
        col("__qn"), col("__cn"))
      .dropDuplicates("q_id", "c_id")
    rerankTopK(pairs, k)
  }
}
