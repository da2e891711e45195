package graft

import org.apache.spark.sql.functions._
import graft.operators.{BlockDedup, LangModel, Quantize}

/** Unit coverage for the round-6 pipeline operators (q98-q100) beyond
  * their DuckDB oracles. */
class CorpusOps2Spec extends SparkSpecBase {
  import spark.implicits._

  // ---- LangModel.bigramSurprisal ----

  test("bigram surprisal: hand-computed MLE NLL on a 3-doc corpus") {
    // corpus: "a b", "a b", "a c" → c(a·)=3, c(a b)=2, c(a c)=1
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c")).toDF("id", "text")
    val got = LangModel.bigramSurprisal(docs, "id", "text")
      .as[(Long, Long, Long, Option[Double])].collect().sortBy(_._1)
    val nllAB = math.log(3.0) - math.log(2.0) // -ln P(b|a) = ln c(a·) - ln c(ab)
    val nllAC = math.log(3.0) - math.log(1.0)
    assert(got(0) === ((1L, 1L, 1L, Some(BigDecimal(nllAB)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))))
    assert(got(2)._4.get === BigDecimal(nllAC)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("bigram surprisal: docs with < 2 tokens get n_bi=0 and NULL nll") {
    val docs = Seq((1L, "solo"), (2L, "two tokens here")).toDF("id", "text")
    val got = LangModel.bigramSurprisal(docs, "id", "text")
      .as[(Long, Long, Long, Option[Double])].collect().sortBy(_._1)
    assert(got(0) === ((1L, 0L, 0L, None)))
    assert(got(1)._2 === 2L && got(1)._4.isDefined)
  }

  test("bigram surprisal: self-trained corpus NLL is non-negative everywhere") {
    val docs = graft.sources.Tables(spark, sfDir, "documents").limit(100)
    val bad = LangModel.bigramSurprisal(docs, "doc_id", "text")
      .filter($"avg_nll" < -1e-9).count()
    assert(bad === 0L)
  }

  // ---- BlockDedup ----

  test("blockStats: duplicated block across docs is kept only at first (id,pos)") {
    val ten = (1 to 10).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, ten + " " + "x1 x2 x3"),   // block0 = ten (first), block1 = partial
      (2L, ten),                      // block0 duplicates doc1's block0
      (3L, "y1 y2 y3")                // unique partial block
    ).toDF("id", "text")
    val got = BlockDedup.blockStats(docs, "id", "text", blockTokens = 10)
      .as[(Long, Long, Long, Option[Double])].collect().sortBy(_._1)
    assert(got(0) === ((1L, 2L, 2L, Some(0.0))))
    assert(got(1) === ((2L, 1L, 0L, Some(1.0))))
    assert(got(2) === ((3L, 1L, 1L, Some(0.0))))
  }

  test("dropDuplicateBlocks rewrites dup blocks away; fully-dup doc becomes empty") {
    val ten = (1 to 10).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, ten + " tail one"),
      (2L, ten),                 // every block a dup → empty
      (3L, "fresh text")
    ).toDF("id", "text")
    val got = BlockDedup.dropDuplicateBlocks(docs, "id", "text", blockTokens = 10)
      .as[(Long, String)].collect().sortBy(_._1)
    assert(got(0)._2 === ten + " tail one")
    assert(got(1)._2 === "")
    assert(got(2)._2 === "fresh text")
  }

  test("dropDuplicateBlocks preserves case and spacing of non-rewritten docs") {
    val ten = (1 to 10).map(i => s"W$i").mkString(" ") // mixed-case tokens
    val docs = Seq(
      (1L, "The QUICK  Brown Fox"),            // unique → verbatim (incl. double space)
      (2L, ten + " Tail ONE"),                 // all blocks kept → verbatim
      (3L, ten.toLowerCase + " Extra Words")   // block0 dups doc2's case-blind
    ).toDF("id", "text")
    val got = BlockDedup.dropDuplicateBlocks(docs, "id", "text", blockTokens = 10)
      .as[(Long, String)].collect().sortBy(_._1)
    assert(got(0)._2 === "The QUICK  Brown Fox")
    assert(got(1)._2 === ten + " Tail ONE")
    // rewritten doc keeps the ORIGINAL case of its surviving tokens
    assert(got(2)._2 === "Extra Words")
  }

  test("blockStats totals: sum(n_kept) == count of distinct block hashes") {
    val docs = graft.sources.Tables(spark, sfDir, "documents").limit(200)
    val stats = BlockDedup.blockStats(docs, "doc_id", "text", blockTokens = 10)
    val kept = stats.agg(sum($"n_kept")).as[Long].head()
    val distinctBlocks = docs
      .select(explode(split(lower($"text"), " ")).as("w")) // token count sanity only
      .count()
    assert(kept > 0 && kept <= distinctBlocks)
    // exact invariant: every distinct hash elects exactly one winner
    val nDistinct = {
      val ws = split(lower($"text"), " ")
      docs.select($"doc_id", posexplode(
          transform(sequence(lit(0),
            greatest(ceil(size(ws) / lit(10.0)).cast("int") - 1, lit(0))),
            p => concat_ws(" ", slice(ws, p * 10 + 1, lit(10))))).as(Seq("p", "b")))
        .select(graft.operators.Contamination.gramHash($"b")).distinct().count()
    }
    assert(kept === nDistinct)
  }

  // ---- FuzzyJoin ----

  test("char-histogram L1 natives: exact counts, unicode, and the 2·ED soundness bound") {
    import org.apache.spark.sql.graft.Bridge
    import graft.functions.{CharHistNative, HistL1Native}
    def hist(c: org.apache.spark.sql.Column) =
      Bridge.column(CharHistNative(Bridge.expression(c)))
    def l1(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      Bridge.column(HistL1Native(Bridge.expression(a), Bridge.expression(b)))
    // exact bucket counts: 'a'=97 → bucket 33, surrogate pair counts ONCE
    val h = Seq(("aab😀", "aba"))
      .toDF("x", "y")
      .select(hist($"x").as("hx"), hist($"y").as("hy"),
        l1(hist($"x"), hist($"y")).as("d"))
      .head()
    val hx = h.getSeq[Int](0)
    assert(hx.sum === 4) // 3 ascii chars + ONE code point for the emoji
    assert(hx('a' & 63) === 2 && hx('b' & 63) === 1)
    assert(h.getInt(2) === 1) // histograms differ only by the emoji bucket
    // null propagates like the HOF spec
    val n = Seq((Option.empty[String], Option("x"))).toDF("x", "y")
      .select(hist($"x").isNull, l1(hist($"x"), hist($"y")).isNull)
      .as[(Boolean, Boolean)].head()
    assert(n === ((true, true)))
    // soundness bound L1 <= 2·ED on random small-alphabet strings — the
    // invariant that makes the pre-verify filter drop-safe
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val rnd = new scala.util.Random(7)
    val words = Seq.fill(40)(
      (1 to rnd.nextInt(12)).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString)
    val pairsDf = (for (a <- words; b <- words) yield (a, b))
      .toDF("a", "b")
      .select($"a", $"b", l1(hist($"a"), hist($"b")).as("d")).collect()
    pairsDf.foreach { r =>
      assert(r.getInt(2) <= 2 * lev(r.getString(0), r.getString(1)),
        s"L1 bound violated for (${r.getString(0)}, ${r.getString(1)})")
    }
  }

  test("fuzzy join d=1: substitution, insertion, deletion pairs; no false dismissals") {
    val words = Seq((1L, "cat"), (2L, "cart"), (3L, "hat"), (4L, "dog"),
      (5L, "at"), (6L, "cat")).toDF("id", "s")
    val got = graft.operators.FuzzyJoin.selfPairs(words, "id", "s", maxDist = 1)
      .as[(Long, Long, Int)].collect().toSet
    // brute force reference
    val rows = Seq((1L, "cat"), (2L, "cart"), (3L, "hat"), (4L, "dog"),
      (5L, "at"), (6L, "cat"))
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val want = (for {
      (ia, sa) <- rows; (ib, sb) <- rows if ia < ib
      dd = lev(sa, sb) if dd <= 1
    } yield (ia, ib, dd)).toSet
    assert(got === want)
    assert(got.contains((1L, 6L, 0)))  // exact duplicates surface at dist 0
  }

  test("fuzzy join d=2 equals brute force on 300 customer names") {
    val cust = graft.sources.Tables(spark, sfDir, "customer")
      .select($"c_custkey", $"c_name").limit(300)
    val got = graft.operators.FuzzyJoin.selfPairs(cust, "c_custkey", "c_name", maxDist = 2)
      .as[(Long, Long, Int)].collect().toSet
    val a = cust.select($"c_custkey".as("a_id"), $"c_name".as("sa"))
    val b = cust.select($"c_custkey".as("b_id"), $"c_name".as("sb"))
    val want = a.join(b, $"a_id" < $"b_id")
      .select($"a_id", $"b_id", levenshtein($"sa", $"sb").as("d"))
      .filter($"d" <= 2).as[(Long, Long, Int)].collect().toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("fuzzy two-table join equals brute force (entity linking shape)") {
    val cust = graft.sources.Tables(spark, sfDir, "customer")
      .select($"c_custkey", $"c_name")
    val left = cust.filter($"c_custkey" % 2 === 0).limit(150)
    val right = cust.filter($"c_custkey" % 2 === 1).limit(150)
    val got = graft.operators.FuzzyJoin.pairs(left, right, "c_custkey", "c_name", maxDist = 1)
      .as[(Long, Long, Int)].collect().toSet
    val want = left.select($"c_custkey".as("l_id"), $"c_name".as("sl"))
      .crossJoin(right.select($"c_custkey".as("r_id"), $"c_name".as("sr")))
      .select($"l_id", $"r_id", levenshtein($"sl", $"sr").as("d"))
      .filter($"d" <= 1).as[(Long, Long, Int)].collect().toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("q-gram fuzzy join d=8 on documents equals brute force (deletion policy can't reach this d)") {
    val docs = graft.sources.Tables(spark, sfDir, "documents")
      .select($"doc_id", $"text")
    val got = graft.operators.FuzzyJoin.selfPairsQGram(
        docs, "doc_id", "text", maxDist = 8)
      .as[(Long, Long, Int)].collect().toSet
    val a = docs.select($"doc_id".as("a_id"), $"text".as("sa"))
    val b = docs.select($"doc_id".as("b_id"), $"text".as("sb"))
    val want = a.join(b, $"a_id" < $"b_id")
      // the length filter is implied by the metric — only a cost cut
      .filter(abs(length($"sa") - length($"sb")) <= 8)
      .select($"a_id", $"b_id", levenshtein($"sa", $"sb").as("d"))
      .filter($"d" <= 8).as[(Long, Long, Int)].collect().toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("two-table q-gram fuzzy join d=8 equals cross-join brute force") {
    val docs = graft.sources.Tables(spark, sfDir, "documents")
      .select($"doc_id", $"text")
    val left = docs.filter($"doc_id" % 2 === 0)
    val right = docs.filter($"doc_id" % 2 === 1)
    val got = graft.operators.FuzzyJoin.pairsQGram(
        left, right, "doc_id", "text", maxDist = 8)
      .as[(Long, Long, Int)].collect().toSet
    val want = left.select($"doc_id".as("l_id"), $"text".as("sl"))
      .crossJoin(right.select($"doc_id".as("r_id"), $"text".as("sr")))
      .filter(abs(length($"sl") - length($"sr")) <= 8)
      .select($"l_id", $"r_id", levenshtein($"sl", $"sr").as("d"))
      .filter($"d" <= 8).as[(Long, Long, Int)].collect().toSet
    assert(got === want)
    assert(got.nonEmpty)
    // the cap's audit: empty at the default cap (nothing was dropped —
    // which is WHY the equality above holds), and non-empty at a
    // degenerate cap, reporting the per-side buckets the join would drop
    assert(graft.operators.FuzzyJoin.overflowQGramsTwoTable(
      left, right, "doc_id", "text", maxDist = 8).isEmpty)
    val overflow = graft.operators.FuzzyJoin.overflowQGramsTwoTable(
        left, right, "doc_id", "text", maxDist = 8, maxBucket = 1)
      .as[(Int, Long, Long, Long)].collect()
    assert(overflow.nonEmpty && overflow.forall(_._4 > 1))
    assert(overflow.map(_._1).toSet.subsetOf(Set(0, 1)))
  }

  test("entity resolution: fuzzy pairs + connected components pick canonical ids") {
    // typo cluster {color, colour, colors}, {grey, gray}, singleton {red}
    val names = Seq((1L, "color"), (2L, "colour"), (3L, "colors"),
      (4L, "grey"), (5L, "gray"), (6L, "red")).toDF("id", "s")
    val pairs = graft.operators.FuzzyJoin.selfPairs(names, "id", "s", maxDist = 1)
    val clusters = graft.operators.Components.clusterDedup(
      names.select($"id"), "id", pairs, "a_id", "b_id")
    val got = clusters.select($"id", $"cluster_id", $"is_canonical")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    assert(got.map(_._2).toSeq === Seq(1L, 1L, 1L, 4L, 4L, 6L))
    assert(got.filter(_._3).map(_._1).toSeq === Seq(1L, 4L, 6L))
  }

  test("residual IVF-PQ: same cells as the no-residual form; recall does not collapse") {
    import graft.operators.Similarity
    val emb = graft.sources.Tables(spark, sfDir, "embeddings")
    val qs = emb.filter($"vec_id" < 40)
    val truth = Similarity.bruteForceTopK(qs, emb, "vec_id", "vec_id",
        "embedding", k = 3)
      .select($"q_id", $"c_id").as[(Long, Long)].collect().toSet
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select($"q_id", $"c_id").as[(Long, Long)].collect().toSet
      got.intersect(truth).size.toDouble / truth.size
    }
    val res = Similarity.ivfPqTopKResidual(qs, emb, "vec_id", "vec_id",
      "embedding", k = 3, nlist = 16, nprobe = 4)
    val plain = Similarity.ivfPqTopK(qs, emb, "vec_id", "vec_id",
      "embedding", k = 3, nlist = 16, nprobe = 4)
    val (rRes, rPlain) = (recall(res), recall(plain))
    info(s"recall@3 nprobe=4: residual=$rRes plain=$rPlain")
    // same coarse quantizer → the candidate pools are identical; on a
    // near-random fixture both ADC variants are noise-limited and
    // residual can even trail slightly (nothing concentrates without
    // cluster structure), so the pin is non-collapse, not superiority
    // — generous tolerance so a driver testdata regen can't flake it
    assert(rRes >= rPlain - 0.10, s"residual recall $rRes collapsed vs $rPlain")
    assert(rRes > 0.02, s"residual recall $rRes not above chance")
  }

  test("IVF-SQ matches float IVF's candidates cell-for-cell; scores within 2%") {
    import graft.operators.Similarity
    val emb = graft.sources.Tables(spark, sfDir, "embeddings")
    val qs = emb.filter($"vec_id" % 25 === 0)
    val float = Similarity.ivfTopKFixedCodebook(qs, emb, "vec_id", "vec_id",
        "embedding", k = 5, nlist = 16, nprobe = 4)
      .select($"q_id", $"c_id", $"cosine").as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val sq = Similarity.ivfTopKQuantizedFixedCodebook(qs, emb, "vec_id", "vec_id",
        "embedding", k = 5, nlist = 16, nprobe = 4)
      .select($"q_id", $"c_id", $"approx_cosine").as[(Long, Long, Double)].collect()
    // same cells are probed, so overlap should be near-total; shared
    // pairs score within int8 error
    val overlap = sq.count(p => float.contains((p._1, p._2))).toDouble / sq.length
    assert(overlap >= 0.8, s"overlap = $overlap")
    sq.foreach { case (q, c, a) =>
      float.get((q, c)).foreach(e =>
        assert(math.abs(a - e) < 0.02, s"($q,$c): $a vs $e"))
    }
  }

  // ---- ExactQuantile ----

  test("exact quantile narrowing equals sorted-array selection, incl. forced multi-level") {
    import graft.operators.ExactQuantile
    val rnd = new scala.util.Random(7)
    val xs = Seq.fill(2000)(rnd.nextDouble() * 1000 - 500)
    val df = xs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val sorted = xs.sorted
    def want(p: Double): Double = {
      val pos = p * (xs.size - 1) + 1
      val lo = math.floor(pos).toInt
      val frac = pos - lo
      if (frac == 0) sorted(lo - 1)
      else sorted(lo - 1) + frac * (sorted(lo) - sorted(lo - 1))
    }
    // tiny threshold + few bins forces several narrowing levels
    val got = ExactQuantile.quantiles(df, "v", Seq(0.0, 0.25, 0.5, 0.9, 1.0),
      bins = 16, collectThreshold = 8)
    got.foreach { case (p, v) =>
      assert(math.abs(v - want(p)) < 1e-12, s"p=$p: $v vs ${want(p)}") }
  }

  test("exact quantile handles duplicate-heavy plateaus and matches built-in percentile") {
    import graft.operators.ExactQuantile
    val xs = Seq.fill(5000)(42.0) ++ Seq.fill(100)(7.0) ++ Seq.fill(100)(99.0)
    val df = xs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val got = ExactQuantile.quantiles(df, "v", Seq(0.5, 0.01, 0.999),
      bins = 8, collectThreshold = 16).toMap
    assert(got(0.5) === 42.0)
    val builtin = df.agg(percentile($"v", typedLit(Seq(0.01, 0.999))))
      .as[Seq[Double]].head()
    assert(math.abs(got(0.01) - builtin(0)) < 1e-9)
    assert(math.abs(got(0.999) - builtin(1)) < 1e-9)
  }

  test("grouped exact quantiles bit-match built-in percentile per group") {
    import graft.operators.ExactQuantile
    val rnd = new scala.util.Random(11)
    // uneven group sizes incl. a singleton group and heavy duplicates
    val rows = (0 until 3000).map { i =>
      val g = if (i == 0) "solo" else s"g${i % 5}"
      val v = if (i % 7 == 0) 42.0 else rnd.nextDouble() * 1000 - 500
      (g, v)
    }
    val df = rows.toDF("k", "v")
    val got = ExactQuantile.quantilesByGroup(df, Seq("k"), "v",
        Seq(0.25, 0.5, 0.95), Seq("p25", "p50", "p95"), countCol = Some("n"),
        bins = 16, collectThreshold = 32) // forces several narrowing levels
      .as[(String, Double, Double, Double, Long)].collect().sortBy(_._1)
    val want = df.groupBy($"k")
      .agg(percentile($"v", typedLit(Seq(0.25, 0.5, 0.95))).as("ps"),
        count(lit(1)).as("n"))
      .as[(String, Seq[Double], Long)].collect().sortBy(_._1)
    assert(got.length === want.length)
    got.zip(want).foreach { case ((k, p25, p50, p95, n), (k2, ps, n2)) =>
      assert(k === k2 && n === n2)
      // bit-identical, not approximately equal: the interpolation replays
      // Spark's percentile formula exactly
      assert(p25 === ps(0) && p50 === ps(1) && p95 === ps(2), s"group $k")
    }
  }

  test("grouped quantiles: distributed and driver engines are bit-identical") {
    import graft.operators.ExactQuantile
    val rnd = new scala.util.Random(23)
    val df = (0 until 4000).map { i =>
      (s"g${i % 37}", if (i % 11 == 0) -7.25 else rnd.nextDouble() * 100 - 50)
    }.toDF("k", "v")
    def run(limit: Int) = ExactQuantile.quantilesByGroup(df, Seq("k"), "v",
        Seq(0.1, 0.5, 0.95), Seq("p10", "p50", "p95"), countCol = Some("n"),
        bins = 16, collectThreshold = 8, driverGroupLimit = limit)
      .as[(String, Double, Double, Double, Long)].collect().sortBy(_._1).toSeq
    // limit 0 forces the distributed engine; the default takes the
    // driver-coordinated one — the switch must be hash-invisible
    assert(run(0) === run(16384))
  }

  test("grouped exact quantiles at 1e5 groups: distributed output, exact values") {
    import graft.operators.ExactQuantile
    // 100k groups × 8 rows — the per-user/per-document group-count
    // regime the old collect-based output path could not hold on the
    // driver (VERDICT r7 #2)
    val df = spark.range(800000L).select(
      (col("id") % 100000L).as("g"),
      ((col("id") * 2654435761L) % 10007L).cast("double").as("v"))
    val got = ExactQuantile.quantilesByGroup(df, Seq("g"), "v",
      Seq(0.5, 0.9), Seq("p50", "p90"), countCol = Some("n"),
      bins = 32, collectThreshold = 4) // force the narrowing engine
    // the result is a distributed plan, not a driver-built local
    // relation (the old path surfaced as LocalTableScan)
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("LocalTableScan"), "output materialized on the driver")
    val sample = got.filter(col("g") < 1000L)
      .as[(Long, Double, Double, Long)].collect().sortBy(_._1)
    val want = df.filter(col("g") < 1000L).groupBy($"g")
      .agg(percentile($"v", typedLit(Seq(0.5, 0.9))).as("ps"), count(lit(1)).as("n"))
      .as[(Long, Seq[Double], Long)].collect().sortBy(_._1)
    assert(got.count() === 100000L)
    assert(sample.length === want.length)
    sample.zip(want).foreach { case ((g, p50, p90, n), (g2, ps, n2)) =>
      assert(g === g2 && n === n2 && p50 === ps(0) && p90 === ps(1), s"group $g")
    }
  }

  test("grouped exact quantiles ignore null/NaN values and absent groups") {
    import graft.operators.ExactQuantile
    val df = Seq(("a", Some(1.0)), ("a", Some(3.0)), ("a", None),
      ("b", Some(Double.NaN)), ("b", Some(5.0)), ("c", None))
      .toDF("k", "v")
    val got = ExactQuantile.quantilesByGroup(df, Seq("k"), "v",
        Seq(0.5), Seq("p50"), countCol = Some("n"))
      .as[(String, Double, Long)].collect().sortBy(_._1)
    // c has no non-null values -> absent; NaN ignored like null
    assert(got.toSeq === Seq(("a", 2.0, 2L), ("b", 5.0, 1L)))
  }

  test("exact quantiles refuse ±Infinity loudly (narrowing cannot bound it)") {
    import graft.operators.ExactQuantile
    val g = Seq(("a", 1.0), ("a", Double.PositiveInfinity), ("b", 2.0)).toDF("k", "v")
    val eg = intercept[IllegalArgumentException](
      ExactQuantile.quantilesByGroup(g, Seq("k"), "v", Seq(0.5), Seq("p50")))
    assert(eg.getMessage.contains("Infinity"))
    val eGlobal = intercept[IllegalArgumentException](
      ExactQuantile.quantiles(
        Seq(1.0, Double.NegativeInfinity).toDF("v"), "v", Seq(0.5)))
    assert(eGlobal.getMessage.contains("Infinity"))
  }

  // ---- Containment / novelty ----

  test("containment: short doc quoted inside long doc scores 1.0 one-sided") {
    val quoted = "p q r s t"
    val docs = Seq(
      (1L, quoted),                                           // 3 trigrams
      (2L, "lead in text then " + quoted + " and much more trailing text here"),
      (3L, "completely different content about other things entirely")
    ).toDF("doc_id", "text")
    val got = graft.operators.Containment
      .containmentPairs(docs, "doc_id", "text", n = 3, tau = 0.9, maxDf = 50)
      .as[(Long, Long, Long, Double, Double)].collect()
    assert(got.length === 1)
    val (a, b, shared, contA, contB) = got(0)
    assert((a, b, shared) === ((1L, 2L, 3L)))
    assert(contA === 1.0)       // all of doc1's grams appear in doc2
    assert(contB < 0.5)         // but doc2 is mostly other text (low jaccard case)
  }

  test("containment: df cap excludes stopword grams from the similarity") {
    // the shared gram appears in ALL 4 docs -> df=4 > maxDf=3 -> no pairs
    val docs = (1L to 4L).map(i => (i, s"common shingle here unique$i tail$i"))
      .toDF("doc_id", "text")
    val got = graft.operators.Containment
      .containmentPairs(docs, "doc_id", "text", n = 3, tau = 0.1, maxDf = 3)
    assert(got.count() === 0L)
  }

  test("novelty: exact duplicate of an earlier doc scores 0, first copy 1") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"),   // dup of doc 1
      (3L, "epsilon zeta eta theta")
    ).toDF("doc_id", "text")
    val got = graft.operators.Containment
      .noveltyScores(docs, "doc_id", "text", n = 3)
      .as[(Long, Long, Long, Option[Double])].collect().sortBy(_._1)
    assert(got(0)._4 === Some(1.0))
    assert(got(1)._4 === Some(0.0))
    assert(got(2)._4 === Some(1.0))
  }

  // ---- Quantize ----

  test("int8 report: extremes map to ±127-bounded codes, mse within (scale/2)^2") {
    val docs = Seq(
      (1L, Array(1.0f, -2.0f, 0.5f, 2.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f)),   // zero vector
      (3L, Array(127.0f))
    ).toDF("vec_id", "embedding")
    val rep = Quantize.int8Report(docs, "vec_id", "embedding")
      .as[(Long, Long, Double, Double, Long, Double)].collect().sortBy(_._1)
    val (_, dim1, _, s1, _, mse1) = rep(0)
    assert(dim1 === 4L && math.abs(s1 - 2.0 / 127) < 1e-9)
    assert(mse1 <= (s1 / 2) * (s1 / 2) + 1e-12)
    assert(rep(1) === ((2L, 4L, 0.0, 0.0, 0L, 0.0)))  // zero vector guard
    assert(rep(2)._5 === 127L)                         // max element → code 127
  }

  test("quantized top-k: recall@5 vs exact brute force >= 0.9 on sf embeddings") {
    import graft.operators.Similarity
    val emb = graft.sources.Tables(spark, sfDir, "embeddings")
    val queries = emb.filter($"vec_id" % 25 === 0)
    val exact = Similarity.bruteForceTopK(queries, emb, "vec_id", "vec_id", "embedding", 5)
      .select($"q_id", $"c_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.quantizedTopK(queries, emb, "vec_id", "vec_id", "embedding", 5)
      .select($"q_id", $"c_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall@5 = $recall")
    // int8 on 64-dim vectors: approx cosine within 2% of exact for shared pairs
    val ex = Similarity.bruteForceTopK(queries, emb, "vec_id", "vec_id", "embedding", 5)
      .select($"q_id", $"c_id", $"cosine").as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val ap = Similarity.quantizedTopK(queries, emb, "vec_id", "vec_id", "embedding", 5)
      .select($"q_id", $"c_id", $"approx_cosine").as[(Long, Long, Double)].collect()
    ap.foreach { case (q, c, a) =>
      ex.get((q, c)).foreach(e => assert(math.abs(a - e) < 0.02, s"($q,$c): $a vs $e"))
    }
  }

  test("int8 codes round-trip: codes within [-127,127], dequantized error < scale") {
    val df = Quantize.int8(
      graft.sources.Tables(spark, sfDir, "embeddings").limit(200),
      "embedding", "q8")
    val bad = df.select(
      exists($"q8_codes", q => abs(q) > 127).as("oob"),
      aggregate(zip_with($"embedding", $"q8_codes",
        (x, q) => abs(x.cast("double") - q.cast("double") * $"q8_scale")),
        lit(0.0), (a, e) => greatest(a, e)).as("maxerr"),
      $"q8_scale")
      .filter($"oob" || $"maxerr" > $"q8_scale")
      .count()
    assert(bad === 0L)
  }

  // ---- QualityClassifier ----

  test("quality classifier: logit equals the hand-computed hashed-BoW mean pool") {
    import graft.operators.QualityClassifier
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    def h60(s: String): Long = java.lang.Long.parseLong(md5hex(s).take(15), 16)
    def mw(b: String): Long = h60(s"w:$b") % 2001 - 1000
    def refNum(text: String): Long = {
      val toks = text.toLowerCase.split(" ", -1)
      mw("bias") * toks.length + toks.map(t => mw((h60(t) % 1024).toString)).sum
    }
    val docs = Seq((1L, "Quick Brown Fox"), (2L, "the the the"), (3L, "x"))
      .toDF("doc_id", "text")
    val got = QualityClassifier.score(docs, "doc_id", "text")
      .select($"doc_id", $"n_tok", $"score_num", $"logit", $"keep")
      .as[(Long, Long, Long, Double, Boolean)].collect().sortBy(_._1)
    assert(got.map(_._2).toSeq === Seq(3L, 3L, 1L))
    got.foreach { case (id, n, num, logit, keep) =>
      val want = refNum(Seq("quick brown fox", "the the the", "x")(id.toInt - 1))
      assert(num === want, s"doc $id: score_num $num vs $want")
      assert(math.abs(logit - want.toDouble / (1000.0 * n)) < 1e-15)
      assert(keep === (num >= 0))
    }
    // null text propagates null metrics (not legacy size(null) = -1)
    val nulls = QualityClassifier.score(
        Seq((9L, null: String)).toDF("doc_id", "text"), "doc_id", "text")
      .select($"n_tok", $"score_num", $"keep").head()
    assert(nulls.isNullAt(0) && nulls.isNullAt(1) && nulls.isNullAt(2))
  }

  // ---- PQ / IVF-PQ ----

  test("PQ over a pure-codebook corpus is EXACT squared L2 (codes hit d2=0)") {
    import graft.operators.Similarity
    // 4 vectors, dim 4, m=2, ksub=4: every vector IS a sub-centroid, so
    // encoding is lossless and approx_d2 must equal the true squared L2
    val vs = Seq(
      0L -> Seq(0f, 0f, 0f, 0f), 1L -> Seq(1f, 0f, 2f, 0f),
      2L -> Seq(0f, 3f, 0f, 4f), 3L -> Seq(5f, 5f, 6f, 6f))
    val df = vs.toDF("vec_id", "embedding")
    val got = Similarity.pqTopK(df, df, "vec_id", "vec_id", "embedding",
        k = 3, m = 2, ksub = 4, dim = 4)
      .select($"q_id", $"rank", $"c_id", $"approx_d2")
      .as[(Long, Int, Long, Double)].collect()
    def l2(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).map { case (x, y) => (x.toDouble - y) * (x.toDouble - y) }.sum
    val byId = vs.toMap
    got.foreach { case (q, _, c, d2) =>
      assert(math.abs(d2 - l2(byId(q), byId(c))) < 1e-12, s"($q,$c)") }
    // ranks are the true L2 order
    val gotRank = got.map(r => (r._1, r._2) -> r._3).toMap
    vs.foreach { case (q, qv) =>
      val want = vs.filter(_._1 != q)
        .sortBy { case (c, cv) => (l2(qv, cv), c) }.map(_._1)
      want.zipWithIndex.foreach { case (c, i) =>
        assert(gotRank((q, i + 1)) === c, s"q=$q rank ${i + 1}") }
    }
  }

  test("PQ recall@5 vs exact L2 brute force on sf embeddings") {
    import graft.operators.Similarity
    val emb = graft.sources.Tables(spark, sfDir, "embeddings")
    val queries = emb.filter($"vec_id" % 25 === 0)
    // exact L2 ground truth, computed inline (PQ approximates L2, so
    // cosine top-k would be the wrong baseline)
    val all = emb.select($"vec_id", $"embedding")
      .as[(Long, Seq[Float])].collect()
    val qids = queries.select($"vec_id").as[Long].collect().toSet
    def l2(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).map { case (x, y) => (x.toDouble - y) * (x.toDouble - y) }.sum
    val exact = all.filter(v => qids(v._1)).flatMap { case (q, qv) =>
      all.filter(_._1 != q)
        .map { case (c, cv) => (l2(qv, cv), c) }.sorted.take(5)
        .map { case (_, c) => (q, c) }
    }.toSet
    // This fixture is near-random unit vectors: nearest-neighbor d2
    // ~1.2 vs a ~1.5 noise floor, so 8-byte PQ codes are noise-limited
    // by construction (measured ~0.17 raw; trained k-means codebooks
    // only reach ~0.35). The bound is a drift detector, not a quality
    // claim — the deployable path is pqTopKReranked (next tests).
    val approx = Similarity.pqTopK(queries, emb, "vec_id", "vec_id",
        "embedding", k = 5)
      .select($"q_id", $"c_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.1, s"PQ recall@5 = $recall")
    // refine recovers recall monotonically with r (measured 0.33 /
    // 0.56 / 0.79 at r=20/50/100 here); assert the r=100 floor
    val refined = Similarity.pqTopKReranked(queries, emb, "vec_id",
        "vec_id", "embedding", k = 5, r = 100)
      .select($"q_id", $"c_id").as[(Long, Long)].collect().toSet
    val recallR = (exact & refined).size.toDouble / exact.size
    assert(recallR >= 0.6, s"PQ+refine(r=100) recall@5 = $recallR")
    assert(recallR > recall, "refine must improve on the raw PQ ranking")
  }

  test("PQ refine with r >= corpus degrades gracefully to exact brute force") {
    import graft.operators.Similarity
    val emb = graft.sources.Tables(spark, sfDir, "embeddings")
    val queries = emb.filter($"vec_id" % 100 === 0)
    val n = emb.count().toInt
    val exact = Similarity.bruteForceTopK(queries, emb, "vec_id", "vec_id",
        "embedding", 5)
      .select($"q_id", $"rank", $"c_id").as[(Long, Int, Long)].collect().toSet
    val refined = Similarity.pqTopKReranked(queries, emb, "vec_id", "vec_id",
        "embedding", k = 5, r = n)
      .select($"q_id", $"rank", $"c_id").as[(Long, Int, Long)].collect().toSet
    assert(refined === exact)
  }

  test("native pq_codes matches the HOF encoding spec on every fixture vector") {
    import graft.operators.Similarity
    val emb = graft.sources.Tables(spark, sfDir, "embeddings")
    val c = emb.select($"vec_id".as("c_id"), $"embedding".as("__cv"))
    val cbRows = c.orderBy($"c_id").limit(16)
      .select($"c_id".as("cell"), $"__cv".as("v"))
    val cb = broadcast(cbRows.agg(
      sort_array(collect_list(struct($"cell", $"v"))).as("__cb")))
    val viaHof = Similarity.pqEncodeHof(c, "__cv", cb, m = 8, dsub = 8)
      .select($"c_id", $"__codes").as[(Long, Seq[Int])].collect().toMap
    val flat = cbRows.orderBy($"cell").as[(Long, Seq[Float])].collect()
      .flatMap(_._2.map(_.toDouble))
    val viaNative = c.select($"c_id",
        Similarity.pqCodesNative($"__cv", flat, m = 8, ksub = 16, dim = 64)
          .as("__codes"))
      .as[(Long, Seq[Int])].collect().toMap
    assert(viaNative === viaHof)
    assert(viaNative.nonEmpty)
  }

  test("IVF-PQ pairs score IDENTICALLY to plain PQ (same codes, same table)") {
    import graft.operators.Similarity
    val emb = graft.sources.Tables(spark, sfDir, "embeddings")
    val queries = emb.filter($"vec_id" % 50 === 0)
    val pq = Similarity.pqTopK(queries, emb, "vec_id", "vec_id",
        "embedding", k = 200)
      .select($"q_id", $"c_id", $"approx_d2").as[(Long, Long, Double)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    val ivfpq = Similarity.ivfPqTopK(queries, emb, "vec_id", "vec_id",
        "embedding", k = 5, nlist = 16, nprobe = 4)
      .select($"q_id", $"c_id", $"approx_d2").as[(Long, Long, Double)]
      .collect()
    assert(ivfpq.nonEmpty)
    // no-residual layout: a shared (q,c) pair must carry the same bits
    ivfpq.foreach { case (q, c, d2) =>
      pq.get((q, c)).foreach(e => assert(e === d2, s"($q,$c): $d2 vs $e")) }
  }
}
