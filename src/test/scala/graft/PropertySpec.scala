package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.functions._
import graft.functions.TopKDoubles
import graft.operators.{RangeJoin, Scd2}

/** Generative equivalence properties for the round-3 operators: random
  * inputs (including negatives, duplicates, empty sides) must match the
  * naive reference formulation exactly. */
class PropertySpec extends SparkSpecBase {
  import spark.implicits._

  private def checkProp(prop: Prop, minTests: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minTests), prop)
    assert(res.passed, res.status.toString)
  }

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("fuzzy self-join equals brute-force levenshtein on random short strings") {
    // small alphabet forces collisions, near-misses, exact dups, empties
    val word = Gen.chooseNum(0, 6).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val rows = Gen.listOfN(25, word).map(_.zipWithIndex.map {
      case (w, i) => (i.toLong, w) })
    checkProp(Prop.forAllNoShrink(rows, Gen.oneOf(1, 2)) { (ws, d) =>
      val df = ws.toDF("id", "s")
      val got = graft.operators.FuzzyJoin.selfPairs(df, "id", "s", maxDist = d)
        .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
      val want = (for {
        (ia, sa) <- ws; (ib, sb) <- ws
        if ia < ib && lev(sa, sb) <= d
      } yield (ia, ib)).toSet
      got == want
    }, minTests = 12)
  }

  test("q-gram prefix-filter fuzzy join equals brute force across d=1..4 and mixed lengths") {
    // lengths straddle the SHORT/gram-path boundary on purpose; the
    // tiny alphabet forces shared common grams (the prefix filter must
    // still find rare ones) and exact dups
    val word = Gen.chooseNum(0, 20).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val rows = Gen.listOfN(22, word).map(_.zipWithIndex.map {
      case (w, i) => (i.toLong, w) })
    checkProp(Prop.forAllNoShrink(rows, Gen.oneOf(1, 2, 3, 4)) { (ws, d) =>
      val df = ws.toDF("id", "s")
      val got = graft.operators.FuzzyJoin.selfPairsQGram(df, "id", "s", maxDist = d)
        .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
      val want = (for {
        (ia, sa) <- ws; (ib, sb) <- ws
        if ia < ib && lev(sa, sb) <= d
      } yield (ia, ib)).toSet
      got == want
    }, minTests = 12)
  }

  test("two-table q-gram fuzzy join equals brute force on random strings") {
    val word = Gen.chooseNum(0, 20).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val rows = Gen.listOfN(24, word).map(_.zipWithIndex.map {
      case (w, i) => (i.toLong, w) })
    checkProp(Prop.forAllNoShrink(rows, Gen.oneOf(1, 2, 3)) { (ws, d) =>
      val (l, r) = ws.partition(_._1 % 2 == 0)
      val got = graft.operators.FuzzyJoin.pairsQGram(
          l.toDF("id", "s"), r.toDF("id", "s"), "id", "s", maxDist = d)
        .select($"l_id", $"r_id").as[(Long, Long)].collect().toSet
      val want = (for {
        (il, sl) <- l; (ir, sr) <- r
        if lev(sl, sr) <= d
      } yield (il, ir)).toSet
      got == want
    }, minTests = 10)
  }

  test("resample ffill + interpolate equal a sequential reference on random series") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val hour = 3600L * 1000
    // irregular observations on a 0..72h range, 1-3 keys, duplicate-free
    val obsGen = for {
      nKeys <- Gen.chooseNum(1, 3)
      n <- Gen.chooseNum(0, 25)
      rows <- Gen.listOfN(n, Gen.zip(
        Gen.chooseNum(1L, nKeys.toLong),
        Gen.chooseNum(0L, 72L * hour),
        Gen.chooseNum(-50.0, 50.0)))
    } yield rows.map { case (k, off, v) =>
      (k, new java.sql.Timestamp(t0 + off), v)
    }.distinctBy(r => (r._1, r._2))
    checkProp(Prop.forAllNoShrink(obsGen) { rows =>
      val df = rows.toDF("k", "ts", "v")
      val gridStart = "2024-01-01 00:00:00"
      val gridEnd = "2024-01-04 00:00:00"
      def gridPoints: Seq[Long] = (0L to 72L by 12L).map(h => t0 + h * hour)
      val byKey = rows.groupBy(_._1).view.mapValues(_.sortBy(_._2.getTime)).toMap
      // sequential reference for one key at one grid instant
      def prevOf(k: Long, g: Long) =
        byKey(k).filter(_._2.getTime <= g).lastOption
      def nextOf(k: Long, g: Long) =
        byKey(k).find(_._2.getTime >= g)
      val ff = graft.operators.AsOf.resampleFfill(df, Seq("k"), "ts",
          gridStart, gridEnd, expr("interval 12 hours"))
        .select($"k", $"grid_ts", $"last_v")
        .as[(Long, java.sql.Timestamp, Option[Double])].collect()
        .map(r => (r._1, r._2.getTime) -> r._3).toMap
      val ip = graft.operators.AsOf.resampleInterpolate(df, Seq("k"), "ts", "v",
          gridStart, gridEnd, expr("interval 12 hours"))
        .select($"k", $"grid_ts", $"interp")
        .as[(Long, java.sql.Timestamp, Option[Double])].collect()
        .map(r => (r._1, r._2.getTime) -> r._3).toMap
      val keys = byKey.keySet
      // grids exist only for keys with >= 1 observation (distinct keys
      // come from the observation table itself)
      ff.keys.map(_._1).toSet == keys && ip.keys.map(_._1).toSet == keys &&
      keys.forall { k =>
        gridPoints.forall { g =>
          val p = prevOf(k, g)
          val n = nextOf(k, g)
          val wantFf = p.map(_._3)
          val wantIp = (p, n) match {
            case (Some((_, pt, pv)), Some((_, nt, nv))) =>
              if (nt.getTime == pt.getTime) Some(pv)
              else Some(pv + (nv - pv) *
                ((g - pt.getTime).toDouble / (nt.getTime - pt.getTime).toDouble))
            case _ => None
          }
          ff((k, g)) == wantFf &&
            ((ip((k, g)), wantIp) match {
              case (None, None) => true
              case (Some(a), Some(b)) => math.abs(a - b) <= 1e-9
              case _ => false
            })
        }
      }
    }, minTests = 8)
  }

  test("block dedup: reconstruction keeps exactly the first-occurrence blocks") {
    // tiny token alphabet + short docs → heavy cross-doc block collisions
    val doc = Gen.chooseNum(0, 9).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("x", "y")).map(_.mkString(" ")))
    val corpus = Gen.listOfN(12, doc).map(_.zipWithIndex.map {
      case (t, i) => (i.toLong, t) })
    checkProp(Prop.forAllNoShrink(corpus, Gen.oneOf(2, 3)) { (docs, bt) =>
      val df = docs.toDF("id", "text")
      val out = graft.operators.BlockDedup
        .dropDuplicateBlocks(df, "id", "text", blockTokens = bt)
        .as[(Long, String)].collect().toMap
      // reference: global first-occurrence election over (id, pos).
      // NB "".split(" ") is Array("") — one empty-token block, exactly
      // like Spark's split, so no empty special case.
      def blks(t: String): Seq[String] =
        t.split(" ").grouped(bt).map(_.mkString(" ")).toSeq
      val seen = scala.collection.mutable.Set.empty[String]
      val want = docs.sortBy(_._1).map { case (id, t) =>
        id -> blks(t).filter(b => seen.add(b)).mkString(" ")
      }.toMap
      out == want
    }, minTests = 12)
  }

  test("bigram surprisal equals sequential MLE reference on random corpora") {
    val doc = Gen.chooseNum(0, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c")).map(_.mkString(" ")))
    val corpus = Gen.listOfN(10, doc).map(_.zipWithIndex.map {
      case (t, i) => (i.toLong, t) })
    checkProp(Prop.forAllNoShrink(corpus) { docs =>
      val df = docs.toDF("id", "text")
      val got = graft.operators.LangModel.bigramSurprisal(df, "id", "text")
        .as[(Long, Long, Long, Option[Double])].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      // sequential reference. NB "".split(" ") = Array("") — one empty
      // token, exactly like Spark's split
      def bigrams(t: String): Seq[(String, String)] = {
        val ws = t.split(" ")
        if (ws.length < 2) Seq.empty else ws.init.zip(ws.tail).toSeq
      }
      val all = docs.flatMap { case (_, t) => bigrams(t) }
      val cBi = all.groupBy(identity).map { case (k, v) => k -> v.size }
      val cCtx = all.groupBy(_._1).map { case (k, v) => k -> v.size }
      docs.forall { case (id, t) =>
        val bs = bigrams(t)
        val (nBi, nDist, nll) = got(id)
        val wantNll =
          if (bs.isEmpty) None
          else Some(BigDecimal(
            bs.map(b => math.log(cCtx(b._1).toDouble) - math.log(cBi(b).toDouble)).sum
              / bs.size)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        nBi == bs.size && nDist == bs.distinct.size &&
          ((nll, wantNll) match {
            case (None, None) => true
            case (Some(a), Some(b)) => math.abs(a - b) <= 1e-6
            case _ => false
          })
      }
    }, minTests = 12)
  }

  test("exact quantiles equal sorted-array interpolation on random data") {
    // mixture of continuous values and heavy duplicates, incl. negatives
    val value = Gen.oneOf(
      Gen.chooseNum(-1000.0, 1000.0),
      Gen.oneOf(-5.0, 0.0, 42.0))
    val data = Gen.chooseNum(1, 400).flatMap(n => Gen.listOfN(n, value))
    val fracs = Gen.listOfN(3, Gen.chooseNum(0.0, 1.0))
    checkProp(Prop.forAllNoShrink(data, fracs) { (xs, ps) =>
      val df = xs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
      val sorted = xs.sorted
      def want(p: Double): Double = {
        val pos = p * (xs.size - 1) + 1
        val lo = math.floor(pos).toInt
        val frac = pos - lo
        if (frac == 0) sorted(lo - 1)
        else sorted(lo - 1) + frac * (sorted(lo) - sorted(lo - 1))
      }
      val got = graft.operators.ExactQuantile.quantiles(df, "v", ps.distinct,
        bins = 8, collectThreshold = 4) // force many shared-narrowing levels
      got.forall { case (p, v) => math.abs(v - want(p)) <= 1e-9 }
    }, minTests = 10)
  }

  test("int8 quantization: round-trip error <= scale/2 + eps on random vectors") {
    val vec = Gen.chooseNum(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-100.0f, 100.0f)))
    checkProp(Prop.forAllNoShrink(Gen.listOfN(10, vec)) { vs =>
      val df = vs.zipWithIndex.map { case (v, i) => (i.toLong, v.toArray) }
        .toDF("id", "v")
      val out = graft.operators.Quantize.int8(df, "v", "q")
        .select($"id", $"v", $"q_scale", $"q_codes")
        .as[(Long, Array[Float], Double, Array[Long])].collect()
      out.forall { case (_, v, s, codes) =>
        codes.forall(c => math.abs(c) <= 127) &&
        v.zip(codes).forall { case (x, c) =>
          math.abs(x.toDouble - c * s) <= s / 2 + 1e-9 }
      }
    }, minTests = 12)
  }

  test("binned range join equals the naive theta join on random data (incl. negatives)") {
    val points = Gen.listOfN(60, Gen.zip(Gen.chooseNum(0L, 1000L),
      Gen.chooseNum(-50.0, 50.0)))
    val intervals = Gen.listOfN(15, Gen.zip(Gen.chooseNum(0L, 1000L),
      Gen.chooseNum(-60.0, 60.0), Gen.chooseNum(0.0, 25.0)))
    checkProp(Prop.forAllNoShrink(points, intervals, Gen.chooseNum(0.5, 20.0)) {
      (ps, ivs, w) =>
        val p = ps.toDF("pid", "x")
        val iv = ivs.map { case (id, lo, span) => (id, lo, lo + span) }
          .toDF("iid", "lo", "hi")
        def canon(df: org.apache.spark.sql.DataFrame) =
          df.select("pid", "iid").collect()
            .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
        val binned = canon(RangeJoin.pointInInterval(p, iv, "x", "lo", "hi", w))
        val naive = canon(p.join(iv, $"x".between($"lo", $"hi")))
        binned == naive
    }, minTests = 15)
  }

  test("partitioned merge equals full-table merge on random batches") {
    import graft.sources.CommitLog
    val rows = Gen.listOfN(20, Gen.zip(
      Gen.chooseNum(0L, 12L), Gen.oneOf("p0", "p1", "p2"), Gen.alphaStr))
    checkProp(Prop.forAllNoShrink(rows, rows, Gen.oneOf(true, false)) {
      (seed0, batch0, insertOnly) =>
        // unique per (id, part) as the merge contract requires
        def uniq(xs: List[(Long, String, String)]) =
          xs.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
        val seed = uniq(seed0); val batch = uniq(batch0)
        val mode = if (insertOnly) CommitLog.InsertIfAbsent else CommitLog.LastWins
        val dirA = java.nio.file.Files.createTempDirectory("prop-part").toString + "/t"
        val dirB = java.nio.file.Files.createTempDirectory("prop-full").toString + "/t"
        val logA = CommitLog(spark, dirA); val logB = CommitLog(spark, dirB)
        if (seed.nonEmpty) {
          logA.appendPartitioned(seed.toDF("id", "part", "v"), "part")
          logB.append(seed.toDF("id", "part", "v"))
        }
        if (batch.nonEmpty) {
          logA.upsertPartitioned(batch.toDF("id", "part", "v"),
            Seq("id", "part"), mode, "part")
          logB.upsert(batch.toDF("id", "part", "v"), Seq("id", "part"), mode)
        }
        val a = logA.read().as[(Long, String, String)].collect().toSet
        val b = logB.read().as[(Long, String, String)].collect().toSet
        a == b
    }, minTests = 8)
  }

  test("intervalOverlap equals the naive overlap theta join on random intervals") {
    val gen = Gen.listOfN(25, Gen.zip(Gen.chooseNum(0L, 1000L),
      Gen.chooseNum(-60.0, 60.0), Gen.chooseNum(0.0, 25.0)))
    checkProp(Prop.forAllNoShrink(gen, gen, Gen.chooseNum(0.5, 20.0)) {
      (as, bs, w) =>
        val a = as.map { case (id, lo, sp) => (id, lo, lo + sp) }
          .toDF("a_id", "a_lo", "a_hi")
        val b = bs.map { case (id, lo, sp) => (id, lo, lo + sp) }
          .toDF("b_id", "b_lo", "b_hi")
        def canon(df: org.apache.spark.sql.DataFrame) =
          df.select("a_id", "b_id").collect()
            .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
        val binned = canon(RangeJoin.intervalOverlap(
          a, b, "a_lo", "a_hi", "b_lo", "b_hi", w))
        val naive = canon(a.join(b, $"a_lo" <= $"b_hi" && $"b_lo" <= $"a_hi"))
        binned == naive
    }, minTests = 15)
  }

  test("intervalOverlap raises on inverted intervals, drops null bounds") {
    import graft.operators.RangeJoin
    val a = Seq((1L, 5.0, 3.0)).toDF("a_id", "a_lo", "a_hi") // lo > hi
    val b = Seq((1L, 0.0, 10.0)).toDF("b_id", "b_lo", "b_hi")
    val e = intercept[Exception] {
      RangeJoin.intervalOverlap(a, b, "a_lo", "a_hi", "b_lo", "b_hi", 1.0).count()
    }
    assert(e.getMessage.contains("inverted interval")
      || Option(e.getCause).exists(_.getMessage.contains("inverted interval")))
    // null- and NaN-bounded rows drop silently — that IS the theta-join
    // result; a NaN bound must NOT trip the inverted-interval guard
    // (Spark orders NaN above every finite value, so NaN lo > finite hi)
    val an = Seq((1L, Some(1.0), None: Option[Double]), (2L, Some(0.0), Some(4.0)),
      (3L, Some(Double.NaN), Some(4.0)), (4L, Some(1.0), Some(Double.NaN)))
      .toDF("a_id", "a_lo", "a_hi")
    val got = RangeJoin.intervalOverlap(an, b, "a_lo", "a_hi", "b_lo", "b_hi", 1.0)
      .select($"a_id").as[Long].collect().toSeq
    assert(got === Seq(2L))
  }

  test("TopKDoubles reduce+merge equals sort-take-k on random streams") {
    val agg = new TopKDoubles(5)
    val values = Gen.listOf(Gen.chooseNum(-1e6, 1e6))
    checkProp(Prop.forAllNoShrink(values, values) { (xs, ys) =>
      val viaAgg = agg.merge(
        xs.foldLeft(agg.zero)(agg.reduce),
        ys.foldLeft(agg.zero)(agg.reduce))
      val want = (xs ++ ys).sorted(Ordering[Double].reverse).take(5)
      viaAgg == want
    }, minTests = 200)
  }

  test("TopKScored reduce+merge equals sort-take-k with the (score desc, id) tie-break") {
    val agg = new graft.functions.TopKScored(4)
    // scores drawn from a SMALL set so ties are common — the id
    // tie-break must match the window formulation exactly
    val pairs = Gen.listOf(Gen.zip(
      Gen.oneOf(0.0, 0.25, 0.5, 0.75, 1.0), Gen.chooseNum(0L, 50L)))
    checkProp(Prop.forAllNoShrink(pairs, pairs) { (xs, ys) =>
      val viaAgg = agg.merge(
        xs.foldLeft(agg.zero)(agg.reduce),
        ys.foldLeft(agg.zero)(agg.reduce))
      val want = (xs ++ ys)
        .sortBy { case (s, id) => (-s, id) }.take(4)
      viaAgg == want
    }, minTests = 200)
  }

  test("ivfKnnJoinLargeQ equals the broadcast IVF searcher on the fixture") {
    val emb = graft.sources.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val viaJoin = graft.operators.Similarity.ivfKnnJoinLargeQ(
        emb, emb, "vec_id", "vec_id", "embedding", k = 3, nlist = 16, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val viaBroadcast = graft.operators.Similarity.ivfTopKFixedCodebook(
        emb, emb, "vec_id", "vec_id", "embedding", k = 3, nlist = 16, nprobe = 4)
      .select($"q_id", $"rank", $"c_id", $"cosine")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(viaJoin === viaBroadcast)
  }

  test("jaccardSorted equals hash-set jaccard on random token sets") {
    val tokens = Gen.listOf(Gen.oneOf("a", "b", "cc", "dd", "e1", "f2", "gg3", "h", "ii", "j"))
    checkProp(Prop.forAllNoShrink(tokens, tokens) { (xs, ys) =>
      val df = Seq((xs, ys)).toDF("x", "y")
        .select(
          graft.functions.TextFunctions.jaccard(
            array_distinct($"x"), array_distinct($"y")).as("viaSet"),
          graft.functions.TextFunctions.jaccardSorted(
            array_sort(array_distinct($"x")), array_sort(array_distinct($"y"))).as("viaMerge"))
      val r = df.collect()(0)
      val a = r.getDouble(0)
      val m = r.getDouble(1)
      (a.isNaN && m.isNaN) || a == m
    }, minTests = 30)
  }

  test("SCD2 rebuild partitions each key's timeline: versions chain, last is open") {
    val logs = Gen.listOfN(30, Gen.zip(Gen.oneOf("a", "b", "c"),
      Gen.chooseNum(0, 999), Gen.chooseNum(0L, 3L)))
    checkProp(Prop.forAllNoShrink(logs) { rows =>
      // unique (key, ts) pairs so ordering is total without tie-breaks
      val distinctRows = rows.distinctBy(r => (r._1, r._2))
      val log = distinctRows
        .map { case (k, t, v) => (k, java.sql.Timestamp.valueOf(
          f"2024-01-01 00:00:${t / 60}%02d.${t % 60}%03d"), v) }
        .toDF("k", "t", "v")
      val hist = Scd2.fromChangeLog(log, Seq("k"), "t", "v")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getTimestamp(2),
          Option(r.getTimestamp(3))))
        .groupBy(_._1)
      hist.forall { case (_, versions) =>
        val sorted = versions.sortBy(_._3)
        val chained = sorted.sliding(2).forall {
          case Array(a, b) => a._4.contains(b._3)
          case _ => true
        }
        val lastOpen = sorted.last._4.isEmpty
        val noAdjacentDup = sorted.sliding(2).forall {
          case Array(a, b) => a._2 != b._2
          case _ => true
        }
        chained && lastOpen && noAdjacentDup
      }
    }, minTests = 15)
  }

  test("column mapping: random rename/drop/add/upsert/delete sequences match a naive model") {
    // model-based soak of the r11 column-mapping feature: a reference
    // Map model and the commit log apply the SAME random op sequence;
    // after EVERY op the table's logical view must equal the model —
    // renames must carry old files' data, drops must hide it, re-adds
    // must NOT resurrect it, upserts/deletes must address current names
    import graft.sources.CommitLog
    sealed trait Op
    case class Ups(rows: List[(Long, Long)]) extends Op
    case class Mrg(rows: List[(Long, Long)]) extends Op
    case class Ren(col: Int, to: Int) extends Op
    case class Drp(col: Int) extends Op
    case class Add(name: Int) extends Op
    case class Del(mod: Long, rem: Long) extends Op
    case object Cln extends Op
    val names = Vector("a", "b", "c", "d", "e")
    val opGen: Gen[Op] = Gen.frequency(
      3 -> Gen.listOfN(4, Gen.zip(Gen.chooseNum(0L, 9L), Gen.chooseNum(0L, 99L)))
        .map(Ups(_)),
      2 -> Gen.listOfN(4, Gen.zip(Gen.chooseNum(0L, 9L), Gen.chooseNum(0L, 99L)))
        .map(Mrg(_)),
      2 -> Gen.zip(Gen.chooseNum(0, 4), Gen.chooseNum(0, 4))
        .map { case (c, t) => Ren(c, t) },
      2 -> Gen.chooseNum(0, 4).map(Drp(_)),
      2 -> Gen.chooseNum(0, 4).map(Add(_)),
      1 -> Gen.zip(Gen.chooseNum(2L, 4L), Gen.chooseNum(0L, 3L))
        .map { case (m, r) => Del(m, r) },
      1 -> Gen.const(Cln))
    val seqGen = Gen.listOfN(8, opGen)
    // r13: lift the deletion-vector admission floor so the soak's
    // random deletes MIX merge-on-read masks (small fractions) with
    // copy-on-write rewrites (large fractions, ratio > 0.3) — the
    // model must agree either way, putting DV×mapping×clone interplay
    // under the same random sequences
    spark.conf.set("spark.graft.dv.minTouchedBytes", "0")
    try checkProp(Prop.forAllNoShrink(seqGen) { ops =>
      val t = java.nio.file.Files.createTempDirectory("clog-map-prop")
        .toString + "/t"
      val log = CommitLog(spark, t)
      // model: ordered value columns + id-keyed rows of per-col values
      var cols = Vector("v0") // value columns besides id
      var rows = Map.empty[Long, Map[String, Option[Long]]]
      log.upsert(Seq((0L, 0L)).toDF("id", "v0"), Seq("id"), CommitLog.LastWins)
      rows += 0L -> Map("v0" -> Some(0L))
      // shallow clones taken mid-sequence: each must stay EXACTLY its
      // fork-point model while every later source op lands (renames,
      // drops, deletes, merges must never leak into a clone)
      var clones = List.empty[(CommitLog, Vector[String],
        Map[Long, Map[String, Option[Long]]])]
      def viewAgrees(l: CommitLog, vcols: Vector[String],
          vrows: Map[Long, Map[String, Option[Long]]]): Boolean = {
        val df = l.read()
        val gotCols = df.columns.toSeq
        val wantCols = "id" +: vcols
        if (gotCols != wantCols) {
          info(s"columns $gotCols != $wantCols"); return false
        }
        val got = df.collect().map { r =>
          r.getLong(0) -> vcols.zipWithIndex.map { case (c, i) =>
            c -> (if (r.isNullAt(i + 1)) None else Some(r.getLong(i + 1)))
          }.toMap
        }.toMap
        val ok = got == vrows
        if (!ok) info(s"rows $got != $vrows")
        ok
      }
      def agree(): Boolean =
        viewAgrees(log, cols, rows) &&
          clones.forall { case (cl, cc, cr) => viewAgrees(cl, cc, cr) }
      ops.forall { op =>
        op match {
          case Ups(rs) =>
            val dedup = rs.toMap.toList // unique ids (upsert requires)
            val df = dedup.map { case (id, v) =>
              (id, cols.indices.map(i => v + i)) }
              .toDF("id", "vs")
              .select(col("id") +: cols.indices.map(i =>
                element_at(col("vs"), i + 1).as(cols(i))): _*)
            log.upsert(df, Seq("id"), CommitLog.LastWins)
            dedup.foreach { case (id, v) =>
              rows += id -> cols.zipWithIndex
                .map { case (c, i) => c -> Some(v + i) }.toMap
            }
          case Mrg(rs) =>
            // same effect as LastWins upsert, but via the ANSI MERGE
            // path — exercises merge()'s evolved-schema assignPhys
            // (drop → merge-insert re-add must not resurrect)
            val dedup = rs.toMap.toList
            val df = dedup.map { case (id, v) =>
              (id, cols.indices.map(i => v + i)) }
              .toDF("id", "vs")
              .select(col("id") +: cols.indices.map(i =>
                element_at(col("vs"), i + 1).as(cols(i))): _*)
            log.merge(df, Seq("id"), Seq(
              CommitLog.WhenMatchedUpdate(
                cols.map(c => c -> col(s"s.$c")).toMap),
              CommitLog.WhenNotMatchedInsert()))
            dedup.foreach { case (id, v) =>
              rows += id -> cols.zipWithIndex
                .map { case (c, i) => c -> Some(v + i) }.toMap
            }
          case Ren(ci, ti) =>
            val to = names(ti) + "_r"
            if (ci < cols.length && !cols.contains(to) && to != "id") {
              val from = cols(ci)
              log.renameColumn(from, to)
              cols = cols.updated(ci, to)
              rows = rows.view.mapValues(m =>
                m - from + (to -> m(from))).toMap
            }
          case Drp(ci) =>
            if (ci < cols.length && cols.length > 1) {
              val c = cols(ci)
              log.dropColumn(c)
              cols = cols.patch(ci, Nil, 1)
              rows = rows.view.mapValues(_ - c).toMap
            }
          case Add(ni) =>
            val n = names(ni)
            if (!cols.contains(n)) {
              log.addColumns(org.apache.spark.sql.types.StructType(Seq(
                org.apache.spark.sql.types.StructField("" + n,
                  org.apache.spark.sql.types.LongType))))
              cols = cols :+ n
              rows = rows.view.mapValues(_ + (n -> None)).toMap
            }
          case Del(m, r) =>
            log.delete(col("id") % m === r)
            rows = rows.filter { case (id, _) => id % m != r }
          case Cln =>
            if (clones.length < 2) { // bound per-sequence clone cost
              val cRoot = java.nio.file.Files
                .createTempDirectory("clog-map-prop-cl").toString + "/t"
              log.cloneTo(cRoot)
              clones ::= ((CommitLog(spark, cRoot), cols, rows))
            }
        }
        agree()
      }
    }, minTests = 6)
    finally spark.conf.unset("spark.graft.dv.minTouchedBytes")
  }
}
