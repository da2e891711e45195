package graft

import org.apache.spark.sql.functions._
import graft.operators.Contamination

/** Unit coverage for the round-3 corpus-pipeline operators (the q81+
  * family) beyond their DuckDB oracles. */
class CorpusOpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("contamination: contained doc scores 1.0, disjoint doc 0.0, partial in between") {
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six")).toDF("id", "text")
    val test = Seq(
      (10L, "alpha beta gamma delta"),        // every 3-gram in train doc 1
      (11L, "qq ww ee rr tt yy"),             // no gram in train
      (12L, "alpha beta gamma qq ww ee")      // mixed
    ).toDF("id", "text")
    val got = Contamination.overlapScores(test, train, "id", "text")
      .select($"id", $"n_grams", $"n_overlap", $"contamination")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(got(0) === ((10L, 2L, 2L, 1.0)))
    assert(got(1)._3 === 0L && got(1)._4 === 0.0)
    assert(got(2)._3 > 0L && got(2)._4 > 0.0 && got(2)._4 < 1.0)
  }

  test("contamination: hashed-gram join matches raw string-gram join") {
    val docs = sfDocs.limit(200)
    val test = docs.filter($"doc_id" % 3 === 0)
    val train = docs.filter($"doc_id" % 3 =!= 0)
    val hashed = Contamination.overlapScores(test, train, "doc_id", "text")
      .select($"doc_id", $"n_overlap").as[(Long, Long)].collect().toMap
    // reference: join on the gram STRINGS
    import graft.functions.TextFunctions
    val tg = test.select($"doc_id",
      explode(TextFunctions.wordNGrams(TextFunctions.words($"text"), 3)).as("g"))
    val vocab = train.select(
      explode(TextFunctions.wordNGrams(TextFunctions.words($"text"), 3)).as("g")).distinct()
    val raw = tg.join(vocab, Seq("g"), "left_semi")
      .groupBy($"doc_id").agg(count(lit(1)).as("n")).as[(Long, Long)].collect().toMap
    hashed.foreach { case (id, n) => assert(raw.getOrElse(id, 0L) === n, s"doc $id") }
  }

  test("redactPii scrubs emails, phones, IPs, long digit runs; leaves clean text alone") {
    import graft.functions.{TextFunctions => TF}
    val rows = Seq(
      (1L, "mail bob.smith+x@corp.example.com and a@b.io now"),
      (2L, "call 555-123-4567 twice 555-123-4567"),
      (3L, "host 192.168.1.100 and 10.0.0.1"),
      (4L, "card 4111111111111111 ok"),
      (5L, "perfectly clean text with digits 42 and 1-2-3")
    ).toDF("id", "text")
    val got = rows.select($"id", TF.redactPii($"text").as("r"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) === "mail <EMAIL> and <EMAIL> now")
    assert(got(2L) === "call <PHONE> twice <PHONE>")
    assert(got(3L) === "host <IP> and <IP>")
    assert(got(4L) === "card <NUM> ok")
    assert(got(5L) === "perfectly clean text with digits 42 and 1-2-3")
    // counts see the same matches the replacement consumes
    val counts = rows.select($"id",
      TF.piiCount($"text", TF.PII_PATTERNS(0)._1).as("e")).as[(Long, Long)].collect().toMap
    assert(counts(1L) === 2L && counts(5L) === 0L)
  }

  test("prefix-sum packing is exact and independent of partition count") {
    import graft.operators.Packing
    val docs = (1L to 97L).map(i => (i, (i % 7) + 1)).toDF("id", "n")
    // ground truth on the driver
    var acc = 0L
    val want = (1L to 97L).map { i =>
      val n = (i % 7) + 1; val s = acc; acc += n; (i, s)
    }.toMap
    for (p <- Seq(1, 3, 13)) {
      val got = Packing.exclusivePrefixSum(docs, "id", "n", "s", numParts = p)
        .select($"id", $"s").as[(Long, Long)].collect().toMap
      assert(got === want, s"numParts=$p")
    }
    val packed = Packing.packBlocks(docs, "id", "n", budget = 10L, numParts = 5)
      .select($"id", $"start_tok", $"first_block", $"last_block", $"straddles")
      .as[(Long, Long, Long, Long, Boolean)].collect().sortBy(_._1)
    packed.foreach { case (id, s, fb, lb, st) =>
      assert(s === want(id))
      val n = (id % 7) + 1
      assert(fb === s / 10 && lb === (s + n - 1) / 10 && st === (fb != lb), s"id=$id")
    }
  }

  test("budget selection: ranked-prefix keep under a DESC multi-column order") {
    import graft.operators.Packing
    // quality q with ties (id tie-break), token counts n
    val docs = Seq((1L, 5L, 10L), (2L, 9L, 10L), (3L, 5L, 10L),
      (4L, 9L, 10L), (5L, 1L, 10L)).toDF("id", "q", "n")
    for (p <- Seq(1, 2, 7)) {
      val got = Packing.selectUnderBudget(docs, "n", budget = 30L,
          orderCols = Seq($"q".desc, $"id"), numParts = p)
        .select($"id", $"cum_before", $"selected")
        .as[(Long, Long, Boolean)].collect().sortBy(_._1)
      // rank order: 2, 4 (q=9), 1, 3 (q=5), 5 → cum 0,20,10,30,40
      assert(got.map(r => r._1 -> r._2).toMap
        === Map(1L -> 20L, 2L -> 0L, 3L -> 30L, 4L -> 10L, 5L -> 40L),
        s"numParts=$p")
      assert(got.filter(_._3).map(_._1).toSeq === Seq(1L, 2L, 4L))
    }
  }

  test("repetition score separates boilerplate from unique text") {
    // run q85's logic through the registry on a tiny in-memory table is
    // not possible (it reads the documents table), so exercise the same
    // expressions directly
    val ws = split(lower($"text"), " ")
    val rawGrams = transform(
      sequence(lit(0), greatest(size(ws) - 3, lit(0))),
      i => concat_ws(" ", slice(ws, i + lit(1), lit(3))))
    val rows = Seq(
      (1L, "spam spam spam spam spam spam spam spam"),
      (2L, "all words here are fully distinct tokens friend")
    ).toDF("doc_id", "text")
    val perGram = rows.select($"doc_id", explode(rawGrams).as("g"))
      .groupBy($"doc_id", $"g").agg(count(lit(1)).as("c"))
    val got = perGram.groupBy($"doc_id")
      .agg(sum($"c").as("t"), count(lit(1)).as("d"), max($"c").as("m"))
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // "spam"×8 → 6 trigrams, all identical
    assert(got(1L) === ((1L, 6L, 1L, 6L)))
    // 8 distinct words → 6 trigrams, all distinct
    assert(got(2L) === ((2L, 6L, 6L, 1L)))
  }

  test("weighted sampling is deterministic and weight-biased") {
    import graft.operators.WeightedSample
    val rows = (1L to 40L).map(i => (i, if (i <= 4) 1000L else 1L, "g")).toDF("id", "w", "grp")
    // determinism across physical layouts
    val a = WeightedSample.samplePerGroup(rows, "id", "w", Seq("grp"), 3, "s1")
      .select($"id").as[Long].collect().toSet
    val b = WeightedSample.samplePerGroup(rows.repartition(7), "id", "w", Seq("grp"), 3, "s1")
      .select($"id").as[Long].collect().toSet
    assert(a === b)
    // bias: 4 rows carry 1000x the weight of the other 36; across seeds
    // the top-3 sample should overwhelmingly come from the heavy rows
    val heavyHits = (0 until 20).map { s =>
      WeightedSample.samplePerGroup(rows, "id", "w", Seq("grp"), 3, s"seed$s")
        .select($"id").as[Long].collect().count(_ <= 4L)
    }.sum
    assert(heavyHits >= 50, s"expected heavy rows to dominate, got $heavyHits/60")
  }

  test("crossDupPairs (production xxhash) finds every exact cross-corpus pair") {
    import graft.functions.TextFunctions
    import graft.operators.NearDup
    val inc = sfDocs.filter($"doc_id" % 7 === 1)
    val corp = sfDocs.filter($"doc_id" % 7 =!= 1)
    def grams(df: org.apache.spark.sql.DataFrame, as: String) = df.select(
      $"doc_id".as(as),
      TextFunctions.wordNGrams(TextFunctions.words($"text"), 3).as(s"g_$as"))
    val exact = grams(inc, "i").join(grams(corp, "c"))
      .select($"i", $"c", TextFunctions.jaccard($"g_i", $"g_c").as("j"))
      .filter($"j" >= 0.5)
      .select($"i", $"c").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "fixture should contain cross-split near-dups")
    val got = NearDup.crossDupPairs(inc, corp, "doc_id", "text",
        mode = NearDup.XxHash)
      .select($"inc_id", $"corp_id").as[(Long, Long)].collect().toSet
    assert(got === exact, s"missed=${exact -- got} extra=${got -- exact}")
  }

  test("mixture: integer rate gives exactly rate copies per doc") {
    import graft.operators.Mixture
    // one source, 20 docs x 10 tokens = 200 avail; budget 600 -> rate 3.0
    val d = (1L to 20L).map(i => (i, "s", 10L)).toDF("id", "src", "tok")
    val got = Mixture.balance(d, "id", "src", "tok",
        Map("s" -> 1.0), budget = 600L, seed = "t")
      .select($"id", $"n_copies").as[(Long, Long)].collect()
    assert(got.length === 20 && got.forall(_._2 === 3L))
  }

  test("mixture: fractional rate keeps copies in {floor, ceil} and lands near target") {
    import graft.operators.Mixture
    // 100 docs x 10 tok; budget 500 -> rate 0.5: each doc 0 or 1 copies
    val d = (1L to 100L).map(i => (i, "s", 10L)).toDF("id", "src", "tok")
    val got = Mixture.balance(d, "id", "src", "tok",
        Map("s" -> 2.0), budget = 500L, seed = "t")
      .select($"n_copies").as[Long].collect()
    assert(got.forall(c => c == 0L || c == 1L))
    val tokens = got.sum * 10
    assert(tokens >= 300 && tokens <= 700, s"got $tokens tokens for target 500")
  }

  test("mixture: weights skew allocation; absent source dropped; deterministic") {
    import graft.operators.Mixture
    val d = ((1L to 50L).map(i => (i, "a", 10L)) ++
      (51L to 100L).map(i => (i, "b", 10L)) ++
      (101L to 110L).map(i => (i, "zzz", 10L))).toDF("id", "src", "tok")
    def run() = Mixture.balance(d, "id", "src", "tok",
        Map("a" -> 3.0, "b" -> 1.0), budget = 400L, seed = "t")
      .select($"id", $"src", $"n_copies").as[(Long, String, Long)].collect()
    val r1 = run(); val r2 = run()
    assert(r1.sortBy(_._1).toSeq === r2.sortBy(_._1).toSeq, "rerun must pick same docs")
    val bySrc = r1.groupBy(_._2).view.mapValues(_.map(_._3).sum * 10).toMap
    assert(bySrc.getOrElse("zzz", 0L) === 0L, "unweighted source must be dropped")
    // targets: a = 400*3/4 = 300, b = 400*1/4 = 100 (of 500 avail each)
    assert(bySrc("a") > bySrc("b") * 2,
      s"3:1 weights should skew tokens, got a=${bySrc("a")} b=${bySrc("b")}")
  }

  test("mixture: per-source aggregate rides a broadcast join, no shuffle of the corpus") {
    import graft.operators.Mixture
    val d = sfDocs.select($"doc_id", $"source", $"n_chars".cast("long").as("tok"))
    val srcs = d.select($"source").distinct().as[String].collect()
    val out = Mixture.balance(d, "doc_id", "source", "tok",
      srcs.map(_ -> 1.0).toMap, budget = 10000L, seed = "t")
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"per-source rates must broadcast, plan:\n$plan")
  }

  test("chunking: exact layout for a 10-token doc at size 5 / overlap 2") {
    import graft.operators.Chunking
    val d = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" "))).toDF("id", "text")
    val got = Chunking.chunk(d, "id", "text", chunkTokens = 5, overlap = 2)
      .select($"chunk_idx", $"start_tok", $"chunk_tok")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    // stride 3, ceil((10-2)/3) = 3 chunks; last one short
    assert(got.toSeq === Seq((0L, 0L, 5L), (1L, 3L, 5L), (2L, 6L, 4L)))
  }

  test("chunking: tiny docs yield one whole-doc chunk; corpus fully covered") {
    import graft.operators.Chunking
    val tiny = Seq((1L, "x"), (2L, "a b")).toDF("id", "text")
    val t = Chunking.chunk(tiny, "id", "text", 64, 16)
      .select($"id", $"chunk_idx", $"chunk_tok").as[(Long, Long, Long)].collect()
    assert(t.toSet === Set((1L, 0L, 1L), (2L, 0L, 2L)))
    // coverage on the real corpus: last chunk must reach the doc's end,
    // and every non-final chunk is full-size
    val docs = sfDocs.select($"doc_id", $"text")
    val byDoc = Chunking.chunk(docs, "doc_id", "text", 64, 16)
      .select($"doc_id", $"chunk_idx", $"start_tok", $"chunk_tok")
      .as[(Long, Long, Long, Long)].collect().groupBy(_._1)
    val nTok = docs.select($"doc_id", size(split(lower($"text"), " ")).cast("long"))
      .as[(Long, Long)].collect().toMap
    byDoc.foreach { case (id, chunks) =>
      val last = chunks.maxBy(_._2)
      assert(last._3 + last._4 === nTok(id), s"doc $id not covered to the end")
      chunks.filter(_._2 < last._2).foreach(c =>
        assert(c._4 === 64L, s"doc $id chunk ${c._2} not full"))
      assert(chunks.map(_._2).sorted.toSeq === (0L until chunks.length).toSeq)
    }
  }

  test("caps: prefix keep-rule honors priority order and the exact budget") {
    import graft.operators.Caps
    val d = Seq(
      (1L, "a", 3L), (2L, "a", 3L), (3L, "a", 3L),  // cum 3,6,9 -> third over
      (4L, "b", 7L), (5L, "b", 1L),                 // cum 7,8   -> second over
      (6L, "c", 9L)                                  // single over-budget row: dropped
    ).toDF("id", "src", "tok")
    val got = Caps.capPerGroup(d, Seq("src"), Seq($"id"), "tok", cap = 7L)
      .select($"id", $"cum_tok", $"is_kept").as[(Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) === ((3L, true)) && got(2L) === ((6L, true)) && got(3L) === ((9L, false)))
    assert(got(4L) === ((7L, true)) && got(5L) === ((8L, false)))
    assert(got(6L) === ((9L, false)))
    // priority flips the cut when the order reverses
    val rev = Caps.capPerGroup(d, Seq("src"), Seq($"id".desc), "tok", cap = 7L)
      .filter($"src" === "a" && $"is_kept").select($"id").as[Long].collect().toSet
    assert(rev === Set(3L, 2L))
  }

  private lazy val sfDocs = graft.sources.Tables(spark, sfDir, "documents")
}
