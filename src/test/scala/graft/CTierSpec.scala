package graft

import org.apache.spark.sql.functions._
import graft.functions.{SimHash64, TextFunctions}
import graft.operators.{Multimodal, NearDup, Similarity}
import graft.sources.Tables

/** §2.C correctness beyond the DuckDB oracle: LSH recall vs exact
  * baselines, SimHash behavior, multimodal plumbing. */
class CTierSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val docs = Tables(spark, sfDir, "documents").cache()

  test("minhash LSH (xxhash production path) finds every exact-Jaccard pair") {
    // exact ground truth at tau=0.5
    val grams = docs.select($"doc_id",
      TextFunctions.wordNGrams(TextFunctions.words($"text"), 3).as("grams"))
    val exact = grams.as("a").join(grams.as("b"), $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("a_id"), $"b.doc_id".as("b_id"),
        TextFunctions.jaccard($"a.grams", $"b.grams").as("j"))
      .filter($"j" >= 0.5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "testdata should contain planted near-dups")

    val lsh = NearDup.nearDupPairs(docs, "doc_id", "text",
        mode = NearDup.XxHash)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    // LSH verifies candidates with exact Jaccard, so no false positives;
    // with j≈0.95 planted dups and 4 bands × r=2, recall is ~1
    assert(lsh.subsetOf(exact))
    assert(lsh === exact, s"LSH missed pairs: ${exact -- lsh}")
  }

  test("native word_ngrams and minhash_md5 match their HOF reference formulations") {
    import graft.functions.TextFunctions
    val sample = docs.limit(100)
    val viaNative = sample.select($"doc_id",
        TextFunctions.wordNGrams(TextFunctions.words($"text"), 3).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val viaHof = sample.select($"doc_id",
        TextFunctions.wordNGramsHof(TextFunctions.words($"text"), 3).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(viaNative === viaHof)
    // short-doc edges
    val edge = Seq((1L, "a"), (2L, "a b"), (3L, "a b c"), (4L, "a b c d"), (5L, "x x x x"))
      .toDF("id", "t")
    val en = edge.select($"id", TextFunctions.wordNGrams(split($"t", " "), 3).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val eh = edge.select($"id", TextFunctions.wordNGramsHof(split($"t", " "), 3).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(en === eh)
    assert(en(1L) === Seq("a") && en(5L) === Seq("x x x"))

    // minhash_md5 fused expression vs per-seed HOF minima
    import org.apache.spark.sql.functions.{array, array_min, transform, md5, concat, lit}
    val g = sample.select($"doc_id",
      TextFunctions.wordNGrams(TextFunctions.words($"text"), 3).as("grams"))
    val fused = g.select($"doc_id",
        graft.operators.NearDup.minhashSignature($"grams", 8, graft.operators.NearDup.Md5Hash).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val hof = g.select($"doc_id", array((0 until 8).map(i =>
        array_min(transform($"grams", x => md5(concat(lit(s"$i:"), x))))): _*).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(fused === hof)

    // jaccard_sim fused expression vs intersect/union formulation
    val jp = g.as("a").join(g.as("b"), $"a.doc_id" < $"b.doc_id" && $"b.doc_id" < 40)
      .select(TextFunctions.jaccard($"a.grams", $"b.grams").as("n"),
        TextFunctions.jaccardHof($"a.grams", $"b.grams").as("h"))
      .collect()
    assert(jp.nonEmpty)
    jp.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
  }

  test("simhash64: deterministic, permutation-robust, discriminative") {
    SimHash64.register(spark)
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "dog lazy the over jumps fox brown quick the"), // permutation
      (4L, "completely different words about spark engines and shuffles"))
      .toDF("id", "text")
      .withColumn("sh", expr("simhash64(split(lower(text), ' '))"))
    val m = df.select("id", "sh").as[(Long, Long)].collect().toMap
    assert(m(1L) === m(2L)) // deterministic
    assert(m(1L) === m(3L)) // bag-of-words: order-invariant
    val hamming = java.lang.Long.bitCount(m(1L) ^ m(4L))
    assert(hamming > 10, s"unrelated docs should differ, hamming=$hamming")
  }

  test("simhash_md5: token hash matches the first 15 hex chars of md5 (oracle contract)") {
    import graft.functions.SimHashMd5
    val md = java.security.MessageDigest.getInstance("MD5")
    for (tok <- Seq("alpha", "", "fuel", "42:x", "ação")) {
      val got = SimHashMd5.hash60(md,
        org.apache.spark.unsafe.types.UTF8String.fromString(tok))
      val hex = md.digest(tok.getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString.take(15)
      assert(got === java.lang.Long.parseLong(hex, 16), s"token=$tok")
    }
    // same algebra as simhash64, just a different hash primitive
    SimHashMd5.register(spark)
    val df = Seq(
        (1L, "the quick brown fox"), (2L, "fox brown quick the"),
        (3L, "entirely unrelated content here"))
      .toDF("id", "text")
      .withColumn("sh", expr("simhash_md5(split(lower(text), ' '))"))
    val m = df.select("id", "sh").as[(Long, Long)].collect().toMap
    assert(m(1L) === m(2L))
    assert((m(1L) >>> 60) === 0L) // 60-bit range
    assert(java.lang.Long.bitCount(m(1L) ^ m(3L)) > 8)
  }

  test("simhash codegen and interpreted paths agree") {
    SimHash64.register(spark)
    val tokens = Seq("alpha", "beta", "gamma")
    val viaSql = Seq(tokens.mkString(" ")).toDF("t")
      .selectExpr("simhash64(split(t, ' ')) AS sh").head.getLong(0)
    val direct = SimHash64.compute(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        tokens.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray))
    assert(viaSql === direct)
  }

  test("fused lsh_buckets expression matches the per-table HOF bucket columns") {
    val emb = Tables(spark, sfDir, "embeddings").limit(100)
    val tables = Similarity.hyperplaneTables(6, 4, 64)
    val viaNative = emb.select($"vec_id",
        Similarity.lshBucketsAll($"embedding", tables).as("bs"))
      .as[(Long, Seq[Long])].collect().toMap
    val hofCols = tables.toSeq.map(p => Similarity.lshBucket($"embedding", p))
    val viaHof = emb.select($"vec_id", array(hofCols: _*).as("bs"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(viaNative === viaHof)
  }

  test("blocked cosineNearDupPairs matches the declarative self-join (bit-exact)") {
    val emb = Tables(spark, sfDir, "embeddings")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("a_id", "b_id", "cosine").as[(Long, Long, Double)].collect().toSet
    val default = canon(Similarity.cosineNearDupPairs(emb, "vec_id", "embedding", 0.45))
    val blocked = canon(Similarity.cosineNearDupPairsBlocked(emb, "vec_id", "embedding", 0.45))
    val joined = canon(Similarity.cosineNearDupPairsJoin(emb, "vec_id", "embedding", 0.45))
    assert(default === joined)
    assert(blocked === joined)
    assert(blocked.nonEmpty)
  }

  test("blocked variant: null rows dropped like the join form; oversized input fails fast") {
    val withNulls = Seq(
        (java.lang.Long.valueOf(1L), Array(1.0f, 0.0f)),
        (java.lang.Long.valueOf(2L), Array(1.0f, 0.1f)),
        (null.asInstanceOf[java.lang.Long], Array(1.0f, 0.2f)),
        (java.lang.Long.valueOf(4L), null.asInstanceOf[Array[Float]]))
      .toDF("id", "v")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val blocked = canon(Similarity.cosineNearDupPairsBlocked(withNulls, "id", "v", 0.9))
    val joined = canon(Similarity.cosineNearDupPairsJoin(withNulls, "id", "v", 0.9))
    assert(blocked === joined)
    assert(blocked === Set((1L, 2L)))

    val emb = Tables(spark, sfDir, "embeddings")
    val ex = intercept[IllegalArgumentException] {
      Similarity.cosineNearDupPairsBlocked(emb, "vec_id", "embedding", 0.45,
        maxIndexRows = 10)
    }
    assert(ex.getMessage.contains("maxIndexRows"))
  }

  test("lshNearDupPairs (candidates + exact verify) equals exact all-pairs at tau=0.45") {
    val emb = Tables(spark, sfDir, "embeddings")
    val tables = Similarity.hyperplaneTables(24, 3, 64)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("a_id", "b_id", "cosine").as[(Long, Long, Double)].collect().toSet
    val viaLsh = canon(Similarity.lshNearDupPairs(emb, "vec_id", "embedding", 0.45, tables))
    val exact = canon(Similarity.cosineNearDupPairs(emb, "vec_id", "embedding", 0.45))
    assert(viaLsh === exact)
    assert(viaLsh.nonEmpty)
  }

  test("minhash LSH hot bucket is capped with overflow reported, never silently") {
    // 200 identical texts: every band key collides for all of them — the
    // classic degenerate bucket whose pair expansion is O(n²). Two more
    // identical docs form a small, legitimate dup cluster that must
    // survive the cap.
    val hot = (0 until 200).map(i => (i.toLong, "same exact text repeated for every document here"))
    val pairDup = Seq((900L, "one completely unrelated document about spark shuffles"),
      (901L, "one completely unrelated document about spark shuffles"))
    val docs = (hot ++ pairDup).toDF("doc_id", "text")
    val capped = NearDup.nearDupPairs(docs, "doc_id", "text", maxBucket = 50)
    // only the small cluster's pair survives; the hot cluster is dropped.
    // NOTE: the action must run on `capped` itself — a derived Dataset
    // would execute its own QueryExecution and leave this one's observed
    // metrics unset.
    assert(capped.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
      Set((900L, 901L)))
    val metrics = NearDup.bucketCapMetrics(capped).head
    assert(metrics.getAs[Long]("dropped_buckets") >= 1L)
    assert(metrics.getAs[Long]("dropped_rows") >= 200L)
    assert(metrics.getAs[Long]("largest_bucket") === 200L)
    // the standalone accounting query reports the same dropped buckets
    // (it survives even the full-drop case, where AQE empty-relation
    // propagation erases the in-plan observation)
    val sig = NearDup.withSignature(docs, "doc_id", "text")
    val overflow = NearDup.overflowBuckets(sig, "doc_id", "__sig", 4, 2, maxBucket = 50)
      .as[(String, Long)].collect()
    assert(overflow.nonEmpty)
    overflow.foreach { case (_, n) => assert(n === 200L) }
    // uncapped the same input explodes into all the hot pairs too
    val uncapped = NearDup.nearDupPairs(docs, "doc_id", "text", maxBucket = Int.MaxValue)
    assert(uncapped.count() === 200L * 199 / 2 + 1)
  }

  test("hyperplane LSH hot bucket is capped with overflow reported") {
    // 100 identical vectors (one degenerate bucket per table) plus one
    // small genuine near-dup pair in a different direction
    val vec = Seq.fill(64)(0.5f)
    val other = Seq.tabulate(64)(i => if (i % 2 == 0) 1.0f else -1.0f)
    val emb = ((0 until 100).map(i => (i.toLong, vec)) ++
      Seq((900L, other), (901L, other))).toDF("vec_id", "embedding")
    val tables = Similarity.hyperplaneTables(4, 3, 64)
    val capped = Similarity.lshNearDupPairs(emb, "vec_id", "embedding", 0.9, tables,
      maxBucket = 10)
    assert(capped.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
      Set((900L, 901L)))
    val metrics = NearDup.bucketCapMetrics(capped).head
    assert(metrics.getAs[Long]("dropped_buckets") >= 1L)
    assert(metrics.getAs[Long]("largest_bucket") >= 100L)
    val overflow = Similarity.lshOverflowBuckets(emb, "vec_id", "embedding", tables,
      maxBucket = 10).as[(Int, Long, Long)].collect()
    assert(overflow.nonEmpty)
    overflow.foreach { case (_, _, n) => assert(n >= 100L) }
    // default cap leaves well-behaved buckets alone: identical vectors
    // are cosine-1 pairs and all survive
    val default = Similarity.lshNearDupPairs(emb, "vec_id", "embedding", 0.9, tables)
    assert(default.count() === 100L * 99 / 2 + 1)
  }

  test("multi-table cosine LSH recall vs brute force (>= 0.4 top-3)") {
    val emb = Tables(spark, sfDir, "embeddings")
    val queries = emb.filter($"vec_id" < 30)
    val exact = Similarity.bruteForceTopK(queries, emb, "vec_id", "vec_id", "embedding", 3)
      .select("q_id", "c_id").as[(Long, Long)].collect().toSet
    val tables = Similarity.hyperplaneTables(10, 4, 64)
    val approx = Similarity.lshTopK(queries, emb, "vec_id", "vec_id", "embedding", 3, tables)
      .select("q_id", "c_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    // random gaussian embeddings are LSH's worst case (neighbors are only
    // weakly correlated); multi-table still has to beat chance soundly
    assert(recall >= 0.4, s"recall=$recall")
  }

  test("IVF cosine recall vs brute force (>= 0.5 top-3 at nprobe=4/16)") {
    val emb = Tables(spark, sfDir, "embeddings")
    val queries = emb.filter($"vec_id" < 30)
    val exact = Similarity.bruteForceTopK(queries, emb, "vec_id", "vec_id", "embedding", 3)
      .select("q_id", "c_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.ivfTopK(queries, emb, "vec_id", "vec_id", "embedding",
        k = 3, nlist = 16, nprobe = 4)
      .select("q_id", "c_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall=$recall")
    // determinism: same seed, same result
    val again = Similarity.ivfTopK(queries, emb, "vec_id", "vec_id", "embedding",
        k = 3, nlist = 16, nprobe = 4)
      .select("q_id", "c_id").as[(Long, Long)].collect().toSet
    assert(approx === again)
  }

  test("fixed-codebook IVF: deterministic, candidates subset of brute force, sane recall") {
    val emb = Tables(spark, sfDir, "embeddings")
    val queries = emb.filter($"vec_id" < 30)
    val run1 = Similarity.ivfTopKFixedCodebook(queries, emb, "vec_id", "vec_id",
        "embedding", k = 3, nlist = 16, nprobe = 4)
      .select("q_id", "rank", "c_id").as[(Long, Long, Long)].collect().toSet
    val run2 = Similarity.ivfTopKFixedCodebook(queries, emb, "vec_id", "vec_id",
        "embedding", k = 3, nlist = 16, nprobe = 4)
      .select("q_id", "rank", "c_id").as[(Long, Long, Long)].collect().toSet
    assert(run1 === run2) // fully deterministic, no training
    val exact = Similarity.bruteForceTopK(queries, emb, "vec_id", "vec_id", "embedding", 3)
      .select("q_id", "c_id").as[(Long, Long)].collect().toSet
    val approx = run1.map { case (q, _, c) => (q, c) }
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.3, s"recall=$recall") // 4/16 cells probed, sampled codebook
  }

  test("cosine of identical vectors is 1") {
    val df = Seq((1L, Seq(1.0f, 2.0f, 3.0f))).toDF("id", "v")
    val c = df.select(Similarity.cosine($"v", $"v")).head.getDouble(0)
    assert(math.abs(c - 1.0) < 1e-12)
  }

  test("codegen'd cosine_sim is bit-identical to the HOF reference fold") {
    val emb = Tables(spark, sfDir, "embeddings")
    val pairs = emb.as("a").join(emb.as("b"),
        $"a.vec_id" < $"b.vec_id" && $"b.vec_id" < 40)
      .select(
        Similarity.cosine($"a.embedding", $"b.embedding").as("fast"),
        Similarity.cosineHof($"a.embedding", $"b.embedding").as("ref"))
      .collect()
    assert(pairs.nonEmpty)
    pairs.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
  }

  test("native sq_dist/vec_norm/dot_prod are bit-identical to their HOF specs") {
    // r19: the IVF/PQ hot paths moved from interpreted HOF folds to
    // fused codegen'd expressions — same sequential double folds, so
    // every value must be BIT-identical (the oracle replays the folds)
    val emb = Tables(spark, sfDir, "embeddings")
    import org.apache.spark.sql.graft.Bridge
    import graft.functions.{AdcSumNative, SqDistNative, VecNormNative}
    def nrm(c: org.apache.spark.sql.Column) =
      Bridge.column(VecNormNative(Bridge.expression(c)))
    def sqd(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      Bridge.column(SqDistNative(Bridge.expression(a), Bridge.expression(b)))
    val pairs = emb.as("a").join(emb.as("b"),
        $"a.vec_id" < $"b.vec_id" && $"b.vec_id" < 40)
      .select(
        sqd($"a.embedding", $"b.embedding").as("sq_fast"),
        Similarity.sqDistHof($"a.embedding", $"b.embedding").as("sq_ref"),
        nrm($"a.embedding").as("n_fast"),
        Similarity.normDHof($"a.embedding").as("n_ref"),
        Similarity.dotD($"a.embedding", $"b.embedding").as("d_fast"),
        Similarity.dotDHof($"a.embedding", $"b.embedding").as("d_ref"))
      .collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      assert(r.getDouble(0) === r.getDouble(1))
      assert(r.getDouble(2) === r.getDouble(3))
      assert(r.getDouble(4) === r.getDouble(5))
    }
    // long-code norm: square in the integral domain, then cast — the
    // int8 rerank fold
    val codes = Seq((1L, Seq(-127L, 5L, 0L, 126L))).toDF("id", "q")
    val got = codes.select(nrm($"q"),
      sqrt(aggregate($"q", lit(0.0), (a, q) => a + (q * q).cast("double"))))
      .head
    assert(got.getDouble(0) === got.getDouble(1))
    // ADC fold vs the element_at HOF spec, including the null-code case
    val m = 4; val ksub = 3
    val tab = (1 to m * ksub).map(i => i * 1.5)
    val adc = Seq((Seq(2, 0, 1, 2), tab)).toDF("__codes", "__qtab")
      .select(
        Bridge.column(AdcSumNative(Bridge.expression($"__codes"),
          Bridge.expression($"__qtab"), m, ksub)).as("fast"),
        aggregate(zip_with(sequence(lit(0), lit(m - 1)), $"__codes",
            (j, code) => element_at($"__qtab", j * ksub + code + 1)),
          lit(0.0), (a, x) => a + x).as("ref"))
      .head
    assert(adc.getDouble(0) === adc.getDouble(1))
  }

  test("multimodal blob features: real schema, deterministic stub decode") {
    val blobs = Multimodal.withBlob(docs.limit(10), "doc_id", "text")
    assert(blobs.schema("blob").dataType ===
      org.apache.spark.sql.types.BinaryType)
    val feats = Multimodal.extractFeatures(blobs, "doc_id", bins = 16)
    val rows = feats.orderBy("doc_id").collect()
    assert(rows.length === 10)
    rows.foreach { r =>
      val hist = r.getSeq[Double](2)
      assert(hist.length === 16)
      assert(math.abs(hist.sum - 1.0) < 1e-9) // normalized histogram
    }
    // deterministic: run twice, same result
    val again = Multimodal.extractFeatures(blobs, "doc_id", bins = 16)
      .orderBy("doc_id").collect()
    assert(rows.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }

  test("multimodal frame sampling covers exactly the in-frame bytes; resize re-bins exactly") {
    val blobs = Multimodal.withBlob(docs.limit(50), "doc_id", "text").cache()
    val frames = Multimodal.sampleFrames(blobs, "doc_id", frameSize = 64, stride = 128)
    val got = frames.groupBy("doc_id").agg(sum("frame_len").as("covered"))
      .as[(Long, Long)].collect().toMap
    val want = blobs.select($"doc_id", $"byte_len").as[(Long, Long)].collect()
      .map { case (id, n) =>
        id -> (0L until math.max(n, 1L) by 128L).map(off => math.min(64L, n - off)).sum
      }.toMap
    assert(got === want)

    // resize 16 -> 4: each output bin is the left-fold sum of its 4 inputs
    val feats = Multimodal.extractFeatures(blobs, "doc_id", bins = 16)
    val resized = Multimodal.resizeFeatures(feats, "features", 4)
      .select("doc_id", "features").as[(Long, Seq[Double])].collect().toMap
    val expect = feats.select("doc_id", "features").as[(Long, Seq[Double])].collect()
      .map { case (id, h) => id -> h.grouped(4).map(_.foldLeft(0.0)(_ + _)).toSeq }.toMap
    assert(resized === expect)
    resized.values.foreach(h => assert(h.length === 4))

    // fail fast when the length is not a multiple of k (never silently
    // drop trailing elements)
    val bad = Seq((1L, Seq.fill(18)(0.5))).toDF("doc_id", "features")
    val ex = intercept[Exception] {
      Multimodal.resizeFeatures(bad, "features", 4).collect()
    }
    assert(ex.getMessage.contains("not a multiple") ||
      Option(ex.getCause).exists(_.getMessage.contains("not a multiple")))
  }

  test("phash near-dup: banded join equals brute-force hamming (pigeonhole recall)") {
    val blobs = Multimodal.withBlob(docs, "doc_id", "text").cache()
    val banded = Multimodal.phashNearDupPairs(blobs, "doc_id", tau = 11)
      .select($"a_id", $"b_id", $"hamming").as[(Long, Long, Long)]
      .collect().toSet
    // brute force from the same signatures
    val sig = Multimodal.positionalSignature(blobs, "doc_id", 61)
      .select($"doc_id", Multimodal.dHash60($"signature").as("ph"))
      .as[(Long, Long)].collect()
    val brute = (for {
      (a, pa) <- sig; (b, pb) <- sig if a < b
      h = java.lang.Long.bitCount(pa ^ pb) if h <= 11
    } yield (a, b, h.toLong)).toSet
    assert(banded === brute)
    assert(brute.nonEmpty, "fixture should contain phash near-dups")
    // 12 bands x 5 bits cannot guarantee recall past tau=11
    val e = intercept[IllegalArgumentException] {
      Multimodal.phashNearDupPairs(blobs, "doc_id", tau = 12)
    }
    assert(e.getMessage.contains("tau"))
    // dHash parity: an independent scalar re-computation of one signature
    val one = Multimodal.positionalSignature(blobs.limit(1), "doc_id", 61)
      .select($"doc_id", $"signature").as[(Long, Seq[Double])].head()
    val want = (0 until 60).foldRight(0L)((j, acc) =>
      acc * 2 + (if (one._2(j) > one._2(j + 1)) 1L else 0L))
    val got = Multimodal.positionalSignature(blobs.limit(1), "doc_id", 61)
      .select(Multimodal.dHash60($"signature")).as[Long].head()
    assert(got === want)
  }

  test("semanticDedup with one cell equals exact all-pairs keep-first dedup") {
    val emb = Tables(spark, sfDir, "embeddings")
    val exactPairs = Similarity
      .cosineNearDupPairsJoin(emb, "vec_id", "embedding", tau = 0.45)
      .select($"b_id").as[Long].collect().toSet // b_id = the higher, dropped id
    val got = Similarity
      .semanticDedup(emb, "vec_id", "embedding", tau = 0.45, nlist = 1)
      .select($"vec_id", $"is_kept").as[(Long, Boolean)].collect()
    assert(got.length === emb.count())
    val dropped = got.filter(!_._2).map(_._1).toSet
    assert(dropped === exactPairs,
      s"missed=${exactPairs -- dropped} extra=${dropped -- exactPairs}")
  }

  test("semanticDedup: dup_of is in the same cell, lower id, and cosine >= tau") {
    val emb = Tables(spark, sfDir, "embeddings")
    val out = Similarity
      .semanticDedup(emb, "vec_id", "embedding", tau = 0.45, nlist = 16)
      .collect()
    val cellOf = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.filter(!_.getBoolean(2)).foreach { r =>
      val (id, dupOf, cos) = (r.getLong(0), r.getLong(3), r.getDouble(4))
      assert(dupOf < id, s"$id kept-first violated")
      assert(cellOf(dupOf) === cellOf(id), s"$id matched across cells")
      assert(cos >= 0.45)
    }
    out.filter(_.getBoolean(2)).foreach(r => assert(r.isNullAt(3) && r.isNullAt(4)))
  }

  test("semanticDedup caps hot cells: bounded pairs + observed overflow") {
    // Adversarial collapsed embedding space: every vector identical, so
    // the whole corpus lands in ONE cell and the uncapped in-cell
    // self-join would emit n(n-1)/2 pairs. With maxCell below n the cell
    // must be excluded (rows come back kept, undeduped) and the overflow
    // must be reported — never silent.
    val n = 500
    val collapsed = spark.range(n)
      .select($"id".as("vec_id"),
        typedlit(Seq.fill(8)(1.0f)).as("embedding"))
    val out = Similarity.semanticDedup(
      collapsed, "vec_id", "embedding", tau = 0.9, nlist = 4, maxCell = 100)
    val rows = out.collect()
    assert(rows.length === n)
    assert(rows.forall(_.getBoolean(2)), "capped cells must return rows undeduped")
    val metrics = NearDup.bucketCapMetrics(out)
    assert(metrics.nonEmpty, "overflow must be observed")
    val m = metrics.head
    assert(m.getAs[Long]("dropped_buckets") === 1L)
    assert(m.getAs[Long]("dropped_rows") === n.toLong)
    assert(m.getAs[Long]("largest_bucket") === n.toLong)
    // standalone audit agrees
    val audit = Similarity.semanticOverflowCells(
      collapsed, "vec_id", "embedding", nlist = 4, maxCell = 100).collect()
    assert(audit.length === 1 && audit.head.getAs[Long]("n_ids") === n.toLong)
    // same input under the cap dedups normally (keep-first: only id 0 kept)
    val uncapped = Similarity.semanticDedup(
        collapsed, "vec_id", "embedding", tau = 0.9, nlist = 4, maxCell = n)
      .collect()
    assert(uncapped.count(_.getBoolean(2)) === 1)
  }

  test("semanticDedup accepts an offline-trained codebook") {
    val emb = Tables(spark, sfDir, "embeddings")
    // the bootstrap codebook, handed in as an explicit (cell, vec) frame
    val cb = emb.orderBy($"vec_id").limit(16)
      .select($"vec_id".as("cell"), $"embedding".as("vec"))
    val viaParam = Similarity.semanticDedup(
        emb, "vec_id", "embedding", tau = 0.45, codebook = Some(cb))
      .orderBy($"vec_id").collect()
    val viaBootstrap = Similarity.semanticDedup(
        emb, "vec_id", "embedding", tau = 0.45, nlist = 16)
      .orderBy($"vec_id").collect()
    assert(viaParam === viaBootstrap)
  }

  test("nlistFor grows with the corpus and stays bounded") {
    assert(Similarity.nlistFor(1000) === 16)         // floor
    assert(Similarity.nlistFor(40960) === 16)        // 10 cells < floor
    assert(Similarity.nlistFor(4096L * 1000) === 1000)
    assert(Similarity.nlistFor(Long.MaxValue / 4) === (1 << 20)) // ceiling
  }

  test("nlistFor rejects bad inputs and never overflows") {
    intercept[IllegalArgumentException](Similarity.nlistFor(100, targetCell = 0))
    intercept[IllegalArgumentException](Similarity.nlistFor(100, targetCell = -7))
    intercept[IllegalArgumentException](Similarity.nlistFor(-1))
    // rows + targetCell - 1 would wrap negative here; the ceiling must hold
    assert(Similarity.nlistFor(Long.MaxValue, targetCell = 1) === (1 << 20))
    assert(Similarity.nlistFor(0) === 16)
  }

  test("semanticDedup output schema is identical across bootstrap and codebook modes") {
    val emb = Tables(spark, sfDir, "embeddings")
    val cb = emb.orderBy($"vec_id").limit(16)
      .select($"vec_id".cast("int").as("cell"), $"embedding".as("vec")) // non-long cell on purpose
    val viaParam = Similarity.semanticDedup(
      emb, "vec_id", "embedding", tau = 0.45, codebook = Some(cb))
    val viaBootstrap = Similarity.semanticDedup(
      emb, "vec_id", "embedding", tau = 0.45, nlist = 16)
    assert(viaParam.schema === viaBootstrap.schema,
      s"cell type must not depend on codebook mode:\n${viaParam.schema}\n${viaBootstrap.schema}")
    assert(viaBootstrap.schema("cell").dataType ===
      org.apache.spark.sql.types.LongType)
  }

  test("semanticDedup assignment rides a one-row broadcast, not a shuffle") {
    val emb = Tables(spark, sfDir, "embeddings")
    val plan = Similarity
      .semanticDedup(emb, "vec_id", "embedding", tau = 0.45, nlist = 16)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"codebook must broadcast:\n$plan")
  }

  test("ExactSubstr removes offset repeats BlockDedup's aligned blocks cannot") {
    import graft.operators.ExactSubstr
    // doc 2 repeats doc 1's 8-token run at OFFSET 1 — no aligned block
    // matches, but the sliding window does; doc 3 is a full duplicate
    // and must empty out entirely; doc 1 (first occurrence) survives
    val docs = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "X a b c d e f g h Z"),
      (3L, "a b c d e f g h i j"),
      (4L, "short doc")).toDF("doc_id", "text")
    val out = ExactSubstr.dropDuplicateSpans(docs, "doc_id", "text",
        windowTokens = 8)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out === Seq(
      (1L, "a b c d e f g h i j", 10L, 0L),
      (2L, "X Z", 10L, 8L),
      (3L, "", 10L, 10L),
      (4L, "short doc", 2L, 0L)))
    // determinism under repartitioning: winner election and marks are
    // pure (hash, id, pos) arithmetic
    val out2 = ExactSubstr.dropDuplicateSpans(docs.repartition(7),
        "doc_id", "text", windowTokens = 8)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out2 === out)
    // case-insensitive identity, case-preserving output
    val cased = Seq(
      (1L, "A B C D E F G H"),
      (2L, "a b c d e f g h")).toDF("doc_id", "text")
    val got = ExactSubstr.dropDuplicateSpans(cased, "doc_id", "text", 8)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got === Seq(
      (1L, "A B C D E F G H", 8L, 0L),
      (2L, "", 8L, 8L)))
    // null-text documents pass through as empty rows — every input id
    // appears in the output (r12; the r11 shape dropped them)
    val withNull = Seq((1L, Option("a b c d e f g h")), (2L, None))
      .toDF("doc_id", "text")
    val gotNull = ExactSubstr.dropDuplicateSpans(withNull, "doc_id", "text", 8)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(gotNull === Seq(
      (1L, "a b c d e f g h", 8L, 0L),
      (2L, "", 0L, 0L)))
    // overlapping duplicated windows: doc 6 repeats a 12-token run of
    // doc 5, so its stride-1 non-winner windows overlap 5-deep — the
    // merged-interval marks must still cut exactly the covered span
    val overlap = Seq(
      (5L, "a b c d e f g h i j k l"),
      (6L, "Y a b c d e f g h i j k l Z")).toDF("doc_id", "text")
    val gotOv = ExactSubstr.dropDuplicateSpans(overlap, "doc_id", "text", 8)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(gotOv === Seq(
      (5L, "a b c d e f g h i j k l", 12L, 0L),
      (6L, "Y Z", 14L, 12L)))
  }
}
