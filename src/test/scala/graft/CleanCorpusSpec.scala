package graft

import org.apache.spark.sql.functions._
import graft.operators.{CleanCorpus, NearDup}
import graft.sources.Tables

/** The composed corpus-cleaning pipeline: stage semantics, the
  * no-surviving-near-dup invariant, and hash-family independence. */
class CleanCorpusSpec extends SparkSpecBase {
  import spark.implicits._

  private def docs = Tables(spark, sfDir, "documents")

  test("cleaned corpus satisfies every stage's predicate") {
    val cleaned = CleanCorpus.clean(docs, "doc_id", "text")
    val ann = CleanCorpus.annotated(cleaned, "text")
    assert(ann.filter($"__predicted" =!= "en" || $"__quality" < 0.5).count() === 0)
    // exact dedup held: canonical fingerprints are unique
    val fps = cleaned.select(
      graft.functions.TextFunctions.canonicalFingerprint($"text").as("fp"))
    assert(fps.count() === fps.distinct().count())
    assert(cleaned.count() > 0)
  }

  test("no >= tau near-dup pair survives among kept documents (greedy invariant)") {
    val cleaned = CleanCorpus.clean(docs, "doc_id", "text")
    val remaining = NearDup.nearDupPairs(cleaned, "doc_id", "text")
    assert(remaining.count() === 0)
  }

  test("md5 and xxhash modes keep the same documents on the fixture") {
    def ids(mode: NearDup.HashMode) =
      CleanCorpus.clean(docs, "doc_id", "text", mode = mode)
        .select("doc_id").as[Long].collect().toSet
    assert(ids(NearDup.Md5Hash) === ids(NearDup.XxHash))
  }

  test("stageCounts is monotone and consistent with clean()") {
    val counts = CleanCorpus.stageCounts(docs, "doc_id", "text")
      .orderBy("stage").as[(String, Long)].collect()
    assert(counts.map(_._1).toSeq ===
      Seq("0_input", "1_lang", "2_quality", "3_exact_dedup", "4_near_dedup"))
    val ns = counts.map(_._2)
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b }, ns.toSeq)
    assert(ns.last === CleanCorpus.clean(docs, "doc_id", "text").count())
  }
}
