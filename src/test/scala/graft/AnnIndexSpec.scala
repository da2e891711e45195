package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.sources.{CommitLog, Tables}

/** Persisted IVF-PQ index (Similarity.buildIvfPqIndex/searchIvfPqIndex):
  * bit-parity with the on-the-fly pipeline, the inverted-list file
  * seek, and deterministic codebook selection. */
class AnnIndexSpec extends SparkSpecBase {
  import spark.implicits._

  private def emb = Tables(spark, sfDir, "embeddings")

  private def tmpRoot(prefix: String): String =
    Files.createTempDirectory(prefix).toString + "/ix"

  test("index search is bit-identical to the on-the-fly ivfPqTopK") {
    val root = tmpRoot("ann-parity")
    Similarity.buildIvfPqIndex(emb, "vec_id", "embedding", root,
      nlist = 16, m = 8, ksub = 16, dim = 64)
    val q = emb.filter(col("vec_id") < 20)
    val fromIndex = Similarity.searchIvfPqIndex(spark, root, q,
        "vec_id", "embedding", k = 3, nprobe = 4)
      .as[(Long, Int, Long, Double)].collect().sorted.toSeq
    val onTheFly = Similarity.ivfPqTopK(q, emb, "vec_id", "vec_id",
        "embedding", k = 3, nlist = 16, nprobe = 4, m = 8, ksub = 16, dim = 64)
      .as[(Long, Int, Long, Double)].collect().sorted.toSeq
    assert(fromIndex.nonEmpty && fromIndex === onTheFly)
  }

  test("search reads only the probed cells' postings files (inverted-list seek)") {
    val root = tmpRoot("ann-seek")
    Similarity.buildIvfPqIndex(emb, "vec_id", "embedding", root,
      nlist = 16, m = 8, ksub = 16, dim = 64)
    val allPostings = CommitLog(spark, s"$root/postings").read()
      .inputFiles.length
    // one query, two probes → at most two cells' files in the scan
    val res = Similarity.searchIvfPqIndex(spark, root,
      emb.filter(col("vec_id") === 0L), "vec_id", "embedding",
      k = 3, nprobe = 2)
    val touched = res.inputFiles.count(_.contains("/postings/"))
    assert(touched <= 2 && touched < allPostings)
    assert(res.count() === 3L)
  }

  test("non-default nlist != ksub still selects the lowest-id codebooks") {
    val root = tmpRoot("ann-cb")
    Similarity.buildIvfPqIndex(emb, "vec_id", "embedding", root,
      nlist = 4, m = 8, ksub = 16, dim = 64)
    val lowest = emb.select($"vec_id").orderBy($"vec_id")
      .limit(16).as[Long].collect().toSeq
    val cb = CommitLog(spark, s"$root/codebook").read()
    assert(cb.filter($"kind" === "coarse").select($"cell")
      .as[Long].collect().sorted.toSeq === lowest.take(4))
    assert(cb.filter($"kind" === "pq").select($"cell")
      .as[Long].collect().sorted.toSeq === lowest)
    // and the search against this index agrees with the on-the-fly
    // pipeline at the same non-default parameters (ADVICE r7: limit
    // without order could diverge here before the re-order fix)
    val q = emb.filter(col("vec_id") < 10)
    val fromIndex = Similarity.searchIvfPqIndex(spark, root, q,
        "vec_id", "embedding", k = 3, nprobe = 2)
      .as[(Long, Int, Long, Double)].collect().sorted.toSeq
    val onTheFly = Similarity.ivfPqTopK(q, emb, "vec_id", "vec_id",
        "embedding", k = 3, nlist = 4, nprobe = 2, m = 8, ksub = 16, dim = 64)
      .as[(Long, Int, Long, Double)].collect().sorted.toSeq
    assert(fromIndex === onTheFly)
  }

  test("rebuilding commits a new version; the index root stays consistent") {
    val root = tmpRoot("ann-rebuild")
    Similarity.buildIvfPqIndex(emb, "vec_id", "embedding", root,
      nlist = 16, m = 8, ksub = 16, dim = 64)
    Similarity.buildIvfPqIndex(emb, "vec_id", "embedding", root,
      nlist = 16, m = 8, ksub = 16, dim = 64)
    assert(CommitLog(spark, s"$root/postings").snapshot().version === 1L)
    val res = Similarity.searchIvfPqIndex(spark, root,
      emb.filter(col("vec_id") < 5), "vec_id", "embedding", k = 3, nprobe = 4)
    assert(res.count() === 15L)
  }
}
