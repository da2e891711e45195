package graft

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** The engine-native functions are registered in the session's function
  * registry (Sessions.local), so the FULL SQL surface — spark.sql over
  * temp views — can use them interchangeably with the DataFrame API. A
  * reference user writing plain SQL gets the same codegen'd expressions. */
class SqlSurfaceSpec extends SparkSpecBase {
  import spark.implicits._

  test("native functions are callable from spark.sql and match the DataFrame API") {
    Tables(spark, sfDir, "embeddings").createOrReplaceTempView("emb")
    Tables(spark, sfDir, "documents").createOrReplaceTempView("docs")

    val viaSql = spark.sql(
      """SELECT a.vec_id, cosine_sim(a.embedding, b.embedding) AS c
        FROM emb a JOIN emb b ON b.vec_id = a.vec_id + 1
        WHERE a.vec_id < 20 ORDER BY a.vec_id""").collect()
    val viaDf = {
      val e = Tables(spark, sfDir, "embeddings")
      e.as("a").filter($"a.vec_id" < 20)
        .join(e.as("b"), $"b.vec_id" === $"a.vec_id" + 1)
        .select($"a.vec_id",
          graft.operators.Similarity.cosine($"a.embedding", $"b.embedding").as("c"))
        .orderBy($"a.vec_id").collect()
    }
    assert(viaSql.toSeq === viaDf.toSeq)

    val text = spark.sql(
      """SELECT doc_id,
          simhash64(split(lower(text), ' ')) AS sh,
          word_ngrams_3(split(lower(text), ' ')) AS grams,
          jaccard_sim(split(lower(text), ' '), split(lower(text), ' ')) AS self_j,
          minhash_md5_8(word_ngrams_3(split(lower(text), ' '))) AS sig
        FROM docs WHERE doc_id < 5 ORDER BY doc_id""").collect()
    assert(text.length === 5)
    // self-jaccard is exactly 1 for any non-empty token set
    text.foreach(r => assert(r.getDouble(3) === 1.0))
    // signature has the configured k
    text.foreach(r => assert(r.getSeq[String](4).length === 8))
  }
}
