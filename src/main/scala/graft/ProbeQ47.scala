package graft
// temporary profiling probe for q47's stages
object ProbeQ47 {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val spark = Sessions.local("probe47")
    import spark.implicits._
    val sfDir = "/root/testdata/sf0.1"
    val docs = graft.sources.Tables(spark, sfDir, "documents")
    docs.count()
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[p] $name: ${(System.nanoTime()-t0)/1e9}%.2f s ($n rows)")
    }
    val grams = docs.select($"doc_id",
      graft.functions.TextFunctions.wordNGrams(
        graft.functions.TextFunctions.words($"text"), 3).as("__grams"))
    time("grams only")(grams.select(sum(size($"__grams"))).head().getLong(0))
    val sig = grams.withColumn("__sig",
      graft.operators.NearDup.minhashSignature($"__grams", 8, graft.operators.NearDup.Md5Hash))
    time("grams+sig")(sig.select(count($"__sig")).head().getLong(0))
    val cands = graft.operators.NearDup.candidatePairs(sig, "doc_id", "__sig", 4, 2)
    time("cands")(cands.count())
    time("full")(graft.operators.NearDup.nearDupPairs(docs, "doc_id", "text",
      8, 8, 4, 2, 0.5, graft.operators.NearDup.Md5Hash).count())
    spark.stop()
  }
}
