package graft

import org.apache.spark.sql.functions._

/** Dev utility: decompose [[graft.operators.FuzzyJoin.selfPairsQGram]]'s
  * cost (q156's 150 task-second profile, r19) into candidate EMISSION
  * vs banded-levenshtein VERIFY by timing each stage boundary and
  * counting the rows that cross it:
  *
  *   runMain graft.DevFuzzy <sfDir>
  */
object DevFuzzy {
  def main(args: Array[String]): Unit = {
    require(args.length >= 1, "usage: DevFuzzy <sfDir> [q]")
    val spark = Sessions.local("dev-fuzzy")
    val maxDist = 8
    val q = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    println(s"[fuzzy] q=$q maxDist=$maxDist")
    val prefixLen = maxDist * q + 1
    val gramMin = q * (maxDist + 1)
    val df = spark.read.parquet(s"${args(0)}/documents.parquet")
      .select(col("doc_id"), col("text"))
    df.write.format("noop").mode("overwrite").save()
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[fuzzy] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val base = df
      .select(col("doc_id").as("__id"), col("text").as("__s"),
        length(col("text")).as("__len"))
      .filter(col("__id").isNotNull && col("__s").isNotNull)
    println(s"[fuzzy] docs=${base.count()} " +
      s"lenStats=${base.agg(min("__len"), avg("__len"), max("__len")).collect().mkString}")
    val grams = base.filter(col("__len") >= gramMin)
      .select(col("__id"), col("__len"),
        explode(transform(sequence(lit(1), col("__len") - (q - 1)),
          i => col("__s").substr(i, lit(q)))).as("__g"))
      .select(col("__id"), col("__len"), xxhash64(col("__g")).as("__gk"))
      .distinct()
      .localCheckpoint()
    println(s"[fuzzy] distinct (id,gram) rows=${grams.count()}, " +
      s"distinct grams=${grams.select("__gk").distinct().count()}")
    val freq = grams.groupBy(col("__gk")).agg(count(lit(1)).as("__f"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__id")).orderBy(col("__f"), col("__gk"))
    val prefix = grams.join(freq, Seq("__gk"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= prefixLen)
      .select(col("__gk"), col("__id"), col("__len"))
      .localCheckpoint()
    println(s"[fuzzy] prefix entries=${prefix.count()}")
    val wcol = floor(col("__len") / lit(maxDist)).cast("long")
    val reg = prefix.select(col("__gk"), col("__id"), col("__len"), wcol.as("__w"))
    val probe = prefix.select(col("__gk"), col("__id").as("__bid"),
        col("__len").as("__blen"),
        explode(array(wcol - 1, wcol, wcol + 1)).as("__w"))
    val joined = reg.join(probe, Seq("__gk", "__w"))
      .filter(col("__id") < col("__bid") &&
        abs(col("__len") - col("__blen")) <= maxDist)
      .select(col("__id").as("a_id"), col("__bid").as("b_id"))
    timed("pair emission (pre-distinct count)") {
      println(s"[fuzzy]   emitted=${joined.count()}")
    }
    val cands = timed("distinct") { joined.distinct().localCheckpoint() }
    println(s"[fuzzy] candidate pairs=${cands.count()}")
    val verified = cands
      .join(df.select(col("doc_id").as("a_id"), col("text").as("__sa")), "a_id")
      .join(df.select(col("doc_id").as("b_id"), col("text").as("__sb")), "b_id")
      .withColumn("dist", levenshtein(col("__sa"), col("__sb"), maxDist))
      .filter(col("dist") >= 0)
    timed("verify (banded levenshtein over candidates)") {
      println(s"[fuzzy]   survivors=${verified.count()}")
    }
    // L1 char-histogram bound selectivity: ED >= L1/2, so L1 > 2d is a
    // sound kill. Histogram = counts per (codepoint % 64) bucket.
    val histReal = df.select(col("doc_id"),
      transform(sequence(lit(0), lit(63)), b =>
        size(filter(split(col("text"), ""),
          ch => pmod(ascii(ch), lit(64)) === b)) ).as("__h"))
    val withH = cands
      .join(histReal.select(col("doc_id").as("a_id"), col("__h").as("__ha")), "a_id")
      .join(histReal.select(col("doc_id").as("b_id"), col("__h").as("__hb")), "b_id")
      .withColumn("__l1", aggregate(zip_with(col("__ha"), col("__hb"),
        (x, y) => abs(x - y)), lit(0), (acc, v) => acc + v))
    timed("hist L1 filter selectivity") {
      val passed = withH.filter(col("__l1") <= 2 * maxDist).count()
      println(s"[fuzzy]   histogram-passed=$passed of ${cands.count()}")
    }
    spark.stop()
  }
}
