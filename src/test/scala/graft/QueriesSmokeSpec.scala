package graft

import graft.queries.Registry

/** t1-style smoke: every registered query runs at sf0.001; queries whose
  * semantics guarantee output there must return rows. */
class QueriesSmokeSpec extends SparkSpecBase {

  // empty-at-tiny-sf is legitimate for these (near-dup pairs may not
  // survive tau at a 500-doc sample, etc.) — run-without-error only
  private val mayBeEmpty = Set("q46_ngram_jaccard", "q47_minhash_lsh",
    "q48_simhash_neardup", "q06_anti_join", "q16_setops", "q65_cosine_neardup")

  Registry.all.foreach { q =>
    test(s"${q.name} runs at sf0.001${if (q.oracle.isEmpty) " (rows-only)" else ""}") {
      val n = q.run(spark, sfDir).count()
      if (!mayBeEmpty(q.name)) assert(n > 0, s"${q.name} returned no rows")
    }
  }

  test("SparkEntry.entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("q94 bloom filter admits every present key (no false negatives)") {
    import spark.implicits._
    val rows = Registry.queries("q94_bloom_membership")(spark, sfDir)
      .as[(Long, Boolean, Boolean)].collect()
    rows.filter(_._3).foreach { case (id, hit, _) =>
      assert(hit, s"present key $id missed — bloom false negative")
    }
    assert(rows.count(_._3) === 10 && rows.length === 20)
  }
}
