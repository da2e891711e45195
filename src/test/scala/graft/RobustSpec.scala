package graft

import org.apache.spark.sql.functions._

import graft.operators.Robust

/** Robust.madScores: exact median/MAD per group vs a hand-computed
  * model, degenerate MAD=0 behavior, and null handling. */
class RobustSpec extends SparkSpecBase {
  import spark.implicits._

  test("madScores matches a hand-computed median/MAD model") {
    // group a: values 1..5 + an outlier 100 → med 3.5 (type-7 over 6
    // values: (3+4)/2), devs {2.5,1.5,.5,.5,1.5,96.5} → MAD 1.5;
    // only 100 flags at k=3 (96.5 > 4.5)
    val df = Seq(
      ("a", 1L, 1.0), ("a", 2L, 2.0), ("a", 3L, 3.0),
      ("a", 4L, 4.0), ("a", 5L, 5.0), ("a", 6L, 100.0),
      // group b: symmetric, no outliers at k=3
      ("b", 7L, 10.0), ("b", 8L, 20.0), ("b", 9L, 30.0)
    ).toDF("g", "id", "x")
    val out = Robust.madScores(df, Seq("g"), "x", k = 3.0)
      .orderBy($"id")
      .select($"id", $"med", $"mad", $"is_outlier")
      .as[(Long, Double, Double, Boolean)].collect()
    assert(out.filter(_._1 <= 6).forall(r => r._2 === 3.5 && r._3 === 1.5))
    assert(out.filter(_._1 > 6).forall(r => r._2 === 20.0 && r._3 === 10.0))
    assert(out.filter(_._4).map(_._1).toSeq === Seq(6L))
  }

  test("MAD=0 degeneracy: a constant-majority group flags every deviating row") {
    val df = Seq(("c", 1L, 5.0), ("c", 2L, 5.0), ("c", 3L, 5.0),
      ("c", 4L, 5.000001)).toDF("g", "id", "x")
    val flagged = Robust.madScores(df, Seq("g"), "x", k = 3.0)
      .filter($"is_outlier").select($"id").as[Long].collect().toSeq
    assert(flagged === Seq(4L))
  }

  test("null values carry a null flag; all-null groups drop") {
    val df = Seq(("a", 1L, Some(1.0)), ("a", 2L, Some(2.0)),
      ("a", 3L, Some(3.0)), ("a", 4L, None: Option[Double]),
      ("z", 5L, None: Option[Double])).toDF("g", "id", "x")
    val out = Robust.madScores(df, Seq("g"), "x")
    assert(out.filter($"id" === 4L).select($"is_outlier")
      .as[Option[Boolean]].head().isEmpty)
    assert(out.filter($"id" === 5L).count() === 0L) // no median to score against
    assert(out.count() === 4L)
  }
}
