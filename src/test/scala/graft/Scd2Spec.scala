package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.Scd2

/** SCD2 semantics: the incremental merge must converge to the batch
  * rebuild, including null-attribute and late-key edges. */
class Scd2Spec extends SparkSpecBase {
  import spark.implicits._

  private def ts(min: Int) = Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")

  test("mergeSnapshot applied per snapshot equals fromChangeLog of the full log") {
    // change log: k1 changes 10→20→20(no-op)→null→30; k2 appears late
    val log = Seq(
      ("k1", ts(1), Option(10L)), ("k1", ts(2), Option(20L)),
      ("k1", ts(3), Option(20L)), ("k1", ts(4), Option.empty[Long]),
      ("k1", ts(5), Option(30L)),
      ("k2", ts(3), Option(7L)))
      .toDF("k", "t", "v")
    val rebuilt = Scd2.fromChangeLog(log, Seq("k"), "t", "v")

    // replay the same log snapshot-by-snapshot through mergeSnapshot
    val empty = Seq.empty[(String, Option[Long], Timestamp, Option[Timestamp])]
      .toDF("k", "v", "valid_from", "valid_to")
    val minutes = log.select("t").distinct().as[Timestamp].collect().sorted
    val merged = minutes.foldLeft(empty) { (hist, m) =>
      Scd2.mergeSnapshot(hist, log.filter($"t" === m), Seq("k"), "t", "v")
    }

    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "v", "valid_from", "valid_to")
        .collect().map(r => (r.getString(0), Option(r.get(1)),
          r.getTimestamp(2), Option(r.getTimestamp(3)))).toSet
    assert(canon(merged) === canon(rebuilt))
    // exactly one open version per present key
    assert(merged.filter($"valid_to".isNull).groupBy("k").count()
      .filter($"count" > 1).count() === 0)
    // null is a legal tracked value: k1's null version is closed by 30
    assert(canon(rebuilt).contains(("k1", None, ts(4), Some(ts(5)))))
  }

  test("mergeSnapshot leaves absent keys open and closed history untouched") {
    val hist = Seq(
      ("k1", Option(10L), ts(1), Option(ts(2))),
      ("k1", Option(20L), ts(2), Option.empty[Timestamp]),
      ("k2", Option(5L), ts(1), Option.empty[Timestamp]))
      .toDF("k", "v", "valid_from", "valid_to")
    val snap = Seq(("k1", Option(25L), ts(9))).toDF("k", "v", "t")
    val out = Scd2.mergeSnapshot(hist, snap, Seq("k"), "t", "v")
      .collect().map(r => (r.getString(0), Option(r.get(1)),
        r.getTimestamp(2), Option(r.getTimestamp(3)))).toSet
    assert(out === Set(
      ("k1", Some(10L), ts(1), Some(ts(2))),
      ("k1", Some(20L), ts(2), Some(ts(9))),
      ("k1", Some(25L), ts(9), None),
      ("k2", Some(5L), ts(1), None)))
  }
}
