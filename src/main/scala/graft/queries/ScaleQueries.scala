package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.operators.RangeJoin
import graft.sources.Tables

/** Round-3 scale-path queries: operators whose point is the plan shape
  * at 100 TB (binned range join, composed corpus cleaning, tf-idf),
  * each DuckDB-oracled like everything else. */
object ScaleQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables(s, dir, n)

  private def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 2))

  /** B5 scale path: point-in-interval range join via binning
    * ([[RangeJoin.pointInInterval]]) — an equi-join on the bin key
    * instead of q19's broadcast nested loop, i.e. the shape that
    * survives a big interval side. 211 half-overlapping price bands of
    * width 1000 over l_extendedprice; bin width = 500 so every interval
    * spans ≤ 3 bins. The oracle is the naive BETWEEN theta join —
    * binning must be invisible in the result. */
  private val q74 = Q(
    "q74_binned_range_join",
    (s, dir) => {
      import s.implicits._
      val bands = s.range(0, 211).select(
        concat(lit("b"), lpad($"id".cast("string"), 3, "0")).as("band"),
        ($"id" * 500.0).as("lo"),
        ($"id" * 500.0 + 999.0).as("hi"))
      RangeJoin.pointInInterval(
          t(s, dir, "lineitem"), bands, "l_extendedprice", "lo", "hi",
          binWidth = 500.0)
        .groupBy($"band")
        .agg(count(lit(1)).as("n"),
          sum(dec($"l_extendedprice")).cast("double").as("sum_price"))
        .orderBy($"band")
    },
    Some("""WITH bands AS (
        SELECT 'b' || lpad(CAST(i AS VARCHAR), 3, '0') AS band,
               i * 500.0 AS lo, i * 500.0 + 999.0 AS hi
        FROM (SELECT unnest(range(211)) AS i))
      SELECT band, COUNT(*) AS n,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      FROM lineitem JOIN bands ON l_extendedprice BETWEEN lo AND hi
      GROUP BY band ORDER BY band"""))

  def qs: Seq[Q] = Seq(q74)
}
