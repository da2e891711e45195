package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared query: a Spark implementation plus (usually) an equivalent
  * DuckDB SQL oracle over the same parquet tables. `oracle == None` marks a
  * non-SQL-expressible op (e.g. LSH with engine-native hashing) — the driver
  * records a weaker rows-only check for those.
  *
  * Determinism contract (SURVEY §5): every query totally orders its output
  * (unique tie-break key) and keeps aggregate numerics exact (decimal
  * internal, double at the boundary) so Spark and DuckDB hash identically.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Registry {
  def all: Seq[Q] = Relational.qs ++ Relational2.qs ++ Relational3.qs ++
    OpsQueries.qs ++ TextQueries.qs ++ VectorQueries.qs ++
    StreamingQueries.qs ++ ScaleQueries.qs ++ CorpusQueries.qs ++
    CorpusQueries2.qs ++ CorpusQueries3.qs ++ IndexQueries.qs ++ GraphQueries.qs

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
