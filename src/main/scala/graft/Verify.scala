package graft

import java.nio.file.{Files, Paths}

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // Optional third arg (dev only): comma-separated query-name prefixes
    // to dump a subset; the driver always passes exactly two args.
    val only: String => Boolean =
      if (args.length > 2) { val ps = args(2).split(','); n => ps.exists(n.startsWith) }
      else _ => true
    val spark = Sessions.local("graft-verify", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    // Result DUMPS keep the INT96 (naive) timestamp encoding the
    // DuckDB comparer string-matches against — the session default is
    // TIMESTAMP_MICROS (isAdjustedToUTC=true), which renders with a
    // "+00:00" suffix on the comparer side and mismatches every naive
    // oracle timestamp. Queries whose in-body gates need MICROS footer
    // stats on their own tables (q181) set it around their builds.
    spark.conf.set("spark.sql.parquet.outputTimestampType", "INT96")
    new java.io.File(outDir).mkdirs()
    // A query that throws must still surface in the round's correctness
    // file as a red entry, not vanish: write a sentinel one-row parquet
    // (guaranteed schema/hash mismatch vs any oracle) and collect the
    // errors into errors.json for the judge. Round 8's four broken
    // queries were invisible in CORRECTNESS precisely because failures
    // produced no output directory at all.
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    SparkEntry.queries.filter(kv => only(kv._1)).foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        val msg = s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(500)}"
        System.err.println(s"[verify] $name failed: $msg")
        errors(name) = msg
        try {
          import org.apache.spark.sql.types.{StringType, StructField, StructType}
          spark.createDataFrame(
            java.util.Collections.singletonList(org.apache.spark.sql.Row(msg)),
            StructType(Seq(StructField("__query_error", StringType))))
            .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        } catch { case _: Throwable => () }
      }
      // the query's output is on disk — release any localCheckpoint
      // blocks it left behind so a 179-query session stays flat
      graft.util.Ckpt.sweep(spark)
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val errJson = errors.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/errors.json"), errJson)
    if (errors.nonEmpty)
      System.err.println(s"[verify] ${errors.size} queries failed: ${errors.keys.mkString(", ")}")
    spark.stop()
  }
}
