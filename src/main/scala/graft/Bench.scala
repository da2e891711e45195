package graft

/** Benchmark main: runs every declared query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. The noop sink forces full computation of every
  * output column (a bare .count() would let Catalyst prune the plan). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local("graft-bench")
    // Warm the session (JIT, codegen compiler, shuffle machinery, FS
    // metadata) outside the timed region so the alphabetically-first
    // query doesn't absorb it: one scan-agg-join-window plan end to end.
    locally {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      li.groupBy(col("l_returnflag"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("s"), count(lit(1)).as("n"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("l_returnflag")).orderBy(col("n"))))
        .write.format("noop").mode("overwrite").save()
      // Case-mapping functions lazily build ICU tables over the full
      // Unicode range on first use (CollationAwareUTF8String.<clinit>) —
      // a one-time multi-second JVM cost that otherwise lands on
      // whichever timed query calls lower() first. Constant folding
      // evaluates these on this JVM during optimization, which is the
      // executor JVM too under local[*].
      spark.range(1).select(lower(lit("Warm")), upper(lit("warm")),
          initcap(lit("warm up")), levenshtein(lit("warm"), lit("worm")))
        .write.format("noop").mode("overwrite").save()
    }
    // Three timed runs per query, report the min: one-time JVM costs
    // (lazy class inits, codegen/JIT of a new plan shape, a neighbor's
    // GC) land on whichever single run they interleave with and were
    // being attributed to innocent queries (observed: 7-15 s one-off
    // spikes on sub-second queries; min-of-2 still let 3-6x ambient
    // spikes through in the r7 suite run — VERDICT r7 #6). Min-of-3
    // measures the engine's steady state; the JSON declares the
    // methodology.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }
      name -> times.min
    }
    val total = results.map(_._2).sum
    def jsonLine(fmt: String => String): String = {
      val qs = results.map { case (k, v) => "\"" + fmt(k) + f"\":$v%.3f" }
        .mkString("{", ",", "}")
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","runs_per_query":3,"stat":"min","queries":$qs,"sf":"$sfDir"}"""
    }
    // Full-name per-query JSON goes to a FILE — the driver's stdout
    // capture keeps only a 2000-char tail, which a 95-query dict with
    // full names overflows (observed: BENCH_r04 clipped the total and
    // q01-q22). The stdout line uses the short qNN keys so the whole
    // line (~1.4 KB) survives the tail intact and parses.
    java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_FULL.json"),
      (jsonLine(identity) + "\n").getBytes("UTF-8"))
    println(jsonLine(name => name.takeWhile(_ != '_')))
    spark.stop()
  }
}
