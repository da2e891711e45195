package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the engine.
  *
  * Local harness runs single-JVM `local[32]`; on a real cluster the same
  * settings (AQE on, shuffle partitions sized to parallelism, broadcast
  * threshold) are what you'd set per-job. The reference
  * (`/root/reference/index.js:9-17`) initializes its AWS clients here-ish;
  * our analog is the SparkSession.
  */
object Sessions {
  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

  def local(app: String = "graft", cores: String = cpus): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(app)
      // SQL MERGE INTO on graft tables rides the library's
      // merge-on-read path (GraftSqlExtensions; untranslatable
      // statements fall back to Spark's group-based rewrite unchanged)
      .withExtensions(new graft.sources.GraftSqlExtensions()(_))
      // Size shuffle parallelism to actual cores, not the 200 default.
      .config("spark.sql.shuffle.partitions", cores)
      // AQE: runtime coalescing + skew-join handling — the scale story.
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // Dim tables (region/nation/customer/supplier/part at test SFs) are
      // broadcast-able; keep the threshold generous.
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet has shipped as TIMESTAMP(NANOS) and as
      // TIMESTAMP(MICROS, isAdjustedToUTC=false) across testdata
      // generations. For nanos: Spark has no nanos type — read as long and
      // convert (truncate) to micros in Tables, matching DuckDB's ns→us
      // truncation. For unadjusted micros: infer TimestampType (LTZ)
      // instead of TIMESTAMP_NTZ — the session timezone is pinned UTC, so
      // wall-clock values are identical to DuckDB's naive reading, and the
      // whole ts function surface (unix_micros, watermarks) stays typed.
      // INT96 (Spark's default parquet timestamp encoding) carries NO
      // usable footer min/max, so timestamp columns would have no
      // manifest stats at all — no file skipping on time ranges (the
      // reference's own hottest read shape is `latest as of t`,
      // /root/reference/index.js:305-314) and no manifest-answered
      // min(ts)/max(ts). INT64 MICROS stats are Spark's exact internal
      // values; the stats harvest refuses any other unit it meets.
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      // Local-FS hygiene for the harness box: the default checksummed
      // LocalFileSystem doubles every create with a .crc sidecar, and
      // without libhadoop every create/mkdir forks a chmod process.
      // FastLocalFs (see its scaladoc) is the raw local FS minus the
      // permission fork — `file:` scheme only, never active on a
      // cluster filesystem.
      .config("spark.hadoop.fs.file.impl", "graft.sources.FastLocalFs")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // The Ckpt release discipline (unpersisting released localCheckpoint
    // blocks, util/Ckpt.scala) makes RDD.unpersist emit one WARN per
    // released block ("RDD N was locally checkpointed, its lineage has
    // been truncated…") — expected output of deliberate lifecycle
    // management, and at bench volume it floods captured output tails,
    // burying real warnings. Deny exactly that MESSAGE on exactly that
    // logger (the concrete RDD class the checkpoint materializes) — any
    // other warning the class emits still surfaces.
    locally {
      import org.apache.logging.log4j.core.{Filter, LoggerContext}
      import org.apache.logging.log4j.core.config.LoggerConfig
      import org.apache.logging.log4j.core.filter.RegexFilter
      val ctx = org.apache.logging.log4j.LogManager.getContext(false)
        .asInstanceOf[LoggerContext]
      val conf = ctx.getConfiguration
      val name = "org.apache.spark.rdd.MapPartitionsRDD"
      if (conf.getLoggerConfig(name).getName != name) {
        val lc = new LoggerConfig(name,
          org.apache.logging.log4j.Level.WARN, true)
        lc.addFilter(RegexFilter.createFilter(
          ".*locally checkpointed.*", null, false,
          Filter.Result.DENY, Filter.Result.NEUTRAL))
        conf.addLogger(name, lc)
        ctx.updateLoggers()
      }
    }
    // engine-native functions, available to DataFrame code and SQL alike
    graft.functions.SimHash64.register(spark)
    graft.functions.CosineSim.register(spark)
    graft.operators.NearDup.registerMd5Sig(spark, 8)
    graft.functions.TextFunctions.registerNGrams(spark, 3)
    graft.functions.JaccardSim.register(spark)
    spark
  }
}
