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

  /** C-tier composition: the full corpus-cleaning chain (lang filter →
    * quality filter → exact dedup → greedy near-dup dedup) as ONE
    * operator ([[graft.operators.CleanCorpus.clean]]), run in md5 mode so
    * the DuckDB oracle replays every stage — including the MinHash
    * signatures and LSH banding — bit-for-bit. The oracle IS the
    * pipeline, restated in SQL. */
  private val q75 = Q(
    "q75_clean_corpus",
    (s, dir) => {
      import s.implicits._
      graft.operators.CleanCorpus.clean(
          t(s, dir, "documents"), "doc_id", "text",
          targetLang = "en", minQuality = 0.5,
          mode = graft.operators.NearDup.Md5Hash)
        .select($"doc_id", $"source", $"lang", $"n_chars")
        .orderBy($"doc_id")
    },
    Some {
      val en = graft.functions.TextFunctions.EN_STOP.map(w => s"'$w'").mkString(",")
      val es = graft.functions.TextFunctions.ES_STOP.map(w => s"'$w'").mkString(",")
      s"""WITH ann AS (SELECT doc_id, source, lang, n_chars, text,
        len(list_filter(string_split(lower(text),' '), w -> w IN ($en))) AS en_hits,
        len(list_filter(string_split(lower(text),' '), w -> w IN ($es))) AS es_hits,
        (CASE WHEN len(string_split(lower(text),' ')) BETWEEN 20 AND 2000 THEN 0.4 ELSE 0.0 END
          + least(CAST(len(list_filter(string_split(lower(text),' '), w -> w IN ($en))) AS DOUBLE)
              / CAST(len(string_split(lower(text),' ')) AS DOUBLE) * 4.0, 0.4)
          + CASE WHEN CAST(len(regexp_extract_all(text, '[^a-z0-9 ]')) AS DOUBLE)
              / CAST(length(text) AS DOUBLE) <= 0.1 THEN 0.2 ELSE 0.0 END) AS quality
        FROM documents),
      kept AS (SELECT doc_id, source, lang, n_chars, text FROM ann
        WHERE (CASE WHEN en_hits >= es_hits THEN 'en' ELSE 'es' END) = 'en'
          AND quality >= 0.5),
      exact AS (SELECT doc_id, source, lang, n_chars, text FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY md5(array_to_string(list_sort(list_distinct(string_split(lower(text),' '))), ' '))
          ORDER BY doc_id) AS rn FROM kept) WHERE rn = 1),
      w AS (SELECT doc_id, string_split(lower(text),' ') AS words FROM exact),
      g AS (SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(words)-1, 2)), i -> array_to_string(words[i:i+2],' '))) AS grams FROM w),
      sig AS (SELECT doc_id, grams, [
        list_min(list_transform(grams, x -> md5('0:' || x))),
        list_min(list_transform(grams, x -> md5('1:' || x))),
        list_min(list_transform(grams, x -> md5('2:' || x))),
        list_min(list_transform(grams, x -> md5('3:' || x))),
        list_min(list_transform(grams, x -> md5('4:' || x))),
        list_min(list_transform(grams, x -> md5('5:' || x))),
        list_min(list_transform(grams, x -> md5('6:' || x))),
        list_min(list_transform(grams, x -> md5('7:' || x)))] AS sig FROM g),
      bk AS (SELECT doc_id, unnest([
        md5('0|' || sig[1] || '|' || sig[2]),
        md5('1|' || sig[3] || '|' || sig[4]),
        md5('2|' || sig[5] || '|' || sig[6]),
        md5('3|' || sig[7] || '|' || sig[8])]) AS bk FROM sig),
      cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
        FROM bk a JOIN bk b ON a.bk = b.bk AND a.doc_id < b.doc_id),
      dup AS (SELECT DISTINCT b_id FROM (
        SELECT a_id, b_id,
          CAST(len(list_intersect(ga.grams, gb.grams)) AS DOUBLE)
            / CAST(len(list_distinct(list_concat(ga.grams, gb.grams))) AS DOUBLE) AS jaccard
        FROM cand JOIN g ga ON ga.doc_id = a_id JOIN g gb ON gb.doc_id = b_id)
        WHERE jaccard >= 0.5)
      SELECT doc_id, source, lang, n_chars FROM exact
      WHERE doc_id NOT IN (SELECT b_id FROM dup) ORDER BY doc_id"""
    })

  /** C5 corpus statistics at scale: smoothed tf-idf top-3 terms per
    * source (sources as the "documents" of the idf; sklearn's
    * idf = ln((1+N)/(1+df)) + 1). The whole query is two hash
    * aggregations plus a broadcast of the (term, df) side — no windows
    * over raw tokens, and the only window runs over the already-
    * aggregated (source, term) relation.
    *
    * FP caveat (same class as the vector-oracle caveat in
    * VectorQueries): ln() may differ by 1 ulp between engines; both
    * sides rank on the round(·, 6) score so a flip would need a
    * boundary-straddling value — validated empirically at both SFs. */
  private val q76 = Q(
    "q76_tfidf_top_terms",
    (s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val terms = docs.select($"source",
          explode(split(lower($"text"), " ")).as("term"))
        .filter(length($"term") > 0)
      val tf = terms.groupBy($"source", $"term").agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy($"term").agg(count(lit(1)).as("df"))
      val n = docs.agg(countDistinct($"source").as("n_sources"))
      val scored = tf.join(dfreq, "term").crossJoin(broadcast(n))
        .withColumn("score", round($"tf" *
          (log((lit(1.0) + $"n_sources") / (lit(1.0) + $"df")) + 1.0), 6))
      graft.operators.Dedup.topKPerGroup(scored, Seq("source"),
          Seq($"score".desc, $"term".asc), 3, "rk")
        .select($"source", $"rk".cast("long").as("rk"), $"term", $"tf", $"df", $"score")
        .orderBy($"source", $"rk")
    },
    Some("""WITH terms AS (
        SELECT source, unnest(string_split(lower(text), ' ')) AS term FROM documents),
      tf AS (SELECT source, term, COUNT(*) AS tf FROM terms
        WHERE length(term) > 0 GROUP BY source, term),
      df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
      n AS (SELECT COUNT(DISTINCT source) AS n_sources FROM documents),
      scored AS (SELECT source, term, tf, df,
        round(tf * (ln((1.0 + n_sources) / (1.0 + df)) + 1.0), 6) AS score
        FROM tf JOIN df USING (term) CROSS JOIN n),
      ranked AS (SELECT *, ROW_NUMBER() OVER (
        PARTITION BY source ORDER BY score DESC, term) AS rk FROM scored)
      SELECT source, rk, term, tf, df, score FROM ranked
      WHERE rk <= 3 ORDER BY source, rk"""))

  /** A7/A9 extension: SCD2 validity-interval history rebuilt from the
    * events change log ([[graft.operators.Scd2.fromChangeLog]]) — what
    * the reference's append-only price snapshots become when consumers
    * need "value between t1 and t2" instead of "latest as of t". Values
    * ride as integer cents (exact). One shuffle: both windows share the
    * (user_id × ts, event_id) partitioning. */
  private val q78 = Q(
    "q78_scd2_history",
    (s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events").select($"user_id", $"event_id", $"ts",
        ($"value".cast(DecimalType(18, 2)) * 100).cast("long").as("cents"))
      graft.operators.Scd2.fromChangeLog(ev, Seq("user_id"), "ts", "cents",
          tieBreak = Seq("event_id"))
        .orderBy($"user_id", $"valid_from")
    },
    Some("""WITH e AS (SELECT user_id, event_id, ts,
        CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents FROM events),
      w AS (SELECT *, LAG(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM e),
      chg AS (SELECT user_id, event_id, ts, cents FROM w WHERE prev IS NULL OR prev <> cents)
      SELECT user_id, cents, ts AS valid_from,
        LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
      FROM chg ORDER BY user_id, valid_from"""))

  /** B6 at fleet scale: MERGEABLE distinct-count sketches (DataSketches
    * HLL). Unlike a plain approx_count_distinct (q35), the sketch is a
    * first-class value: built per group (here per event_type), shippable
    * and re-aggregable with hll_union_agg without touching raw data —
    * the pattern for maintaining distinct-user counts across 100 TB of
    * daily partitions. Property-oracled like every approximate op: the
    * unioned estimate must land within 5% of the exact distinct count
    * (deterministic for fixed input — DataSketches HLL has no RNG). */
  private val q79 = Q(
    "q79_hll_sketch_union",
    (s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
      val perType = ev.groupBy($"event_type")
        .agg(hll_sketch_agg($"user_id").as("sk"))
      val approx = perType.agg(
        hll_sketch_estimate(hll_union_agg($"sk")).as("approx"))
      ev.agg(countDistinct($"user_id").as("n_exact")).crossJoin(approx)
        .select($"n_exact",
          ($"approx" >= $"n_exact" * 0.95 && $"approx" <= $"n_exact" * 1.05)
            .as("approx_ok"))
    },
    Some("SELECT COUNT(DISTINCT user_id) AS n_exact, TRUE AS approx_ok FROM events"))

  /** Count-min sketch as relational algebra: d=3 md5-derived hash rows ×
    * w=64 buckets; the sketch IS a groupBy — per-(row, bucket) counts —
    * so it is mergeable across partitions/days by construction (sum the
    * cells), the property that matters for streaming heavy-hitter
    * tracking at 100 TB. Every step is integer + md5, so the DuckDB
    * oracle replays the sketch BIT-EXACTLY (build, probe, min-over-rows)
    * — unlike bounded-error gates, this checks the estimates themselves.
    * Output: top-10 true-count terms with true and CMS counts (the CMS
    * overestimate property, est ≥ true, is visible in the data and
    * asserted in the oracle's own rows). */
  private val q80 = Q(
    "q80_countmin_heavy_hitters",
    (s, dir) => {
      import s.implicits._
      def bucket(j: Int, t: org.apache.spark.sql.Column) =
        pmod(conv(substring(md5(concat(lit(s"$j:"), t)), 1, 15), 16, 10)
          .cast("long"), lit(64L))
      val terms = t(s, dir, "documents")
        .select(explode(split(lower($"text"), " ")).as("term"))
        .filter(length($"term") > 0)
      val cms = (0 until 3).map(j =>
          terms.groupBy(bucket(j, $"term").as("b"))
            .agg(count(lit(1)).as("c")).withColumn("j", lit(j)))
        .reduce(_ unionByName _)
      val probes = terms.groupBy($"term").agg(count(lit(1)).as("n_true"))
        .orderBy($"n_true".desc, $"term").limit(10)
      val probeBuckets = probes.select($"term", $"n_true",
        posexplode(array((0 until 3).map(j => bucket(j, $"term")): _*))
          .as(Seq("j", "b")))
      probeBuckets.join(broadcast(cms), Seq("j", "b"))
        .groupBy($"term", $"n_true").agg(min($"c").as("cms_est"))
        .orderBy($"n_true".desc, $"term")
    },
    Some("""WITH terms AS (
        SELECT unnest(string_split(lower(text), ' ')) AS term FROM documents),
      t2 AS (SELECT term FROM terms WHERE length(term) > 0),
      cms AS (
        SELECT j, ('0x' || substr(md5(j || ':' || term), 1, 15))::BIGINT % 64 AS b,
          COUNT(*) AS c
        FROM t2, (SELECT unnest(range(3)) AS j) GROUP BY 1, 2),
      probes AS (SELECT term, COUNT(*) AS n_true FROM t2 GROUP BY term
        ORDER BY n_true DESC, term LIMIT 10),
      pb AS (SELECT term, n_true, j,
          ('0x' || substr(md5(j || ':' || term), 1, 15))::BIGINT % 64 AS b
        FROM probes, (SELECT unnest(range(3)) AS j))
      SELECT term, n_true, MIN(c) AS cms_est
      FROM pb JOIN cms USING (j, b)
      GROUP BY term, n_true ORDER BY n_true DESC, term"""))

  /** Per-event gap-sessionization ([[graft.operators.Sessionize]]):
    * the gaps-and-islands labeling that turns a raw event log into
    * ordered training sequences (q62's session_window collapses each
    * session to one row; this keeps every event with its session
    * ordinal, position, and offset). One shuffle on user_id — all four
    * window computations share the exchange. 30-minute gap. */
  private val q88 = Q(
    "q88_sessionize_events",
    (s, dir) => {
      import s.implicits._
      graft.operators.Sessionize.assignSessions(
          t(s, dir, "events"), "user_id", "ts", "event_id", gapSeconds = 1800L)
        .select($"user_id", $"session_seq", $"event_seq".cast("long").as("event_seq"),
          $"event_id", $"ts", $"session_start", $"session_events",
          $"micros_into_session")
        .orderBy($"user_id", $"session_seq", $"event_seq")
    },
    Some("""WITH m AS (
        SELECT user_id, event_id, ts,
          CASE WHEN LAG(ts) OVER w IS NULL
            OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
            THEN 1 ELSE 0 END AS brk
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      sid AS (SELECT user_id, event_id, ts,
          CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
        FROM m)
      SELECT user_id, session_seq,
        ROW_NUMBER() OVER (PARTITION BY user_id, session_seq ORDER BY ts, event_id) AS event_seq,
        event_id, ts,
        MIN(ts) OVER (PARTITION BY user_id, session_seq) AS session_start,
        COUNT(*) OVER (PARTITION BY user_id, session_seq) AS session_events,
        epoch_us(ts) - epoch_us(MIN(ts) OVER (PARTITION BY user_id, session_seq))
          AS micros_into_session
      FROM sid ORDER BY user_id, session_seq, event_seq"""))

  /** B6/C sketch family completion: a Bloom filter as a first-class
    * MERGEABLE relational value — (word, bits) rows built with
    * md5-derived positions and a bit_or aggregate. bit_or IS the merge:
    * per-partition (and per-day, per-source…) filters union without
    * touching raw data, the same fleet pattern as the HLL (q79) and
    * count-min (q80) sketches. Probes AND together their k bit tests;
    * known-present ids must hit (no false negatives — asserted by the
    * oracle being exact), absent ids measure the FPR. m=1024 bits
    * (32 x 32-bit words - shifts stay under DuckDB's signed-shift cap), k=3: every step is integer relational algebra, so the
    * whole sketch replays bit-exactly in SQL. */
  private val q94 = Q(
    "q94_bloom_membership",
    (s, dir) => {
      import s.implicits._
      def h(j: Int, c: org.apache.spark.sql.Column) =
        pmod(conv(substring(md5(concat(lit(s"$j:"), c.cast("string"))), 1, 15), 16, 10)
          .cast("long"), lit(1024L))
      def positions(df: DataFrame) = df.select($"user_id",
          posexplode(array((0 until 3).map(j => h(j, $"user_id")): _*))
            .as(Seq("j", "pos")))
        .select($"user_id", floor($"pos" / 32).cast("long").as("word"),
          expr("shiftleft(1L, cast(pos % 32 as int))").as("mask"))
      val users = t(s, dir, "events").select($"user_id").distinct()
      val bloom = positions(users).groupBy($"word")
        .agg(expr("bit_or(mask)").as("bits"))
      val probes = users.orderBy($"user_id").limit(10)
        .unionByName(s.range(1, 11).select(($"id" + 1000000L).as("user_id")))
      val hits = positions(probes).join(broadcast(bloom), Seq("word"), "left")
        .select($"user_id",
          (coalesce($"bits", lit(0L)).bitwiseAND($"mask") =!= 0L).as("bit_set"))
        .groupBy($"user_id").agg(expr("bool_and(bit_set)").as("bloom_hit"))
      hits.join(users.withColumn("actual", lit(true)), Seq("user_id"), "left")
        .select($"user_id", $"bloom_hit", coalesce($"actual", lit(false)).as("actual"))
        .orderBy($"user_id")
    },
    Some("""WITH users AS (SELECT DISTINCT user_id FROM events),
      pos AS (SELECT user_id,
          ('0x' || substr(md5(j || ':' || user_id), 1, 15))::BIGINT % 1024 AS pos
        FROM users, (SELECT unnest(range(3)) AS j)),
      bloom AS (SELECT pos // 32 AS word,
          bit_or(1::BIGINT << CAST(pos % 32 AS INT)) AS bits
        FROM pos GROUP BY 1),
      probes AS (
        SELECT user_id FROM (SELECT user_id FROM users ORDER BY user_id LIMIT 10)
        UNION ALL
        SELECT 1000000 + r FROM (SELECT unnest(range(1, 11)) AS r)),
      pb AS (SELECT user_id,
          ('0x' || substr(md5(j || ':' || user_id), 1, 15))::BIGINT % 1024 AS pos
        FROM probes, (SELECT unnest(range(3)) AS j)),
      pbw AS (SELECT user_id, pos // 32 AS word,
          1::BIGINT << CAST(pos % 32 AS INT) AS mask FROM pb),
      hits AS (SELECT user_id,
          bool_and((COALESCE(bits, 0) & mask) <> 0) AS bloom_hit
        FROM pbw LEFT JOIN bloom USING (word) GROUP BY user_id)
      SELECT h.user_id, h.bloom_hit, u.user_id IS NOT NULL AS actual
      FROM hits h LEFT JOIN users u ON u.user_id = h.user_id
      ORDER BY h.user_id"""))

  /** B5 INTERVAL-OVERLAP join ([[RangeJoin.intervalOverlap]]): transit
    * windows [shipdate, receiptdate] of one supplier group overlapping
    * another's — both sides big-side-capable (bin equi-join; a pair is
    * kept only at its intersection's first bin, so no dedup shuffle).
    * Dates bin as epoch days, width 30 (transit ≤ ~1 month ⇒ ≤ 2 bins
    * per interval). The oracle is the naive overlap theta join —
    * binning must be invisible. */
  private val q127 = Q(
    "q127_interval_overlap_join",
    (s, dir) => {
      import s.implicits._
      val li = t(s, dir, "lineitem")
      // the fixture has no receipt date; the transit span derives
      // deterministically from the supplier key (7-27 days)
      def side(m: Int, p: String) = li.filter($"l_suppkey" % 100 === m)
        .select($"l_orderkey".as(s"${p}_ok"), $"l_linenumber".as(s"${p}_ln"),
          $"l_partkey".as(s"${p}_pk"), $"l_suppkey".as(s"${p}_sk"),
          unix_date($"l_shipdate".cast("date")).cast("long").as(s"${p}_lo"))
        .withColumn(s"${p}_hi",
          col(s"${p}_lo") + col(s"${p}_sk") % 21 + 7)
      graft.operators.RangeJoin.intervalOverlap(
          side(0, "a"), side(1, "b"),
          "a_lo", "a_hi", "b_lo", "b_hi", binWidth = 30.0)
        .groupBy($"a_ok", $"a_ln", $"a_pk", $"a_sk", $"a_lo", $"a_hi")
        .agg(count(lit(1)).as("n_overlaps"), min($"b_lo").as("first_b_ship"))
        .orderBy($"a_ok", $"a_ln", $"a_pk", $"a_sk")
    },
    Some("""WITH la AS (SELECT l_orderkey AS a_ok, l_linenumber AS a_ln,
          l_partkey AS a_pk, l_suppkey AS a_sk,
          CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS a_lo,
          CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT)
            + l_suppkey % 21 + 7 AS a_hi
        FROM lineitem WHERE l_suppkey % 100 = 0),
      lb AS (SELECT
          CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS b_lo,
          CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT)
            + l_suppkey % 21 + 7 AS b_hi
        FROM lineitem WHERE l_suppkey % 100 = 1)
      SELECT a_ok, a_ln, a_pk, a_sk, a_lo, a_hi,
        COUNT(*) AS n_overlaps, MIN(b_lo) AS first_b_ship
      FROM la JOIN lb ON a_lo <= b_hi AND b_lo <= a_hi
      GROUP BY a_ok, a_ln, a_pk, a_sk, a_lo, a_hi
      ORDER BY a_ok, a_ln, a_pk, a_sk"""))

  /** B13/B5 TEMPORAL JOIN: each click joined to the SCD2 value version
    * valid at its timestamp — [[graft.operators.Scd2.fromChangeLog]]
    * composed with the as-of merge exec ([[graft.operators.AsOf]]'s
    * custom plan): since SCD2 versions tile [valid_from, valid_to),
    * "version valid at ts" IS the as-of backward lookup on valid_from,
    * no interval predicate needed. Events pre-deduped to one change
    * row per (user, ts) so the version chain (and the ASOF oracle) is
    * unambiguous. */
  private val q128 = Q(
    "q128_temporal_join",
    (s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
      val changes = graft.operators.Dedup.lastWins(
        ev.select($"user_id", $"event_id", $"ts",
          ($"value".cast(DecimalType(18, 2)) * 100).cast("long").as("cents")),
        Seq("user_id", "ts"), Seq("event_id"))
      val hist = graft.operators.Scd2.fromChangeLog(
          changes, Seq("user_id"), "ts", "cents", tieBreak = Seq("event_id"))
        .select($"user_id", $"cents", $"valid_from")
      val clicks = ev.filter($"event_type" === "click")
        .select($"user_id", $"event_id", $"ts")
      graft.operators.AsOf.asofJoinMerge(
          clicks, hist, Seq("user_id"), "ts", "valid_from", "h_")
        .select($"event_id", $"user_id", $"ts",
          $"h_cents".as("cents_at_ts"))
        .orderBy($"event_id")
    },
    Some("""WITH e0 AS (SELECT user_id, event_id, ts,
          CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        FROM events),
      e AS (SELECT user_id, event_id, ts, cents FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, ts
            ORDER BY event_id DESC) AS rn FROM e0) WHERE rn = 1),
      w AS (SELECT *, LAG(cents) OVER (
          PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM e),
      hist AS (SELECT user_id, cents, ts AS valid_from FROM w
        WHERE prev IS NULL OR prev <> cents),
      c AS (SELECT user_id, event_id, ts FROM events
        WHERE event_type = 'click')
      SELECT c.event_id, c.user_id, c.ts, h.cents AS cents_at_ts
      FROM c ASOF LEFT JOIN hist h
        ON c.user_id = h.user_id AND h.valid_from <= c.ts
      ORDER BY c.event_id"""))

  /** B6 at fleet scale, part 2: a daily SKETCH TABLE (one mergeable
    * HLL row per day — what a production batch job persists, bytes
    * per day) rolled into 7-day distinct-user counts by unioning 7
    * sketches per target day. The roll touches ONLY the day-level
    * sketch table (a tiny relation self-joined on a 7-day band) —
    * never the raw events; that is the entire point of persisting
    * mergeable sketches at 100 TB. Bounded-error oracled like q79
    * (the exact side replays in SQL; the estimate must land within
    * 5%). */
  private val q132 = Q(
    "q132_rolling_sketch_distinct",
    (s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
        .select(to_date($"ts").as("day"), $"user_id")
      val daily = ev.groupBy($"day").agg(hll_sketch_agg($"user_id").as("sk"))
      val rolled = daily.as("a").join(daily.as("b"),
          datediff($"a.day", $"b.day").between(0, 6))
        .groupBy($"a.day".as("day"))
        .agg(hll_sketch_estimate(hll_union_agg($"b.sk")).as("approx"))
      val du = ev.distinct()
      val exact = du.select($"day").distinct().as("d")
        .join(du.select($"day".as("day2"), $"user_id").as("u"),
          datediff($"day", $"day2").between(0, 6))
        .groupBy($"day").agg(countDistinct($"user_id").as("n_exact"))
      exact.join(rolled, "day")
        .select($"day", $"n_exact",
          ($"approx" >= $"n_exact" * 0.95 && $"approx" <= $"n_exact" * 1.05)
            .as("approx_ok"))
        .orderBy($"day")
    },
    Some("""WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
      days AS (SELECT DISTINCT day FROM du)
      SELECT d.day, COUNT(DISTINCT u.user_id) AS n_exact, TRUE AS approx_ok
      FROM days d JOIN du u ON u.day BETWEEN d.day - 6 AND d.day
      GROUP BY d.day ORDER BY d.day"""))

  def qs: Seq[Q] = Seq(q74, q75, q76, q78, q79, q80, q88, q94, q127, q128,
    q132)
}
