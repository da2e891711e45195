package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalable fuzzy string self-join: all pairs within levenshtein
  * distance ≤ d, WITHOUT the all-pairs product — candidates come from
  * FastSS/SymSpell-style deletion neighborhoods (Bocek et al. 2007,
  * "Fast Similarity Search in Large Dictionaries": two strings within
  * edit distance d share a variant obtained by deleting ≤ d chars from
  * each), then exact `levenshtein` verifies. The typo-clustering /
  * entity-resolution primitive of a cleaning pipeline (fuzzy B10/B5
  * closure; exact-recall oracle the same way q47 proves LSH recall).
  *
  * Scale shape: each string explodes to O(len^d) deletion variants that
  * ride the shuffle as xxhash64 longs, never strings; candidate pairs
  * are emitted per variant bucket with the [[NearDup.candidatePairs]]
  * sorted-ids/slice pattern (i<j, no self-pairs), deduped once, and
  * verified with the codegen'd levenshtein on a join back to the (id,
  * string) relation. A `maxBucket` cap bounds degenerate variants (mass
  * near-identical strings) the same way the LSH bucket cap does.
  */
object FuzzyJoin {

  /** 64-bucket code-point histogram / L1 distance — the codegen'd
    * pre-verify pair ([[graft.functions.CharHistNative]] /
    * [[graft.functions.HistL1Native]]). One edit moves at most two
    * units of histogram mass, so `histL1 > 2·maxDist` is a SOUND kill
    * before the banded levenshtein: no pair that verifies is ever
    * dropped (r19 — on the templated-text corpus the candidate sets
    * are ~1000× the survivor sets and the O(d·len) DP dominated the
    * whole join; the 64-int L1 kills 99.9% of candidates at ~1% of the
    * DP's cost). The histogram is computed once per doc inside the
    * verify join's build-side projection — no extra exchange. */
  private def charHist(c: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(graft.functions.CharHistNative(
      org.apache.spark.sql.graft.Bridge.expression(c)))
  private def histL1(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(graft.functions.HistL1Native(
      org.apache.spark.sql.graft.Bridge.expression(a),
      org.apache.spark.sql.graft.Bridge.expression(b)))

  /** All single-character deletions of `s`, plus `s` itself. */
  private def delOnce(s: Column): Column =
    when(length(s) === 0, array(s)).otherwise(
      concat(array(s), transform(sequence(lit(1), length(s)), i =>
        concat(substr(s, lit(1), i - 1),
          substr(s, i + 1, length(s) - i)))))

  /** Distinct deletion variants of `s` up to depth `d` (1 or 2). */
  def deletionVariants(s: Column, d: Int): Column = {
    require(d >= 1 && d <= 2, s"maxDist must be 1 or 2, got $d")
    val v1 = delOnce(s)
    if (d == 1) array_distinct(v1)
    else array_distinct(flatten(transform(v1, v => delOnce(v))))
  }

  /** All (a_id, b_id, dist) with a_id < b_id and
    * levenshtein(str_a, str_b) ≤ maxDist. Variant buckets larger than
    * `maxBucket` are dropped (degenerate mass-duplicate strings — dedup
    * those exactly first); audit with [[overflowVariants]]. */
  def selfPairs(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int = 1, maxBucket: Int = 4096): DataFrame = {
    // single-split inputs would run the O(len^d) variant explode on
    // one task — spread first (no-op at scale, see [[Spread]])
    val variants = Spread.byKey(df, idCol).select(
        col(idCol).as("__id"),
        explode(deletionVariants(col(strCol), maxDist)).as("__v"))
      .select(col("__id"), xxhash64(col("__v")).as("__vk"))
      .distinct()
    val n = size(col("__ids"))
    val cands = variants.groupBy(col("__vk"))
      .agg(sort_array(collect_list(col("__id"))).as("__ids"))
      .filter(n > 1 && n <= maxBucket)
      .select(explode(flatten(transform(col("__ids"), (x, i) =>
        transform(slice(col("__ids"), i + lit(2), size(col("__ids"))),
          y => struct(x.as("a_id"), y.as("b_id")))))).as("p"))
      .select(col("p.a_id"), col("p.b_id"))
      .distinct()
    cands
      .join(df.select(col(idCol).as("a_id"), col(strCol).as("__sa"),
        charHist(col(strCol)).as("__ha")), "a_id")
      .join(df.select(col(idCol).as("b_id"), col(strCol).as("__sb"),
        charHist(col(strCol)).as("__hb")), "b_id")
      // sound L1 kill (see [[charHist]]) before the banded DP
      .filter(histL1(col("__ha"), col("__hb")) <= 2 * maxDist)
      // banded threshold form: O(d·len) per pair, -1 past the band
      .withColumn("dist", levenshtein(col("__sa"), col("__sb"), maxDist))
      .filter(col("dist") >= 0)
      .select(col("a_id"), col("b_id"), col("dist"))
  }

  /** Two-table form (entity linking): all (l_id, r_id, dist) with
    * levenshtein(left.strCol, right.strCol) ≤ maxDist. Same candidate
    * machinery as [[selfPairs]]; variant keys whose side exceeds
    * `maxBucket` are dropped on that side. */
  def pairs(left: DataFrame, right: DataFrame, idCol: String,
      strCol: String, maxDist: Int = 1, maxBucket: Int = 4096): DataFrame = {
    def side(df: DataFrame, as: String): DataFrame = {
      val v = Spread.byKey(df, idCol).select(col(idCol).as(as),
          explode(deletionVariants(col(strCol), maxDist)).as("__v"))
        .select(col(as), xxhash64(col("__v")).as("__vk"))
        .distinct()
      val hot = v.groupBy(col("__vk")).agg(count(lit(1)).as("__n"))
        .filter(col("__n") > maxBucket).select(col("__vk"))
      v.join(broadcast(hot), Seq("__vk"), "left_anti")
    }
    val cands = side(left, "l_id").join(side(right, "r_id"), "__vk")
      .select(col("l_id"), col("r_id")).distinct()
    cands
      .join(left.select(col(idCol).as("l_id"), col(strCol).as("__sl"),
        charHist(col(strCol)).as("__hl")), "l_id")
      .join(right.select(col(idCol).as("r_id"), col(strCol).as("__sr"),
        charHist(col(strCol)).as("__hr")), "r_id")
      // sound L1 kill (see [[charHist]]) before the banded DP
      .filter(histL1(col("__hl"), col("__hr")) <= 2 * maxDist)
      // banded threshold form: O(d·len) per pair, -1 past the band
      .withColumn("dist", levenshtein(col("__sl"), col("__sr"), maxDist))
      .filter(col("dist") >= 0)
      .select(col("l_id"), col("r_id"), col("dist"))
  }

  /** Length-bucketed q-gram PREFIX-FILTER candidates — the alternate
    * candidate policy for the deletion neighborhood's documented break
    * point (d ≥ 3, long strings: O(len^d) variants explode; this path's
    * per-string work is O(len) grams + a (d·q+1)-gram prefix,
    * INDEPENDENT of d's exponent). ED-Join-style (Gravano et al. 2001
    * count/length filters; Xiao et al. 2008 prefix filtering): two
    * strings within edit distance d share a q-gram among the d·q+1
    * RAREST distinct grams of each (global (frequency, gram) order) —
    * an edit destroys ≤ q positional grams, so ≤ d·q distinct grams
    * can vanish, and the standard prefix argument forces an
    * intersection inside both prefixes. Exact [[levenshtein]] verifies
    * candidates, so precision is always 1; the oracle proves recall
    * (brute-force hash equality, the q47/q101 discipline).
    *
    * Scale shape: grams ride the shuffles as xxhash64 longs (strings
    * never leave their scan until the verify join); the prefix is a
    * per-id window over ≤ len grams (bounded rows per key); candidate
    * pairs are emitted per (PREFIX-gram, length-window) composite
    * bucket — rare grams by construction, and width-d length bins
    * (|Δlen| ≤ d ⇒ adjacent bins) so corpora whose gram universe is
    * small (templated text: even rare grams are corpus-common) still
    * fragment into many small buckets. `maxBucket` caps each
    * composite bucket as the degenerate-corpus guard (audit:
    * [[overflowQGrams]], keyed (gram, window)).
    *
    * Strings too short for the gram-survival bound (len < q·(d+1):
    * fewer than d·q+1 grams survive the worst case) fall into one
    * all-pairs SHORT bucket together with everything length-reachable
    * from them (len ≤ q·(d+1)−1+d — a string more than d longer than
    * any short string can never match it), so recall is complete over
    * the whole length range; the bucket is capped like any other. */
  def selfPairsQGram(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int, q: Int = 2, maxBucket: Int = 4096): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    require(q >= 2, s"q must be >= 2, got $q")
    val prefixLen = maxDist * q + 1
    val gramMin = q * (maxDist + 1)        // gram-survival bound
    val shortMax = gramMin - 1 + maxDist   // length-reachable closure
    val base = Spread.byKey(df, idCol)
      .select(col(idCol).as("__id"), col(strCol).as("__s"),
        length(col(strCol)).as("__len"))
      .filter(col("__id").isNotNull && col("__s").isNotNull)
    // distinct hashed q-grams per long string
    val grams = base.filter(col("__len") >= gramMin)
      .select(col("__id"), col("__len"),
        explode(transform(sequence(lit(1), col("__len") - (q - 1)),
          i => col("__s").substr(i, lit(q)))).as("__g"))
      .select(col("__id"), col("__len"), xxhash64(col("__g")).as("__gk"))
      .distinct()
    val freq = grams.groupBy(col("__gk")).agg(count(lit(1)).as("__f"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__id")).orderBy(col("__f"), col("__gk"))
    val prefix = grams.join(freq, Seq("__gk"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= prefixLen)
      .select(col("__gk"), col("__id"), col("__len"))
    // SHORT bucket: one synthetic key holding every short-reachable id
    val shorts = base.filter(col("__len") <= shortMax)
      .select(lit(Long.MinValue).as("__gk"), col("__id"), col("__len"))
    // Composite (gram, length-window) blocking: |Δlen| ≤ d ⇒ length
    // bins of width d differ by ≤ 1, so REGISTER each id under its own
    // bin and PROBE {bin−1, bin, bin+1} — a true pair shares exactly
    // one (gram, window) key. This is the pair-volume lever on corpora
    // whose gram universe is small (synthetic/templated text, where
    // even the rarest grams are corpus-common): candidates fall by the
    // populated-bin count, and the hot single-bucket emission skew
    // disappears into many small hash-join keys. Pair emission is a
    // streamed join, not a collected array.
    val entries = prefix.unionByName(shorts)
    val wcol = floor(col("__len") / lit(maxDist)).cast("long")
    val reg = entries.select(col("__gk"), col("__id"), col("__len"), wcol.as("__w"))
    val hot = reg.groupBy(col("__gk"), col("__w")).agg(count(lit(1)).as("__n"))
      .filter(col("__n") > maxBucket).select(col("__gk"), col("__w"))
    val probe = entries.select(col("__gk"), col("__id").as("__bid"),
        col("__len").as("__blen"),
        explode(array(wcol - 1, wcol, wcol + 1)).as("__w"))
      .join(broadcast(hot), Seq("__gk", "__w"), "left_anti")
    // (no explicit repartition here, unlike [[pairsQGram]]: the self
    // form's register/probe sides share their heavy subtree through
    // ReuseExchange, and an A/B pin showed added exchanges cost more
    // than AQE's occasional over-coalescing saves — r11)
    val cands = reg.join(broadcast(hot), Seq("__gk", "__w"), "left_anti")
      .join(probe, Seq("__gk", "__w"))
      .filter(col("__id") < col("__bid") &&
        abs(col("__len") - col("__blen")) <= maxDist)
      .select(col("__id").as("a_id"), col("__bid").as("b_id"))
      .distinct()
    cands
      .join(df.select(col(idCol).as("a_id"), col(strCol).as("__sa"),
        charHist(col(strCol)).as("__ha")), "a_id")
      .join(df.select(col(idCol).as("b_id"), col(strCol).as("__sb"),
        charHist(col(strCol)).as("__hb")), "b_id")
      // sound L1 kill (see [[charHist]]) before the banded DP
      .filter(histL1(col("__ha"), col("__hb")) <= 2 * maxDist)
      // banded verify: the threshold form runs O(d·len) per pair and
      // returns -1 past the band, instead of the full O(len²) table
      .withColumn("dist", levenshtein(col("__sa"), col("__sb"), maxDist))
      .filter(col("dist") >= 0)
      .select(col("a_id"), col("b_id"), col("dist"))
  }

  /** Two-table form of [[selfPairsQGram]] (entity linking at any d):
    * all (l_id, r_id, dist) with levenshtein ≤ maxDist. Same prefix-
    * filter machinery; the global gram-frequency order is computed
    * over BOTH sides (recall only needs the two sides to share ONE
    * total order — union frequency is that order, and shared rarity
    * is what keeps the cross-side buckets small). Keys whose side
    * exceeds `maxBucket` are dropped on that side, [[pairs]]-style
    * (the SHORT bucket included). */
  def pairsQGram(left: DataFrame, right: DataFrame, idCol: String,
      strCol: String, maxDist: Int, q: Int = 2,
      maxBucket: Int = 4096): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    require(q >= 2, s"q must be >= 2, got $q")
    val prefixLen = maxDist * q + 1
    val gramMin = q * (maxDist + 1)
    val shortMax = gramMin - 1 + maxDist
    // SINGLE TAGGED-UNION PASS (r11): both sides ride one frame with a
    // side tag, so the gram explode, the distinct, the shared
    // frequency order, and the prefix window are ONE plan subtree —
    // the side filters sit ABOVE it, which lets ReuseExchange dedup
    // every heavy exchange between the register and probe inputs of
    // the candidate join (the previous shape computed left and right
    // through DISTINCT subtrees that nothing could dedup — its
    // exchanges doubled, the q160 bottleneck; an explicit checkpoint
    // was A/B-tested SLOWER in r10, the plan-shape fix is the right
    // lever). The frequency order becomes per-(side, id)-distinct
    // union counts — a different shared total order than before, which
    // the prefix recall proof permits (ANY shared order works) and the
    // brute-force oracle confirms; exact verify keeps precision at 1.
    val tagged = left
      .select(lit(0).as("__side"), col(idCol).as("__id"), col(strCol).as("__s"))
      .unionByName(right
        .select(lit(1).as("__side"), col(idCol).as("__id"), col(strCol).as("__s")))
    val base = Spread.byKey(tagged, "__id")
      .select(col("__side"), col("__id"), col("__s"),
        length(col("__s")).as("__len"))
      .filter(col("__id").isNotNull && col("__s").isNotNull)
    val grams = base.filter(col("__len") >= gramMin)
      .select(col("__side"), col("__id"), col("__len"),
        explode(transform(sequence(lit(1), col("__len") - (q - 1)),
          i => col("__s").substr(i, lit(q)))).as("__g"))
      .select(col("__side"), col("__id"), col("__len"),
        xxhash64(col("__g")).as("__gk"))
      .distinct()
    val freq = grams.groupBy(col("__gk")).agg(count(lit(1)).as("__f"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__side"), col("__id")).orderBy(col("__f"), col("__gk"))
    // prefix entries + the SHORT bucket, still side-tagged — the one
    // shared relation both join inputs (and both hot-bucket counts)
    // filter from. MATERIALIZED: Catalyst pushes the side filters down
    // through the window and the union into per-side subtrees, which
    // un-shares the exchanges ReuseExchange would otherwise dedup —
    // and the relation is TINY by construction (≤ d·q+1 prefix rows
    // per id plus the shorts, never corpus-sized), so one explicit
    // materialization beats recomputing the gram/frequency/window
    // pipeline once per consumer. (This is NOT the r10 checkpoint
    // anti-pattern: there the subtrees were bit-identical and
    // ReuseExchange already shared them; here the pushed-down filters
    // make them structurally different.)
    val entries = grams.join(freq, Seq("__gk"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= prefixLen)
      .select(col("__side"), col("__gk"), col("__id"), col("__len"))
      .unionByName(base.filter(col("__len") <= shortMax)
        .select(col("__side"), lit(Long.MinValue).as("__gk"),
          col("__id"), col("__len")))
      .localCheckpoint()
    // Same composite (gram, length-window) blocking as
    // [[selfPairsQGram]]: left registers under its own width-d bin,
    // right probes the three adjacent ones, so |Δlen| > d pairs never
    // join at all; per-side per-(gram, window) caps as before.
    val wOf: String => Column = c => floor(col(c) / lit(maxDist)).cast("long")
    val lreg = entries.filter(col("__side") === 0)
      .select(col("__gk"), col("__id").as("l_id"), col("__len").as("__ll"),
        wOf("__len").as("__w"))
    val rprobe = entries.filter(col("__side") === 1)
      .select(col("__gk"), col("__id").as("r_id"), col("__len").as("__rl"),
        explode(array(wOf("__len") - 1, wOf("__len"), wOf("__len") + 1))
          .as("__w"))
    def dropHot(df: DataFrame): DataFrame = {
      val hot = df.groupBy(col("__gk"), col("__w")).agg(count(lit(1)).as("__n"))
        .filter(col("__n") > maxBucket).select(col("__gk"), col("__w"))
      df.join(broadcast(hot), Seq("__gk", "__w"), "left_anti")
    }
    // explicit partition counts through the pair join and the verify:
    // the entries relation is BYTE-small, so AQE's size-based
    // coalescing funnels the join (pair EMISSION — the compute-heavy
    // step) and the banded-levenshtein verify into one task; compute
    // per byte is exactly where byte-sized coalescing misjudges, at
    // any scale. A user-specified repartition is exempt from
    // coalescing, and the distinct's group keys match it so no extra
    // shuffle appears.
    val p = left.sparkSession.sessionState.conf.numShufflePartitions
    val cands = dropHot(lreg).repartition(p, col("__gk"), col("__w"))
      .join(dropHot(rprobe).repartition(p, col("__gk"), col("__w")),
        Seq("__gk", "__w"))
      .filter(abs(col("__ll") - col("__rl")) <= maxDist)
      .select(col("l_id"), col("r_id"))
      .repartition(p, col("l_id"), col("r_id"))
      .distinct()
    cands
      .join(left.select(col(idCol).as("l_id"), col(strCol).as("__sl"),
        charHist(col(strCol)).as("__hl")), "l_id")
      .join(right.select(col(idCol).as("r_id"), col(strCol).as("__sr"),
        charHist(col(strCol)).as("__hr")), "r_id")
      // sound L1 kill (see [[charHist]]) before the banded DP
      .filter(histL1(col("__hl"), col("__hr")) <= 2 * maxDist)
      .withColumn("dist", levenshtein(col("__sl"), col("__sr"), maxDist))
      .filter(col("dist") >= 0)
      .select(col("l_id"), col("r_id"), col("dist"))
  }

  /** The (prefix-gram, length-window) buckets [[selfPairsQGram]] would
    * drop at `maxBucket` (the SHORT bucket reports as
    * __gk = Long.MinValue), for audit. */
  def overflowQGrams(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int, q: Int = 2, maxBucket: Int = 4096): DataFrame = {
    val prefixLen = maxDist * q + 1
    val gramMin = q * (maxDist + 1)
    val shortMax = gramMin - 1 + maxDist
    val base = df.select(col(idCol).as("__id"), col(strCol).as("__s"),
        length(col(strCol)).as("__len"))
      .filter(col("__id").isNotNull && col("__s").isNotNull)
    val grams = base.filter(col("__len") >= gramMin)
      .select(col("__id"), col("__len"),
        explode(transform(sequence(lit(1), col("__len") - (q - 1)),
          i => col("__s").substr(i, lit(q)))).as("__g"))
      .select(col("__id"), col("__len"), xxhash64(col("__g")).as("__gk"))
      .distinct()
    val freq = grams.groupBy(col("__gk")).agg(count(lit(1)).as("__f"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__id")).orderBy(col("__f"), col("__gk"))
    grams.join(freq, Seq("__gk"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= prefixLen)
      .select(col("__gk"), col("__id"), col("__len"))
      .unionByName(base.filter(col("__len") <= shortMax)
        .select(lit(Long.MinValue).as("__gk"), col("__id"), col("__len")))
      .groupBy(col("__gk"),
        floor(col("__len") / lit(maxDist)).cast("long").as("__w"))
      .agg(count(lit(1)).as("n_ids"))
      .filter(col("n_ids") > maxBucket)
  }

  /** The (prefix-gram, length-window, side) buckets [[pairsQGram]]
    * would drop at `maxBucket` — the two-table form's audit (same
    * contract as [[overflowQGrams]]; side 0 = left register bins,
    * side 1 = right PROBE bins, counted after the 3-window explode
    * exactly as the join caps them; the SHORT bucket reports as
    * __gk = Long.MinValue). */
  def overflowQGramsTwoTable(left: DataFrame, right: DataFrame,
      idCol: String, strCol: String, maxDist: Int, q: Int = 2,
      maxBucket: Int = 4096): DataFrame = {
    val prefixLen = maxDist * q + 1
    val gramMin = q * (maxDist + 1)
    val shortMax = gramMin - 1 + maxDist
    val tagged = left
      .select(lit(0).as("__side"), col(idCol).as("__id"), col(strCol).as("__s"))
      .unionByName(right
        .select(lit(1).as("__side"), col(idCol).as("__id"), col(strCol).as("__s")))
    val base = tagged
      .select(col("__side"), col("__id"), col("__s"),
        length(col("__s")).as("__len"))
      .filter(col("__id").isNotNull && col("__s").isNotNull)
    val grams = base.filter(col("__len") >= gramMin)
      .select(col("__side"), col("__id"), col("__len"),
        explode(transform(sequence(lit(1), col("__len") - (q - 1)),
          i => col("__s").substr(i, lit(q)))).as("__g"))
      .select(col("__side"), col("__id"), col("__len"),
        xxhash64(col("__g")).as("__gk"))
      .distinct()
    val freq = grams.groupBy(col("__gk")).agg(count(lit(1)).as("__f"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__side"), col("__id")).orderBy(col("__f"), col("__gk"))
    val entries = grams.join(freq, Seq("__gk"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= prefixLen)
      .select(col("__side"), col("__gk"), col("__id"), col("__len"))
      .unionByName(base.filter(col("__len") <= shortMax)
        .select(col("__side"), lit(Long.MinValue).as("__gk"),
          col("__id"), col("__len")))
    val wOf = floor(col("__len") / lit(maxDist)).cast("long")
    entries.filter(col("__side") === 0)
      .select(col("__side"), col("__gk"), wOf.as("__w"))
      .unionByName(entries.filter(col("__side") === 1)
        .select(col("__side"), col("__gk"),
          explode(array(wOf - 1, wOf, wOf + 1)).as("__w")))
      .groupBy(col("__side"), col("__gk"), col("__w"))
      .agg(count(lit(1)).as("n_ids"))
      .filter(col("n_ids") > maxBucket)
  }

  /** The variant buckets [[selfPairs]] would drop at `maxBucket`, for
    * audit (same role as [[NearDup.overflowBuckets]]). */
  def overflowVariants(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int = 1, maxBucket: Int = 4096): DataFrame =
    df.select(col(idCol).as("__id"),
        explode(deletionVariants(col(strCol), maxDist)).as("__v"))
      .select(col("__id"), xxhash64(col("__v")).as("__vk"))
      .distinct()
      .groupBy(col("__vk")).agg(count(lit(1)).as("n_ids"))
      .filter(col("n_ids") > maxBucket)
}
