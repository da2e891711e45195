package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** ASYMMETRIC near-dup — containment and novelty over word n-grams.
  *
  * Jaccard-family dedup ([[NearDup]]) misses the one-sided case: a
  * short document wholly quoted inside a much longer one has high
  * containment C(A,B) = |grams(A) ∩ grams(B)| / |grams(A)| but low
  * Jaccard (the union is dominated by B). Containment is the right
  * measure for "this page embeds that boilerplate/article" — the
  * subset-dup class a training-data pipeline must catch separately.
  *
  * Scale shape (same discipline as [[Contamination]]/[[NearDup]]):
  * grams ride shuffles as 60-bit md5 longs, never strings; pair
  * generation is an equi-join on gram hash whose blowup is CAPPED by
  * dropping grams with document frequency > `maxDf` (stopword shingles
  * — "of the and" — would otherwise contribute df² pairs each; with
  * the cap the join output is ≤ maxDf · Σdf). The cap is part of the
  * declared similarity (totals count only surviving grams), so the
  * result is deterministic and engine-independent — not a recall-lossy
  * heuristic bolted on after.
  */
object Containment {

  /** Unordered candidate pairs (a_id < b_id) with exact shared-gram
    * count and BOTH containments over the df-capped gram sets; keeps
    * pairs where either direction ≥ `tau`. Returns
    * (a_id, b_id, shared, cont_a, cont_b), containments rounded to
    * 6 dp. */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, tau: Double = 0.6, maxDf: Int = 50): DataFrame = {
    val dg = docGrams(df, idCol, textCol, n)
    val freq = dg.groupBy(col("__h")).agg(count(lit(1)).as("__df"))
    // surviving (doc, gram) rows: gram seen in ≤ maxDf docs
    val live = dg.join(freq.filter(col("__df") <= maxDf).select(col("__h")), Seq("__h"))
      .localCheckpoint() // feeds totals AND both sides of the pair join
    val totals = live.groupBy(col(idCol)).agg(count(lit(1)).as("__n"))
    val shared = live.as("a")
      .join(live.as("b"),
        col("a.__h") === col("b.__h") && col(s"a.$idCol") < col(s"b.$idCol"))
      .groupBy(col(s"a.$idCol").as("a_id"), col(s"b.$idCol").as("b_id"))
      .agg(count(lit(1)).as("shared"))
    val contA = col("shared").cast("double") / col("__na").cast("double")
    val contB = col("shared").cast("double") / col("__nb").cast("double")
    shared
      .join(totals.select(col(idCol).as("a_id"), col("__n").as("__na")), Seq("a_id"))
      .join(totals.select(col(idCol).as("b_id"), col("__n").as("__nb")), Seq("b_id"))
      .filter(greatest(contA, contB) >= tau)
      .select(col("a_id"), col("b_id"), col("shared"),
        round(contA, 6).as("cont_a"), round(contB, 6).as("cont_b"))
  }

  /** Per-doc n-gram NOVELTY vs all earlier docs (ascending `idCol` is
    * the corpus order): the fraction of a doc's distinct grams whose
    * FIRST corpus occurrence is this doc. Low novelty = the doc mostly
    * restates earlier text — the streaming-ingest complement of
    * containment (no pair enumeration: one min-aggregate per gram and
    * one join back, both on long keys). Returns
    * (idCol, n_grams, n_novel, novelty) with novelty rounded to 6 dp;
    * docs with no text still get a row (novelty NULL). */
  def noveltyScores(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3): DataFrame = {
    val dg = docGrams(df, idCol, textCol, n).localCheckpoint()
    val first = dg.groupBy(col("__h")).agg(min(col(idCol)).as("__first"))
    val per = dg.join(first, Seq("__h"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum((col(idCol) === col("__first")).cast("long")).as("n_novel"))
      .select(col(idCol), col("n_grams"), col("n_novel"),
        round(col("n_novel").cast("double") / col("n_grams").cast("double"), 6)
          .as("novelty"))
    df.select(col(idCol)).join(per, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        col("novelty"))
  }

  /** One row per (doc, distinct word n-gram), gram as 60-bit hash.
    * Distinctness is at the gram-STRING level ([[TextFunctions
    * .wordNGrams]]); two strings colliding to one hash stay two rows,
    * identically in the md5-replaying oracle.
    *
    * A small corpus often arrives as ONE input split, which would run
    * the expensive explode+hash on a single task — spread it first
    * when the scan is under-parallelized (a no-op at scale, where the
    * file splits already exceed the shuffle width). */
  private def docGrams(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    Spread.byKey(df, idCol).select(col(idCol),
        explode(TextFunctions.wordNGrams(
          TextFunctions.words(col(textCol)), n)).as("__g"))
      .select(col(idCol), Contamination.gramHash(col("__g")).as("__h"))
  }
}
