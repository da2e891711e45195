package graft.util

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD

/** Lifecycle control for `localCheckpoint()` blocks.
  *
  * `Dataset.localCheckpoint()` truncates lineage by persisting the
  * computed rows as executor-local RDD blocks — and those blocks stay
  * pinned in the block manager until the SESSION ends, because nothing
  * ever calls `unpersist` on the checkpoint RDD. A long-lived session
  * that runs many operator calls (a bench suite, a production pipeline
  * reusing one SparkSession) therefore accumulates gigabytes of dead
  * blocks and degrades under memory pressure (VERDICT r14 #1: the
  * driver suite's q104/q105 readings at 3-10x their isolated pins).
  *
  * This helper releases them deterministically. Ownership rule used
  * across `graft.operators`:
  *   - an operator that ALLOCATES a checkpoint releases it before
  *     returning, UNLESS the returned frame still reads from it;
  *   - an operator whose RESULT is itself a checkpoint (or reads one)
  *     documents that, and the consumer releases the result with
  *     [[release]] once its terminal action has run;
  *   - iterative operators release each superseded round's checkpoint
  *     as soon as the next round is materialized.
  *
  * DANGER: a localCheckpoint'd dataset CANNOT be recomputed after
  * release — its lineage was truncated, so any later action on it (or
  * on a frame derived from it) fails with a missing-block error.
  * Release only what no live plan still references.
  */
object Ckpt {

  /** The checkpoint RDDs a dataset's plan reads from: every
    * [[LogicalRDD]] leaf of the analyzed plan. For a frame built on
    * `df.localCheckpoint()` this is exactly the checkpoint block set
    * (localCheckpoint wraps the materialized RDD in a LogicalRDD). */
  private def checkpointRdds(ds: Dataset[_]): Seq[org.apache.spark.rdd.RDD[_]] =
    ds.queryExecution.analyzed.collect { case l: LogicalRDD => l.rdd }.toSeq

  /** Unpersist the executor blocks behind every localCheckpoint
    * reachable from each dataset's plan (non-blocking: the map entry
    * is removed synchronously, block deletion is async). The datasets
    * — and anything derived from them — must not be used afterwards. */
  def release(dss: Dataset[_]*): Unit =
    dss.foreach { ds =>
      checkpointRdds(ds).foreach(_.unpersist(blocking = false))
    }

  /** Unpersist EVERY persisted RDD in the session except `keep` —
    * the between-queries sweep for a long-lived session running
    * independent workloads (Bench, Verify). Returns how many were
    * released. Safe only at a quiescent point: nothing in flight may
    * still read a checkpoint allocated by earlier work. */
  def sweep(spark: SparkSession, keep: Set[Int] = Set.empty): Int = {
    val doomed = spark.sparkContext.getPersistentRDDs
      .filterNot { case (id, _) => keep(id) }
    doomed.valuesIterator.foreach(_.unpersist(blocking = false))
    doomed.size
  }

  /** Ids of currently persisted RDDs — the baseline for leak specs. */
  def persistedIds(spark: SparkSession): Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet
}
