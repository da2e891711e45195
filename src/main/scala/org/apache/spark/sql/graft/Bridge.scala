package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal private[sql] bridge: build a DataFrame from a custom
  * LogicalPlan. Lives under org.apache.spark.sql (standard extension-
  * library practice) because Dataset.ofRows is private[sql]. */
object Bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Wrap a catalyst Expression as a user-facing Column (for native
    * expressions whose construction needs non-SQL-literal config, e.g. an
    * embedded hyperplane matrix). */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): org.apache.spark.sql.Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  def expression(c: org.apache.spark.sql.Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)

  /** Re-tag a batch DataFrame as STREAMING (isStreaming=true relation
    * over its physical RDD) — the contract of a V1 streaming Source's
    * getBatch: MicroBatchExecution asserts the returned frame IS
    * streaming before splicing its plan into the trigger's batch. */
  def asStreamingBatch(df: DataFrame): DataFrame = {
    val classic = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classic.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }

  /** The inverse of [[asStreamingBatch]]: materialize a V1 streaming
    * Sink's per-trigger DataFrame as an ordinary BATCH frame over its
    * physical RDD — Spark's own ForeachBatchSink does exactly this, so
    * sink logic can run arbitrary multi-action plans (joins, merges)
    * against the batch without re-triggering the incremental plan. */
  def asBatch(df: DataFrame): DataFrame = {
    val classic = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classic.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = false)
  }

  /** Idempotently add a planner strategy to the session. */
  def registerStrategy(spark: SparkSession,
      strategy: org.apache.spark.sql.execution.SparkStrategy): Unit = {
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].experimental
    if (!exp.extraStrategies.contains(strategy))
      exp.extraStrategies = exp.extraStrategies :+ strategy
  }
}
