package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Thin bridge into `private[sql]` constructors needed to attach custom
  * logical plans to the public Dataset API (the standard technique for
  * Spark extension libraries). Kept to the minimum surface: wrap a
  * LogicalPlan as a DataFrame and read a DataFrame's analyzed plan.
  */
object Bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  def analyzed(df: DataFrame): LogicalPlan = df.queryExecution.analyzed

  /** Wrap a raw Catalyst Expression as a user-facing Column — needed by
    * expressions whose construction carries non-Expression state (e.g.
    * NearestCentroid's centroid matrix), which the function registry's
    * Seq[Expression]-builder signature can't convey.
    */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  /** Unpersist the block-backed leaves of a frame's analyzed plan — the
    * RDDs a `localCheckpoint()` left in the block manager. `unpersist()`
    * on the Dataset only clears CacheManager entries; checkpoint blocks
    * are otherwise freed only when the RDD is garbage-collected.
    */
  def freeCheckpointBlocks(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Block until the async listener bus has delivered every queued
    * event — profilers that read SparkListener-accumulated counters
    * (spill/shuffle totals) must drain before sampling, or a stage's
    * last task-end events get misattributed to the next timed block.
    */
  def drainListenerBus(spark: SparkSession, timeoutMs: Long = 10000L): Unit =
    try spark.sparkContext.listenerBus.waitUntilEmpty(timeoutMs)
    catch {
      // a backlogged bus means slightly-stale counters, not a reason to
      // kill the profiling run
      case _: java.util.concurrent.TimeoutException => ()
    }
}
