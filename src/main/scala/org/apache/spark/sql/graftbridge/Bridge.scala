package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge. Spark 4 made the Expression-backed
  * Column constructor private[sql]; a library shipping custom Catalyst
  * expressions needs exactly this seam, so we expose it from inside
  * the sql package tree (same technique Spark's own extensions use).
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** The persisted RDD behind a localCheckpoint()ed Dataset, if any.
    * Dataset.localCheckpoint truncates lineage into a LogicalRDD whose
    * blocks stay persisted until GC/ContextCleaner; exposing the RDD
    * handle lets iterative operators unpersist intermediates the moment
    * their bounded result is materialized, instead of littering the
    * block manager for the life of the session. */
  def checkpointRdd(df: org.apache.spark.sql.DataFrame)
      : Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD => Some(l.rdd)
      case _ => None
    }

  /** Release the checkpoint blocks of the given frames (no-op for
    * frames that are not checkpoint-backed). Callers must not evaluate
    * the freed frames afterwards — localCheckpoint lineage cannot be
    * recomputed. */
  def releaseCheckpoints(dfs: org.apache.spark.sql.DataFrame*): Unit =
    dfs.foreach(df => checkpointRdd(df).foreach(_.unpersist(blocking = false)))

  /** Imperative function registration on a live session (the
    * config-time path is SparkSessionExtensions.injectFunction). */
  def registerFunction(
      spark: org.apache.spark.sql.SparkSession,
      name: String,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier(name), info, builder)
}
