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

  /** Ids of every shuffle currently registered with the driver's map
    * output tracker. Snapshot/diff pairs of this set let an iterative
    * operator name exactly the shuffles its own rounds created. */
  def shuffleIds(spark: org.apache.spark.sql.SparkSession): Set[Int] =
    org.apache.spark.SparkEnv.get.mapOutputTracker
      .asInstanceOf[org.apache.spark.MapOutputTrackerMaster]
      .shuffleStatuses.keySet.toSet

  /** Deterministically release the given shuffles NOW — unregister the
    * map outputs and delete the shuffle files — instead of waiting for
    * the ContextCleaner to notice the referencing RDDs are garbage.
    * This is the disk-hygiene twin of releaseCheckpoints: an iterative
    * operator that truncates its lineage (localCheckpoint) has PROVED
    * the pre-truncation shuffles dead, but the JVM may not GC the plan
    * objects for many minutes on a large heap — at sf100 one PageRank
    * round's contribution shuffle is ~10 GB, so three retained dead
    * rounds exceed the local-disk budget while the live working set
    * fits easily (the committed r8 ENOSPC). Blocking: the files are
    * gone when this returns, so the next round's writes see the space.
    *
    * Callers must only pass ids whose results can no longer be needed:
    * ids created by THIS operator's already-materialized rounds, never
    * a baseline id that predates the operator (a sequential driver —
    * Bench/Verify run queries one at a time — makes the since-baseline
    * diff exact). Cleaning is idempotent; the ContextCleaner's later
    * GC-driven pass over the same ids is a no-op. */
  def removeShuffles(spark: org.apache.spark.sql.SparkSession,
      ids: Iterable[Int]): Unit =
    spark.sparkContext.cleaner.foreach { c =>
      ids.foreach(id => c.doCleanupShuffle(id, blocking = true))
    }

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
