package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Change-data-capture operators: changelog compaction (merge-on-read
  * → copy-on-write) and slowly-changing-dimension type-2 history.
  * The reference refreshes dimension snapshots wholesale on a Celery
  * schedule (tasks.py WikiMetadata 30-day rebuilds); at 100 TB the
  * same capability is an incremental changelog applied to the prior
  * snapshot — these are the two canonical shapes of that apply step.
  *
  * The events table stands in for the changelog: key = user_id,
  * monotone change sequence = event_id, op derived from event_type
  * ('purchase' plays the delete marker), payload = (value, ts).
  */
object Cdc {

  private def changelog(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).select(
      col("user_id").as("key"),
      col("event_id").as("seq"),
      when(col("event_type") === "purchase", lit("D"))
        .otherwise(lit("U")).as("op"),
      col("value"),
      col("ts"))

  /** CDC changelog compaction: collapse a change stream to the latest
    * row per key, dropping keys whose last operation is a delete.
    *
    * Spark-first shape: ONE map-side-combinable aggregate — `max_by`
    * (a declarative aggregate with a partial-merge path) picks the
    * payload at the max sequence number, so each partition reduces to
    * one candidate row per key before the shuffle. The classic
    * `row_number() OVER (PARTITION BY key ORDER BY seq DESC) = 1`
    * formulation shuffles EVERY change row and sorts each key group;
    * this shuffles one row per (partition, key). At 100 TB the
    * changelog is the big side (weeks of writes vs a bounded key
    * space) — partial aggregation is the difference between shuffling
    * the log and shuffling the snapshot. Deterministic because seq
    * (event_id) is unique per key. */
  def q58CdcMerge(spark: SparkSession, dir: String): DataFrame = {
    changelog(spark, dir)
      .groupBy(col("key"))
      .agg(
        max(col("seq")).as("last_seq"),
        count(lit(1)).as("n_changes"),
        max_by(col("op"), col("seq")).as("last_op"),
        max_by(col("value"), col("seq")).as("last_value"),
        unix_micros(max_by(col("ts"), col("seq"))).as("last_ts_us"))
      .filter(col("last_op") =!= "D")
      .drop("last_op")
  }

  /** SCD type-2 history build: the attribute timeline per key with
    * effective_from / effective_to validity intervals and a current
    * flag, collapsing consecutive duplicate attribute values (a
    * change record that does not change the tracked attribute extends
    * the current interval instead of opening a new one).
    *
    * Shape: two windows, both partitioned BY KEY — per-key state is
    * bounded by that key's change count, so a hot key costs one task,
    * never a global sort. lag() detects attribute transitions (one
    * pass), lead() over only the surviving transition rows closes the
    * intervals. Order is (ts, seq): seq breaks timestamp ties
    * deterministically in both engines. */
  def q59Scd2(spark: SparkSession, dir: String): DataFrame = {
    val attr = Tables.events(spark, dir).select(
      col("user_id").as("key"),
      col("event_id").as("seq"),
      col("ts"),
      col("event_type").as("attr"))
    val byTime = Window.partitionBy(col("key")).orderBy(col("ts"), col("seq"))
    val transitions = attr
      .withColumn("prev_attr", lag(col("attr"), 1).over(byTime))
      .filter(col("prev_attr").isNull || col("attr") =!= col("prev_attr"))
    transitions
      .withColumn("effective_to", lead(col("ts"), 1).over(byTime))
      .select(
        col("key"),
        col("attr"),
        // timestamps surface as epoch micros: exact int64 in any
        // engine (raw timestamp dtypes differ across the gate)
        unix_micros(col("ts")).as("effective_from_us"),
        unix_micros(col("effective_to")).as("effective_to_us"),
        col("effective_to").isNull.as("is_current"),
        col("seq").as("from_seq"))
  }

  /** Corpus SNAPSHOT DIFF — the dataset-versioning readout every
    * training-data release pipeline runs before publishing v(N+1):
    * per source, how many documents were added, removed, changed
    * (same id, different content hash), or untouched, plus churn in
    * basis points. Two deterministic synthetic snapshots derive from
    * the documents table (membership and change markers keyed on
    * mix32(doc_id) — hash-decorrelated from the source column, which
    * is id-periodic in this corpus; old: mix%10!=0 ids, mix%7==0
    * texts carry a ' legacy' suffix; new: mix%11!=5 ids, pristine
    * text), so every diff class is populated in every source and the
    * whole readout is oracle-replayable.
    *
    * Scale shape: content equality compares sha2 hashes, never
    * texts; the FULL OUTER join is id-keyed (co-partitioned hash
    * join); classification is a per-row CASE; the per-source rollup
    * is map-side-combinable. At 100 TB this is two table scans + one
    * id-shuffle — the minimum any snapshot diff pays. */
  def q85SnapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .withColumn("mix", Exprs.mix32(col("doc_id")))
    val old = docs.filter(col("mix") % 10 =!= 0)
      .select(col("doc_id"), col("source").as("src_old"),
        sha2(when(col("mix") % 7 === 0, concat(col("text"), lit(" legacy")))
          .otherwise(col("text")), 256).as("hash_old"))
    val neu = docs.filter(col("mix") % 11 =!= 5)
      .select(col("doc_id"), col("source").as("src_new"),
        sha2(col("text"), 256).as("hash_new"))
    old.join(neu, Seq("doc_id"), "full_outer")
      .select(
        coalesce(col("src_new"), col("src_old")).as("source"),
        when(col("hash_old").isNull, lit("added"))
          .when(col("hash_new").isNull, lit("removed"))
          .when(col("hash_old") =!= col("hash_new"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
      .groupBy(col("source"))
      .agg(
        count(when(col("status") === "added", 1)).as("added"),
        count(when(col("status") === "removed", 1)).as("removed"),
        count(when(col("status") === "changed", 1)).as("changed"),
        count(when(col("status") === "unchanged", 1)).as("unchanged"))
      .select(col("source"), col("added"), col("removed"), col("changed"),
        col("unchanged"),
        expr("(added + removed + changed) * 10000 div (added + removed + changed + unchanged)")
          .as("churn_bp"))
  }
}
