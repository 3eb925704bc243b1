package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Operational profiling of the data itself — the two readouts a
  * 100 TB pipeline needs BEFORE choosing a physical plan or a
  * streaming watermark, re-expressed as one-pass Spark aggregates.
  *
  * The reference sizes its queries by eye (fixed Athena SQL per task,
  * connectors.py:182-452); at cluster scale the equivalents are
  * measured: join-key skew decides salting (SkewJoin.saltedJoin) and
  * AQE skew thresholds, event-time disorder decides watermarks
  * (streaming/ uses fixed 10-minute watermarks — q93 is where that
  * number should come from).
  */
object Profiling {

  /** Per-key-count profile of one prospective join/grouping key:
    * rows, distinct keys, the heaviest key and its count, and the
    * skew factor (max_cnt as a multiple of the uniform per-key share,
    * in percent — 100 = perfectly uniform).
    *
    * Scale shape: ONE map-side-combinable groupBy over the fact scan,
    * then 1-row aggregates over the key-cardinality counts frame —
    * including the argmax, taken as max_by over the lexicographic
    * (cnt, -key) struct so ties break deterministically (highest
    * count, then lowest key) with NO sort and NO second pass. */
  private def keyProfile(df: DataFrame, key: String, label: String): DataFrame = {
    df.groupBy(col(key).cast("long").as("key"))
      .agg(count(lit(1)).as("cnt"))
      .agg(
        count(lit(1)).as("n_keys"),
        sum(col("cnt")).as("n_rows"),
        max(col("cnt")).as("max_cnt"),
        max_by(col("key"), struct(col("cnt"), -col("key"))).as("top_key"))
      .select(lit(label).as("key_name"), col("n_rows"), col("n_keys"),
        col("top_key"), col("max_cnt"),
        expr("max_cnt * n_keys * 100 div n_rows").as("skew_pct"))
  }

  /** q91: join-key skew profile across the fact tables' prospective
    * join keys. skew_pct ~100 means hash-partitioning balances; a
    * large multiple is the signature of a hot key that needs salting
    * (SkewJoin) or AQE skew-join handling. All-integer → oracle-exact.
    * (Overflow note: max_cnt·n_keys·100 needs max_cnt·n_keys below
    * ~9·10^16 — holds through trillions of rows for any key worth
    * hash-joining; a key so degenerate it overflows has already failed
    * the skew test.) */
  def q91SkewProfile(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    keyProfile(li, "l_partkey", "lineitem.l_partkey")
      .union(keyProfile(li, "l_suppkey", "lineitem.l_suppkey"))
      .union(keyProfile(Tables.orders(spark, dir), "o_custkey", "orders.o_custkey"))
      .union(keyProfile(Tables.events(spark, dir), "user_id", "events.user_id"))
  }

  /** q93: event-time disorder audit — the batch measurement that
    * decides a streaming watermark. Arrival order is the per-user
    * event_id sequence; an event's lateness is how far the already-seen
    * event-time high-water mark (running max over arrival order) is
    * ahead of it. Per event-day readout: events, how many would be
    * dropped by candidate watermarks of 1 s / 10 s / 60 s, and the
    * worst lateness — read off the smallest candidate whose drop count
    * is acceptable.
    *
    * Scale shape: one shuffle by user_id + a per-user sort (state
    * bounded per user, the q59 discipline), then a map-side-combinable
    * groupBy(day) of integer counters. No percentile buffering — the
    * drop-count-per-candidate formulation replaces the exact-quantile
    * one precisely because a single-group exact percentile would
    * buffer the day's lateness values (q35's documented trade). */
  def q93WatermarkAudit(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.parallelized(Tables.events(spark, dir), col("user_id"))
      .select(col("user_id"), col("event_id"), col("ts"),
        unix_millis(col("ts")).as("ts_ms"))
    val arrival = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("late_ms", max(col("ts_ms")).over(arrival) - col("ts_ms"))
      .groupBy(to_date(col("ts")).as("day"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("late_ms") > 1000, 1L).otherwise(0L)).as("drop_1s"),
        sum(when(col("late_ms") > 10000, 1L).otherwise(0L)).as("drop_10s"),
        sum(when(col("late_ms") > 60000, 1L).otherwise(0L)).as("drop_60s"),
        max(col("late_ms")).as("max_late_ms"))
  }
}
