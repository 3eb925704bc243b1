package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Operational monitoring: forecast pacing and metadata-refresh
  * selection — the analytical kernels of the reference's two
  * scheduled tracker tasks (tasks.py ForecastTracker:1602-1718 reads
  * forecast targets and compares actuals; TransformMonetizationMonitor
  * :2538-2746 selects threshold-meeting, non-ignored entities whose
  * metadata is stale or missing).
  *
  * All pacing math is integer (cents, basis points, floor division)
  * so the readout is bit-identical in any engine — no float
  * percentages that depend on accumulation order.
  */
object Monitor {

  /** q69: forecast attainment / pacing per order priority.
    *
    * The reference reads monthly targets from a sheet; here the
    * target derives deterministically from the data itself — previous
    * full month's revenue plus 10% (integer: prev*11 div 10). For the
    * anchor month (the month of the latest order date, generally
    * partial): month-to-date actuals, a run-rate projection
    * (mtd * days_in_month div days_elapsed), and attainment / pace in
    * basis points against the target.
    *
    * Scale shape: ONE fact scan with conditional aggregation — the
    * per-group prev-month and mtd sums come out of the same map-side
    * combinable groupBy (no month self-join); the anchor/calendar
    * frame is one broadcast row. Output is |groups| rows. Overflow:
    * cents sums are < 2^53 per group at any realistic scale factor
    * and the *10000 basis-point scaling adds 14 bits — a 100 TB
    * revenue column should widen the sum to decimal(38,0), which
    * changes only the two sum() lines. */
  def q69Pacing(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select(
      col("o_orderpriority").as("priority"),
      to_date(col("o_orderdate")).as("day"),
      floor(col("o_totalprice") * 100).cast("bigint").as("cents"))
    val anchor = o.agg(max(col("day")).as("anchor")).select(
      col("anchor"),
      trunc(col("anchor"), "month").as("cur_m"),
      add_months(trunc(col("anchor"), "month"), -1).as("prev_m"),
      dayofmonth(col("anchor")).cast("bigint").as("days_elapsed"),
      dayofmonth(last_day(col("anchor"))).cast("bigint").as("days_in_month"))
    o.crossJoin(broadcast(anchor))
      .groupBy(col("priority"))
      .agg(
        sum(when(col("day") >= col("prev_m") && col("day") < col("cur_m"),
          col("cents")).otherwise(lit(0L))).as("prev_month_cents"),
        sum(when(col("day") >= col("cur_m"), col("cents"))
          .otherwise(lit(0L))).as("mtd_cents"),
        max(col("days_elapsed")).as("days_elapsed"),
        max(col("days_in_month")).as("days_in_month"))
      .withColumn("forecast_cents", expr("(prev_month_cents * 11) div 10"))
      .withColumn("projected_cents",
        expr("(mtd_cents * days_in_month) div days_elapsed"))
      .withColumn("attainment_bp",
        when(col("forecast_cents") > 0,
          expr("(mtd_cents * 10000) div forecast_cents")))
      .withColumn("pace_bp",
        when(col("forecast_cents") > 0,
          expr("(projected_cents * 10000) div forecast_cents")))
      .withColumn("status",
        when(col("forecast_cents") <= 0, lit("no_forecast"))
          .when(col("pace_bp") >= 10000, lit("on_track"))
          .otherwise(lit("behind")))
  }

  /** q70: metadata refresh selection — which high-traffic,
    * non-ignored, unmonetized entities need a metadata rebuild.
    *
    * Mirrors the monitor's get_data step for step: a 30-day traffic
    * aggregate, a threshold filter, an anti-join against an external
    * ignore list (stood in by a deterministic 5% of customer keys —
    * the reference's sheet is just such an id list), a metadata left
    * join, the metadata-borne monetization flag (is_monetized ↦
    * non-negative account balance; unmonetized or metadata-missing
    * entities survive, like the reference's outer merge), and the
    * staleness rule (no metadata row, or last activity more than
    * 6 days before the anchor).
    *
    * Scale shape: the events scan carries the 30-day predicate (at
    * 100 TB that is partition pruning on a date-partitioned fact);
    * ONE map-side combinable groupBy builds traffic + last-seen in a
    * single pass; the ignore list and the customer dim both broadcast
    * (entity dims are small by definition — the traffic side never
    * reshuffles after its aggregate). */
  def q70RefreshSelect(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val anchor = e.agg(max(col("ts")).as("anchor_ts"))
    val traffic = e.crossJoin(broadcast(anchor))
      .filter(col("ts") >= col("anchor_ts") - expr("INTERVAL 30 DAYS"))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("events_30d"),
        sum(floor(col("value") * 100).cast("bigint")).as("value_cents_30d"),
        max(col("ts")).as("last_seen"),
        max(col("anchor_ts")).as("anchor_ts"))
      .filter(col("events_30d") >= 5)
    val ignore = Tables.customer(spark, dir)
      .select(col("c_custkey").as("user_id"))
      .filter(pmod(Exprs.mix32(col("user_id")), lit(20L)) === 0)
    val meta = Tables.customer(spark, dir)
      .select(col("c_custkey").as("user_id"),
        col("c_mktsegment").as("segment"),
        (col("c_acctbal") >= 0).as("is_monetized"))
    traffic
      .join(broadcast(ignore), Seq("user_id"), "left_anti")
      .join(broadcast(meta), Seq("user_id"), "left")
      .filter(col("is_monetized").isNull || !col("is_monetized"))
      .select(
        col("user_id"), col("events_30d"), col("value_cents_30d"),
        col("segment"),
        unix_micros(col("last_seen")).as("last_seen_us"),
        (col("segment").isNull ||
          col("last_seen") <= col("anchor_ts") - expr("INTERVAL 6 DAYS"))
          .as("needs_refresh"))
  }
}
