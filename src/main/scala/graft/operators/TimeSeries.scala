package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Time-series repair: calendar densification (gap fill) with
  * zero-fill and last-observation-carried-forward — the step between
  * a sparse fact aggregate and anything windowed over it (the
  * reference's trend panels assume a dense daily axis; q61's rolling
  * z-score window is calendar-bounded only if the series is dense).
  */
object TimeSeries {

  /** q66: densify the per-priority daily revenue series over the full
    * calendar span. Gap days get revenue 0, a gap flag, the last
    * observed revenue carried forward, and the days-since-last-order
    * staleness counter.
    *
    * Scale shape: the fact table is scanned ONCE into the daily
    * aggregate (map-side combinable); the calendar frame is
    * |groups|×|days| — metadata-sized at any fact scale — built from
    * a broadcast 1-row span. The left join and the carry-forward
    * windows run on the DENSE series, partitioned by group and
    * bounded by calendar days per group, never by fact rows. */
  def q66GapFill(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val daily = o
      .groupBy(col("o_orderpriority").as("priority"),
        to_date(col("o_orderdate")).as("day"))
      .agg(
        sum(floor(col("o_totalprice") * 100).cast("bigint")).as("rev_cents"),
        count(lit(1)).as("n_orders"))
    val span = o.agg(
      min(to_date(col("o_orderdate"))).as("d0"),
      max(to_date(col("o_orderdate"))).as("d1"))
    val calendar = o.select(col("o_orderpriority").as("priority")).distinct()
      .crossJoin(broadcast(span))
      .select(col("priority"), explode(sequence(col("d0"), col("d1"))).as("day"))
    val dense = calendar.join(daily, Seq("priority", "day"), "left")
    val w = Window.partitionBy(col("priority")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dense.select(
      col("priority"), col("day"),
      coalesce(col("rev_cents"), lit(0L)).as("revenue_cents"),
      coalesce(col("n_orders"), lit(0L)).as("orders"),
      col("n_orders").isNull.as("is_gap"),
      last(col("rev_cents"), ignoreNulls = true).over(w).as("carried_cents"),
      datediff(col("day"),
        last(when(col("n_orders").isNotNull, col("day")), ignoreNulls = true)
          .over(w)).cast("bigint").as("days_since_order"))
  }
}
