package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** User-behavior analytics: entry-path distribution and RFM
  * segmentation — the reference's product-analytics face (dash_app.py
  * funnel/cohort panels) beyond the q55 funnel and q56 retention.
  */
object Behavior {

  /** q65: distribution of each user's first-3-event-type path (the
    * "how do users start" view).
    *
    * Scale shape: the first-k extraction is the mergeable TopKAgg
    * keyed by (ts, event_id) — the shuffle carries at most 3 rows per
    * user per partition, where the ubiquitous `row_number() <= 3`
    * window would shuffle and sort EVERY event. The path histogram
    * after it is |types|^3-bounded, and the share denominator is a
    * 1-row broadcast. */
  def q65SessionPaths(spark: SparkSession, dir: String): DataFrame = {
    val first3 = udaf(new graft.functions.TopKAgg[(Long, Long, String)](
      3, Ordering.by(t => (t._1, t._2))))
    val e = Tables.events(spark, dir)
    val paths = e
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("event_type"))
      .groupBy(col("user_id"))
      .agg(first3(col("ts_us"), col("event_id"), col("event_type")).as("first3"))
      .select(
        array_join(transform(col("first3"), x => x.getField("_3")), ">")
          .as("path"),
        size(col("first3")).cast("bigint").as("depth"))
    val total = e.agg(count_distinct(col("user_id")).as("total_users"))
    paths.groupBy(col("path"), col("depth"))
      .agg(count(lit(1)).as("n_users"))
      .crossJoin(broadcast(total))
      .select(col("path"), col("depth"), col("n_users"),
        (col("n_users").cast("double") / col("total_users").cast("double"))
          .as("share"))
  }

  /** q71: RFM (recency / frequency / monetary) customer segmentation.
    *
    * Scale shape: per-customer metrics are one map-side-combinable
    * groupBy over orders; the quintile boundaries are ONE 1-row
    * aggregate (12 doubles) broadcast into a scan-side comparison —
    * scoring never sorts the customer table, where the textbook
    * `ntile(5)` formulation is a single-partition global sort. Exact
    * interpolated percentiles (= DuckDB quantile_cont, the q35-proven
    * pair) keep the oracle bit-exact; approx_percentile is the
    * drop-in at 100 TB where exact percentile's driver-side buffer
    * stops fitting. Output is the ≤125-cell segment matrix. */
  def q71Rfm(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val anchor = o.agg(max(to_date(col("o_orderdate"))).as("anchor"))
    val perCust = o
      .groupBy(col("o_custkey"))
      .agg(
        max(to_date(col("o_orderdate"))).as("last_day"),
        count(lit(1)).as("frequency"),
        sum(floor(col("o_totalprice") * 100).cast("bigint")).as("monetary_cents"))
      .crossJoin(broadcast(anchor))
      .select(col("o_custkey"),
        datediff(col("anchor"), col("last_day")).cast("bigint").as("recency_days"),
        col("frequency"), col("monetary_cents"))
    val qs = array(lit(0.2), lit(0.4), lit(0.6), lit(0.8))
    val bounds = perCust.agg(
      percentile(col("recency_days"), qs).as("rq"),
      percentile(col("frequency"), qs).as("fq"),
      percentile(col("monetary_cents"), qs).as("mq"))
    def upScore(m: Column, b: Column): Column =
      lit(1L) + (0 until 4).map(i =>
        when(m.cast("double") > element_at(b, i + 1), 1L).otherwise(0L))
        .reduce(_ + _)
    // recency: lower is better — count boundaries we are strictly under
    def downScore(m: Column, b: Column): Column =
      lit(1L) + (0 until 4).map(i =>
        when(m.cast("double") < element_at(b, i + 1), 1L).otherwise(0L))
        .reduce(_ + _)
    perCust.crossJoin(broadcast(bounds))
      .select(
        downScore(col("recency_days"), col("rq")).as("r_score"),
        upScore(col("frequency"), col("fq")).as("f_score"),
        upScore(col("monetary_cents"), col("mq")).as("m_score"),
        col("monetary_cents"))
      .groupBy(col("r_score"), col("f_score"), col("m_score"))
      .agg(
        count(lit(1)).as("customers"),
        sum(col("monetary_cents")).as("cell_cents"))
      .select(col("r_score"), col("f_score"), col("m_score"),
        col("customers"), col("cell_cents"),
        when(col("r_score") >= 4 && col("f_score") >= 4 && col("m_score") >= 4,
          lit("champion"))
          .when(col("r_score") <= 2 && col("f_score") >= 4, lit("at_risk"))
          .when(col("f_score") >= 3, lit("loyal"))
          .otherwise(lit("casual")).as("segment"))
  }
}
