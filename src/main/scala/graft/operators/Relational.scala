package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational operators — the query surface of the reference's
  * dashboards and scheduled transforms, re-expressed as declarative
  * DataFrame plans so Catalyst handles pushdown/pruning/join strategy.
  *
  * Numeric policy: sums over double columns are accumulated as exact
  * decimals and only cast to double at the end. Double accumulation is
  * order-dependent and Spark's partial aggregation order differs from a
  * single-node engine's; decimal accumulation is exact, so results are
  * bit-identical regardless of partitioning — a correctness property
  * that must survive a 1000-executor shuffle.
  */
object Relational {

  /** Exact sum of a double column: decimal-accumulate, emit double. */
  private def dsum(c: Column): Column = sum(c.cast("decimal(18,2)")).cast("double")

  /** Pricing summary rollup — filter + groupBy aggregate with partial
    * (map-side) aggregation; mirrors the reference's metric rollups
    * (dash_app.py:384-409, metric_info "calculation" strings).
    */
  def q01AggFilter(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.Tables
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-12-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
          .cast("double").as("sum_disc_price"),
        (sum(col("l_quantity").cast("decimal(18,2)")).cast("double") / count(lit(1)))
          .as("avg_qty"),
        count(lit(1)).as("count_order"))
  }

  /** Star join: fact × 4 dimensions. Dimension sides are explicitly
    * broadcast — at 100 TB the fact table never shuffles for these
    * joins (region/nation/supplier/part stay MBs at any TPC-H SF ratio
    * relevant here; for a truly large `part`, AQE would pick
    * shuffled-hash, which this plan degrades to gracefully).
    * Mirrors the helix join graph (dash_app.py:488-530).
    */
  def q02StarJoin(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.Tables
    val l = Tables.lineitem(spark, dir)
    val s = Tables.supplier(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    val p = Tables.part(spark, dir).filter(col("p_type") === "PROMO")
    l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name").as("region_name"), col("n_name").as("nation_name"))
      .agg(
        sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
          .cast("double").as("revenue"),
        count(lit(1)).as("line_count"))
  }

  /** Global top-N — compiles to TakeOrderedAndProject (per-partition
    * top-N then a single-row-bounded merge on the driver; no full
    * sort). Total ordering includes the key for determinism.
    * Mirrors order-by-metric-desc + limit (dash_app.py:1227-1228).
    */
  def q03TopNOrders(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.Tables
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)
  }

  /** Top-k rows per group via row_number window — one shuffle on the
    * partition key; mirrors top_wiki_id / top_pages rank-per-partition
    * (tasks.py:668-693, 1898-1924).
    */
  /** Reference formulation: window row_number — shuffles every row to
    * sort whole groups. Kept as the spec's equivalence baseline; the
    * default q04 runs the partial-top-k aggregate below. */
  def q04WindowTopN(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.Tables
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("p_retailprice").desc, col("p_partkey").asc)
    Tables.part(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("p_brand"), col("p_partkey"), col("p_name"), col("p_retailprice"), col("rn"))
  }

  /** Scalable top-N per group (the q04 default): a mergeable TopKAgg
    * keeps an O(k) buffer with MAP-SIDE COMBINE, so the shuffle
    * carries at most k rows per brand per partition instead of the
    * whole part table — the window formulation's full-sort exchange
    * is the classic 100 TB top-N bottleneck. Output is proven
    * row-identical to the window version (total tiebreak order), and
    * the same DuckDB oracle pins it. */
  def q04TopNAgg(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.Tables
    import spark.implicits._
    val topk = udaf(new graft.functions.TopKAgg[(Double, Long, String)](
      3, Ordering.by { case (price, key, _) => (-price, key) }))
    Tables.part(spark, dir)
      .groupBy(col("p_brand"))
      .agg(topk(col("p_retailprice"), col("p_partkey"), col("p_name")).as("top"))
      .select(col("p_brand"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("p_brand"), col("t._2").as("p_partkey"), col("t._3").as("p_name"),
        col("t._1").as("p_retailprice"), (col("pos") + 1).cast("int").as("rn"))
  }

  /** count(distinct) metrics per group — Spark plans this as a two-phase
    * Expand + partial aggregate, the scalable equivalent of the
    * reference's `count(distinct amplitude_id)` (dash_app.py:389,405).
    */
  def q05DistinctAgg(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.Tables
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        countDistinct(col("user_id")).as("users"),
        count(lit(1)).as("events"),
        dsum(col("value")).as("value_sum"))
  }

  /** Gap-based sessionization: a session ends after 30 min of
    * inactivity. lag + running-sum window assigns session ids in one
    * shuffle on user_id; the per-session rollup then reuses that
    * partitioning. Mirrors session_details_by_wiki
    * (tasks.py:1984-2005: duration = max-min event time, hit_depth,
    * bounces = single-hit sessions).
    */
  def q06Sessionize(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.Tables
    // the skew-safe variant is the default (one task per hot-user DAY,
    // not per hot user); sessionizeEvents remains the reference
    // implementation both are asserted identical against
    sessionizeEventsScalable(Tables.events(spark, dir))
  }

  /** Gap-based sessionization over any (user_id, event_id, ts) frame. */
  def sessionizeEvents(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapMs = 30L * 60 * 1000
    val withSession = events
      .withColumn("prev_ms", lag(unix_millis(col("ts")), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_ms").isNull ||
          unix_millis(col("ts")) - col("prev_ms") > gapMs, 1).otherwise(0))
      .withColumn("session_seq", sum(col("is_new")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    withSession
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        count(lit(1)).as("hit_depth"),
        (max(unix_millis(col("ts"))) - min(unix_millis(col("ts")))).as("duration_ms"))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("sessions"),
        sum(col("hit_depth")).as("total_events"),
        sum(col("duration_ms")).as("total_duration_ms"),
        sum(when(col("hit_depth") === 1, 1L).otherwise(0L)).as("bounces"))
  }

  /** Skew-safe sessionization — the hot-key fix for sessionizeEvents,
    * whose per-user window serializes a hot user into one task.
    * Phase 1 sessionizes WITHIN (user, day) buckets, spreading a hot
    * user across one task per day. Phase 2 stitches sessions that
    * cross bucket boundaries: bucket-internal sessions are
    * gap-separated, so a day holds at most 86400000/gapMs + 1 of them
    * — the per-user stitch window therefore runs over a PROVABLY
    * bounded row count (~49/day at 30 min) no matter how many events
    * the user produced. Output is identical to sessionizeEvents: a
    * global session splits at bucket edges into pieces whose boundary
    * gaps are <= gapMs, and the stitcher merges exactly those
    * (asserted against sessionizeEvents in RelationalSpec and on
    * random multi-day streams in PropertySpec). */
  def sessionizeEventsScalable(events: DataFrame,
      gapMs: Long = 30L * 60 * 1000): DataFrame = {
    val byUserDay = Window.partitionBy(col("user_id"), col("day"))
      .orderBy(col("ts"), col("event_id"))
    val withSession = events
      .withColumn("day", to_date(col("ts")))
      .withColumn("prev_ms", lag(unix_millis(col("ts")), 1).over(byUserDay))
      .withColumn("is_new",
        when(col("prev_ms").isNull ||
          unix_millis(col("ts")) - col("prev_ms") > gapMs, 1).otherwise(0))
      .withColumn("session_seq", sum(col("is_new")).over(
        byUserDay.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val perBucket = withSession
      .groupBy(col("user_id"), col("day"), col("session_seq"))
      .agg(
        count(lit(1)).as("hits"),
        min(unix_millis(col("ts"))).as("start_ms"),
        max(unix_millis(col("ts"))).as("end_ms"))
    // phase 2: session-granularity stitch — bounded rows per user
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("start_ms"), col("end_ms"))
    perBucket
      .withColumn("prev_end", lag(col("end_ms"), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_end").isNull ||
          col("start_ms") - col("prev_end") > gapMs, 1).otherwise(0))
      .withColumn("merged_seq", sum(col("is_new")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("merged_seq"))
      .agg(
        sum(col("hits")).as("hit_depth"),
        (max(col("end_ms")) - min(col("start_ms"))).as("duration_ms"))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("sessions"),
        sum(col("hit_depth")).as("total_events"),
        sum(col("duration_ms")).as("total_duration_ms"),
        sum(when(col("hit_depth") === 1, 1L).otherwise(0L)).as("bounces"))
  }

  /** Trending: latest day vs the average of the same weekday over the
    * prior 4 weeks. The reference runs one scan per comparison day and
    * self-joins (tasks.py:1757-1851); here a single scan with
    * conditional aggregation covers all five days — at 100 TB that is
    * 1 pass instead of 5 plus a join.
    */
  def q07Trending(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.Tables
    val latest = "2024-01-29"
    val benchDays = Seq(-7, -14, -21, -28).map(d => s"date_add('$latest', $d)")
    val benchSet = s"array(${benchDays.mkString(",")})"
    val ev = Tables.events(spark, dir)
      .withColumn("d", to_date(col("ts")))
      .filter(col("d") === lit(latest).cast("date") ||
        expr(s"array_contains($benchSet, d)"))
    val isLatest = col("d") === lit(latest).cast("date")
    ev.groupBy(col("event_type"))
      .agg(
        countDistinct(when(isLatest, col("user_id"))).as("users"),
        (countDistinct(when(!isLatest, col("user_id"))).cast("double") / 4.0)
          .as("users_benchmark"),
        count(when(isLatest, lit(1))).as("events"),
        (count(when(!isLatest, lit(1))).cast("double") / 4.0).as("events_benchmark"))
      .withColumn("users_vs_benchmark", col("users") - col("users_benchmark"))
      .withColumn("users_pct_vs_benchmark",
        when(col("users_benchmark") > 0, col("users") / col("users_benchmark") - 1.0))
      .withColumn("events_vs_benchmark", col("events") - col("events_benchmark"))
  }

  /** URL/string normalization pipeline — strip query string and anchor,
    * extract domain, collapse whitespace; all codegen'd native string
    * expressions, no UDFs. Mirrors tasks.py:651,1759,1870.
    */
  def q08UrlNormalize(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.Tables
    val url = concat(lit("https://"), col("source"), lit(".example.com/wiki/"),
      col("lang"), lit("?utm=x#frag"))
    Tables.documents(spark, dir)
      .withColumn("page_url", url)
      .withColumn("page", regexp_replace(regexp_replace(col("page_url"), "\\?.*$", ""), "#.*$", ""))
      .withColumn("domain", split(split(col("page_url"), "://").getItem(1), "/").getItem(0))
      .groupBy(col("domain"), col("page"))
      .agg(count(lit(1)).as("docs"), dsum(col("n_chars").cast("double")).as("chars"))
  }
}
