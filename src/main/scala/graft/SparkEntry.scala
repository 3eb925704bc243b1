package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * Every entry in `queries` has a same-named, same-aliased DuckDB SQL
  * in `oracleSql` unless the op is not SQL-expressible (then the driver
  * records a rows-only check and the ScalaTest spec carries the oracle).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q02StarJoin(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_agg_filter"    -> Relational.q01AggFilter _,
    "q02_star_join"     -> Relational.q02StarJoin _,
    "q03_topn_order"    -> Relational.q03TopNOrders _,
    "q04_window_topn"   -> Relational.q04WindowTopN _,
    "q05_distinct_agg"  -> Relational.q05DistinctAgg _,
    "q06_sessionize"    -> Relational.q06Sessionize _,
    "q07_trending"      -> Relational.q07Trending _,
    "q08_url_normalize" -> Relational.q08UrlNormalize _,
    "q09_explode_conf"  -> Analytics.q09ExplodeConf _,
    "q10_dynamic_cube"  -> Cube.q10DynamicCube _,
    "q11_pivot"         -> Analytics.q11Pivot _,
    "q12_calendar_window" -> Analytics.q12CalendarWindow _,
    "q13_date_intervals"  -> Analytics.q13DateIntervals _,
    "q14_threshold_monitor" -> Analytics.q14ThresholdMonitor _,
    "q15_bin_histogram" -> Analytics.q15BinHistogram _,
    "q16_num_format"    -> Analytics.q16NumFormat _,
  )

  def oracleSql: Map[String, String] = Map(
    "q01_agg_filter" -> """
      SELECT
        l_returnflag,
        l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-12-01'
      GROUP BY l_returnflag, l_linestatus
    """,
    "q02_star_join" -> """
      SELECT
        r_name AS region_name,
        n_name AS nation_name,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        COUNT(*) AS line_count
      FROM lineitem
      JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name
    """,
    "q03_topn_order" -> """
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders
      ORDER BY o_totalprice DESC, o_orderkey ASC
      LIMIT 10
    """,
    "q04_window_topn" -> """
      SELECT p_brand, p_partkey, p_name, p_retailprice, rn FROM (
        SELECT p_brand, p_partkey, p_name, p_retailprice,
          ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey ASC) AS rn
        FROM part
      ) WHERE rn <= 3
    """,
    "q05_distinct_agg" -> """
      SELECT
        event_type,
        COUNT(DISTINCT user_id) AS users,
        COUNT(*) AS events,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
      FROM events
      GROUP BY event_type
    """,
    "q06_sessionize" -> """
      WITH flagged AS (
        SELECT user_id, ts, event_id,
          CASE WHEN LAG(epoch_ms(ts)) OVER w IS NULL
                 OR epoch_ms(ts) - LAG(epoch_ms(ts)) OVER w > 1800000
               THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ),
      sessions AS (
        SELECT user_id, ts,
          SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS session_seq
        FROM flagged
      ),
      per_session AS (
        SELECT user_id, session_seq,
          COUNT(*) AS hit_depth,
          MAX(epoch_ms(ts)) - MIN(epoch_ms(ts)) AS duration_ms
        FROM sessions GROUP BY user_id, session_seq
      )
      SELECT user_id,
        COUNT(*) AS sessions,
        SUM(hit_depth) AS total_events,
        SUM(duration_ms) AS total_duration_ms,
        SUM(CASE WHEN hit_depth = 1 THEN 1 ELSE 0 END) AS bounces
      FROM per_session GROUP BY user_id
    """,
    "q07_trending" -> """
      SELECT *,
        users - users_benchmark AS users_vs_benchmark,
        CASE WHEN users_benchmark > 0 THEN users / users_benchmark - 1.0 END AS users_pct_vs_benchmark,
        events - events_benchmark AS events_vs_benchmark
      FROM (
        SELECT
          event_type,
          COUNT(DISTINCT CASE WHEN CAST(ts AS DATE) = DATE '2024-01-29' THEN user_id END) AS users,
          CAST(COUNT(DISTINCT CASE WHEN CAST(ts AS DATE) <> DATE '2024-01-29' THEN user_id END) AS DOUBLE) / 4.0 AS users_benchmark,
          COUNT(CASE WHEN CAST(ts AS DATE) = DATE '2024-01-29' THEN 1 END) AS events,
          CAST(COUNT(CASE WHEN CAST(ts AS DATE) <> DATE '2024-01-29' THEN 1 END) AS DOUBLE) / 4.0 AS events_benchmark
        FROM events
        WHERE (CAST(ts AS DATE) = DATE '2024-01-29' OR CAST(ts AS DATE) = DATE '2024-01-22'
               OR CAST(ts AS DATE) = DATE '2024-01-15' OR CAST(ts AS DATE) = DATE '2024-01-08'
               OR CAST(ts AS DATE) = DATE '2024-01-01')
        GROUP BY event_type
      )
    """,
    "q08_url_normalize" -> """
      WITH urls AS (
        SELECT *, 'https://' || source || '.example.com/wiki/' || lang || '?utm=x#frag' AS page_url
        FROM documents
      )
      SELECT
        split_part(split_part(page_url, '://', 2), '/', 1) AS domain,
        regexp_replace(regexp_replace(page_url, '\?.*$', ''), '#.*$', '') AS page,
        COUNT(*) AS docs,
        CAST(SUM(CAST(n_chars AS DECIMAL(18,2))) AS DOUBLE) AS chars
      FROM urls
      GROUP BY 1, 2
    """,
    "q09_explode_conf" -> """
      WITH tax AS (
        SELECT doc_id, n_chars, lang AS value, (doc_id % 10) / 10.0 AS conf FROM documents
        UNION ALL
        SELECT doc_id, n_chars, source AS value, ((doc_id * 7) % 10) / 10.0 AS conf FROM documents
      )
      SELECT value, COUNT(*) AS docs,
        CAST(SUM(CAST(conf AS DECIMAL(18,1))) AS DOUBLE) AS conf_sum,
        SUM(n_chars) AS chars
      FROM tax WHERE conf >= 0.5 GROUP BY value
    """,
    "q10_dynamic_cube" -> """
      WITH base AS (
        SELECT event_type, user_id, value,
          't' || CAST(user_id % 5 AS VARCHAR) AS tag1,
          'u' || CAST(user_id % 3 AS VARCHAR) AS tag2,
          (event_id % 10) / 10.0 AS conf1,
          ((event_id * 3) % 10) / 10.0 AS conf2
        FROM events
        WHERE value >= 1.0
          AND (event_type IN ('click','view','purchase') OR user_id < 100)
          AND NOT (event_type = 'error')
      ),
      exploded AS (
        SELECT event_type, user_id, value, tag1 AS tag, conf1 AS conf FROM base
        UNION ALL
        SELECT event_type, user_id, value, tag2 AS tag, conf2 AS conf FROM base
      )
      SELECT * FROM (
        SELECT event_type, tag,
          COUNT(DISTINCT user_id) AS users,
          COUNT(*) AS events,
          CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
        FROM exploded WHERE conf >= 0.5
        GROUP BY event_type, tag
      ) WHERE users >= 1
      ORDER BY users DESC, event_type ASC, tag ASC LIMIT 100
    """,
    "q11_pivot" -> """
      SELECT CAST(ts AS DATE) AS day,
        CAST(SUM(CASE WHEN event_type='click' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS "click",
        CAST(SUM(CASE WHEN event_type='view' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS "view",
        CAST(SUM(CASE WHEN event_type='purchase' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS "purchase",
        CAST(SUM(CASE WHEN event_type='signup' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS "signup",
        CAST(SUM(CASE WHEN event_type='error' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS "error"
      FROM events GROUP BY 1
    """,
    "q12_calendar_window" -> """
      WITH m AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS ms, o_totalprice FROM orders
        WHERE CAST(date_trunc('month', o_orderdate) AS DATE) IN
          (DATE '2001-07-01', DATE '2001-06-01', DATE '2000-07-01')
      ),
      agg AS (
        SELECT
          CAST(SUM(CASE WHEN ms = DATE '2001-07-01' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS revenue,
          CAST(SUM(CASE WHEN ms = DATE '2001-06-01' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS mom_revenue,
          CAST(SUM(CASE WHEN ms = DATE '2000-07-01' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS yoy_revenue,
          COUNT(CASE WHEN ms = DATE '2001-07-01' THEN 1 END) AS orders
        FROM m
      )
      SELECT *, DATE '2001-07-01' AS month_start,
        CASE WHEN mom_revenue > 0 THEN revenue/mom_revenue - 1.0 END AS mom_pct,
        CASE WHEN yoy_revenue > 0 THEN revenue/yoy_revenue - 1.0 END AS yoy_pct
      FROM agg
    """,
    "q13_date_intervals" -> """
      WITH spine AS (
        SELECT CAST(gs AS DATE) AS day
        FROM generate_series(DATE '2024-01-01', DATE '2024-01-31', INTERVAL 1 DAY) t(gs)
      ),
      daily AS (
        SELECT CAST(ts AS DATE) AS day, COUNT(*) AS events,
          CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
        FROM events GROUP BY 1
      )
      SELECT spine.day, COALESCE(daily.events, 0) AS events,
        COALESCE(daily.value_sum, 0.0) AS value_sum
      FROM spine LEFT JOIN daily USING (day)
    """,
    "q14_threshold_monitor" -> """
      SELECT user_id, COUNT(*) AS events,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum,
        COUNT(CASE WHEN event_type='purchase' THEN 1 END) AS purchases
      FROM events WHERE CAST(ts AS DATE) >= DATE '2024-01-24'
      GROUP BY user_id
      HAVING COUNT(CASE WHEN event_type='purchase' THEN 1 END) = 0
         AND CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) >= 50.0
    """,
    "q15_bin_histogram" -> """
      SELECT bin, COUNT(*) AS orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        bin * 50000.0 AS bin_lo,
        CASE WHEN bin < 9 THEN (bin + 1) * 50000.0 END AS bin_hi
      FROM (SELECT CAST(LEAST(FLOOR(o_totalprice / 50000.0), 9.0) AS BIGINT) AS bin,
              o_totalprice FROM orders)
      GROUP BY bin
    """,
    "q16_num_format" -> """
      WITH agg AS (
        SELECT o_orderpriority,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
          COUNT(*) AS orders
        FROM orders GROUP BY 1
      ),
      fmt AS (
        SELECT *,
          CAST(CAST(revenue AS DECIMAL(30,2)) * 100 AS BIGINT) AS rev_cents,
          orders * 100 AS ord_cents
        FROM agg
      )
      SELECT o_orderpriority, revenue, orders,
        CASE
          WHEN revenue >= 1e12 THEN CAST((rev_cents*20 + 100000000000000) // 200000000000000 // 10 AS VARCHAR) || '.' || CAST((rev_cents*20 + 100000000000000) // 200000000000000 % 10 AS VARCHAR) || 'T'
          WHEN revenue >= 1e9  THEN CAST((rev_cents*20 + 100000000000) // 200000000000 // 10 AS VARCHAR) || '.' || CAST((rev_cents*20 + 100000000000) // 200000000000 % 10 AS VARCHAR) || 'B'
          WHEN revenue >= 1e6  THEN CAST((rev_cents*20 + 100000000) // 200000000 // 10 AS VARCHAR) || '.' || CAST((rev_cents*20 + 100000000) // 200000000 % 10 AS VARCHAR) || 'M'
          WHEN revenue >= 1e3  THEN CAST((rev_cents*20 + 100000) // 200000 // 10 AS VARCHAR) || '.' || CAST((rev_cents*20 + 100000) // 200000 % 10 AS VARCHAR) || 'K'
          ELSE CAST((rev_cents*20 + 100) // 200 // 10 AS VARCHAR) || '.' || CAST((rev_cents*20 + 100) // 200 % 10 AS VARCHAR)
        END AS revenue_fmt,
        CASE
          WHEN orders >= 1e12 THEN CAST((ord_cents*20 + 100000000000000) // 200000000000000 // 10 AS VARCHAR) || '.' || CAST((ord_cents*20 + 100000000000000) // 200000000000000 % 10 AS VARCHAR) || 'T'
          WHEN orders >= 1e9  THEN CAST((ord_cents*20 + 100000000000) // 200000000000 // 10 AS VARCHAR) || '.' || CAST((ord_cents*20 + 100000000000) // 200000000000 % 10 AS VARCHAR) || 'B'
          WHEN orders >= 1e6  THEN CAST((ord_cents*20 + 100000000) // 200000000 // 10 AS VARCHAR) || '.' || CAST((ord_cents*20 + 100000000) // 200000000 % 10 AS VARCHAR) || 'M'
          WHEN orders >= 1e3  THEN CAST((ord_cents*20 + 100000) // 200000 // 10 AS VARCHAR) || '.' || CAST((ord_cents*20 + 100000) // 200000 % 10 AS VARCHAR) || 'K'
          ELSE CAST((ord_cents*20 + 100) // 200 // 10 AS VARCHAR) || '.' || CAST((ord_cents*20 + 100) // 200 % 10 AS VARCHAR)
        END AS orders_fmt
      FROM fmt
    """,
  )
}
