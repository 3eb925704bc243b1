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
  )
}
