package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.util.Properties

/** JDBC → DataFrame source — graft's re-expression of the reference's
  * SQL-engine connectors (connectors.py: Athena 182-452, BigQuery
  * 50-62, Redshift 64-84): point at an external SQL engine, get a
  * DataFrame back.
  *
  * Spark-first: `spark.read.jdbc` already speaks the protocol; what
  * this wrapper pins down is the SCALE shape —
  *
  *  - partitioned parallel reads: partitionColumn/bounds/numPartitions
  *    turn one driver-side cursor into one executor-side connection
  *    per stripe (`WHERE part_col BETWEEN lo AND hi` issued remotely),
  *    which is the difference between "the driver streams 10 TB" and
  *    "the cluster reads 10 TB";
  *  - predicate/projection pushdown: filters and column selection on
  *    the returned DataFrame reach the remote engine's WHERE/SELECT
  *    (visible as PushedFilters in the scan plan), so the network
  *    carries the answer, not the table;
  *  - pushed queries: `readQuery` sends whole SQL to the engine (the
  *    reference's Athena/BigQuery usage is query-shaped, not
  *    table-shaped), landing only the result set.
  */
object Jdbc {

  private def props(user: Option[String], password: Option[String]): Properties = {
    val p = new Properties()
    user.foreach(p.setProperty("user", _))
    password.foreach(p.setProperty("password", _))
    p
  }

  /** Whole-table read over a single connection — only for dimension-
    * sized tables; use readPartitioned for anything fact-sized. */
  def read(spark: SparkSession, url: String, table: String,
           user: Option[String] = None, password: Option[String] = None): DataFrame =
    spark.read.jdbc(url, table, props(user, password))

  /** Striped parallel read: numPartitions concurrent range scans on
    * [lower, upper] of a numeric/date partition column. Stripes should
    * align with the remote engine's clustering/sort key so each range
    * scan is itself cheap remotely. */
  def readPartitioned(spark: SparkSession, url: String, table: String,
      partitionColumn: String, lowerBound: Long, upperBound: Long,
      numPartitions: Int,
      user: Option[String] = None, password: Option[String] = None): DataFrame =
    spark.read.jdbc(url, table, partitionColumn, lowerBound, upperBound,
      numPartitions, props(user, password))

  /** Push a whole query to the remote engine; only its result set
    * crosses the wire (the reference's query-shaped Athena/BigQuery
    * reads, connectors.py:182-452). */
  def readQuery(spark: SparkSession, url: String, sql: String,
                user: Option[String] = None, password: Option[String] = None): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("query", sql)
      .options(user.map("user" -> _).toMap ++ password.map("password" -> _).toMap)
      .load()

  /** Partitioned write (sink side of the reference's put paths). */
  def write(df: DataFrame, url: String, table: String,
            user: Option[String] = None, password: Option[String] = None): Unit =
    df.write.mode("append").jdbc(url, table, props(user, password))
}
