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

  /** Transient-failure retry with exponential backoff — the
    * reference's connectors wrap query execution in a poll-with-
    * backoff loop (connectors.py:182-452) because warehouse frontends
    * throw retryable errors (throttling, queue-full, transient
    * network) that a client is expected to absorb. Spark's own task
    * retry covers EXECUTOR-side stripe reads; this wrapper covers the
    * DRIVER-side phase (connection + schema resolution + query
    * submission) that task retry never sees.
    *
    * Semantics: `attempts` total tries; sleeps `baseDelayMs * 2^(i-1)`
    * between them (exponential, capped at maxDelayMs); rethrows the
    * last failure once exhausted. `retryOn` classifies retryable
    * errors — default: SQL(Transient|RecoverableException), timeouts,
    * and plain network IO. Side-effect-free reads only: do NOT wrap
    * writes that may have partially committed. */
  def withRetry[T](attempts: Int = 4, baseDelayMs: Long = 200,
      maxDelayMs: Long = 10000,
      retryOn: Throwable => Boolean = defaultRetryable,
      sleep: Long => Unit = Thread.sleep)(body: => T): T = {
    require(attempts >= 1, "attempts must be >= 1")
    var i = 0
    var delay = baseDelayMs
    while (true) {
      i += 1
      try return body
      catch {
        case e: Throwable if i < attempts && retryOn(e) =>
          sleep(delay)
          delay = math.min(delay * 2, maxDelayMs)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Retryable = transient by JDBC's own taxonomy, or a network-ish
    * IO failure anywhere in the cause chain. Permanent errors (syntax,
    * auth, missing table → SQLNonTransientException etc.) fail fast. */
  def defaultRetryable(t: Throwable): Boolean = {
    val chain = Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8).toSeq
    chain.exists {
      case _: java.sql.SQLTransientException   => true
      case _: java.sql.SQLRecoverableException => true
      case _: java.sql.SQLTimeoutException     => true
      case _: java.net.SocketTimeoutException  => true
      case _: java.net.ConnectException        => true
      case _: java.io.IOException              => true
      case _ => false
    }
  }

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
