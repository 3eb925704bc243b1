package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType
import java.net.HttpURLConnection
import scala.io.Source

/** REST API → DataFrame source — graft's re-expression of the
  * reference's ApiData connector (connectors.py:152-179) and the
  * paginated pull loop in SearchData (connectors.py:502-534: request,
  * append page, advance, stop on empty).
  *
  * Two shapes, by pagination contract:
  *
  *  - `readPaged`: cursor/link pagination is inherently sequential, so
  *    the DRIVER walks pages (exactly the reference's while-loop) —
  *    but rows are parsed on EXECUTORS from the raw page bodies with
  *    an explicit schema (no inference pass, no driver-side JSON
  *    decode of the payload).
  *  - `readPagedParallel`: offset/page-number pagination has no
  *    sequential dependency, so page FETCHES are distributed to
  *    executors in waves — ingest bandwidth scales with the cluster
  *    instead of one driver connection, which is what matters when an
  *    API backfill is the entry point of a pipeline. A wave containing
  *    an empty page ends the scan.
  *
  * Both land `DataFrame`s via spark.read.json over the body dataset,
  * schema explicit and mandatory.
  */
object Rest {

  /** A 4xx response: the request itself is wrong (bad URL, auth,
    * gone) — retrying cannot help, so `get` fails fast instead of
    * burning its retry budget. NOT an IOException on purpose. */
  final class HttpClientError(msg: String) extends RuntimeException(msg)

  /** GET a URL → body string with bounded retries on TRANSIENT
    * failures only (connect/read errors and 5xx); 4xx fails fast via
    * HttpClientError. Executor-safe: no session references. Backoff
    * is linear and short — an API backfill wants quick retry on blips
    * and a fast loud failure on real outages. */
  def get(url: String, timeoutMs: Int = 10000, attempts: Int = 3,
          backoffMs: Long = 200): String = {
    var attempt = 0
    var lastErr: Throwable = null
    while (attempt < attempts) {
      try return getOnce(url, timeoutMs)
      catch {
        case e: java.io.IOException =>
          lastErr = e
          attempt += 1
          if (attempt < attempts) Thread.sleep(backoffMs * attempt)
      }
    }
    throw lastErr
  }

  private def getOnce(url: String, timeoutMs: Int): String = {
    val conn = java.net.URI.create(url).toURL
      .openConnection().asInstanceOf[HttpURLConnection]
    conn.setConnectTimeout(timeoutMs)
    conn.setReadTimeout(timeoutMs)
    conn.setRequestProperty("Accept", "application/json")
    try {
      val code = conn.getResponseCode
      if (code >= 400 && code < 500)
        throw new HttpClientError(s"HTTP $code from $url (not retryable)")
      if (code >= 500)
        throw new java.io.IOException(s"HTTP $code from $url")
      val is = conn.getInputStream
      try Source.fromInputStream(is, "UTF-8").mkString
      finally is.close()
    } finally conn.disconnect()
  }

  /** Sequential (cursor) pagination: fetch `firstUrl`, then follow
    * `nextUrl(currentUrl, body)` until it returns None (or maxPages —
    * a runaway-API backstop). Bodies accumulate on the driver (one
    * page at a time, the reference's own memory profile); parsing into
    * rows happens on executors against the explicit schema. */
  def readPaged(spark: SparkSession, firstUrl: String, schema: StructType,
      nextUrl: (String, String) => Option[String],
      maxPages: Int = 10000): DataFrame = {
    import spark.implicits._
    val bodies = scala.collection.mutable.ArrayBuffer[String]()
    var current = Option(firstUrl)
    while (current.isDefined && bodies.length < maxPages) {
      val body = get(current.get)
      bodies += body
      current = nextUrl(current.get, body)
    }
    spark.read.schema(schema).json(spark.createDataset(bodies.toSeq))
  }

  /** Parallel (offset) pagination: executors fetch `wave` pages at a
    * time via `urlForPage`; the driver only advances wave boundaries.
    * Every non-empty page in a wave is KEPT (an empty page mid-wave
    * can't silently truncate later pages), and the scan stops only
    * when an entire wave comes back empty — one wave of empty
    * requests past the end buys immunity to APIs that interleave
    * empty pages. Page bodies transit the driver between waves —
    * bounded by wave * page size; at cluster scale raise `wave` to
    * the executor count. */
  def readPagedParallel(spark: SparkSession, urlForPage: Int => String,
      schema: StructType, wave: Int = 8, maxPages: Int = 10000,
      isEmptyPage: String => Boolean = b => {
        val t = b.trim; t.isEmpty || t == "[]" || t == "{}"
      }): DataFrame = {
    import spark.implicits._
    val all = scala.collection.mutable.ArrayBuffer[String]()
    var page = 0
    var done = false
    while (!done && page < maxPages) {
      val n = math.min(wave, maxPages - page)
      val urls = (page until page + n).map(urlForPage)
      val bodies = spark.sparkContext
        .parallelize(urls, n)
        .map(u => get(u))
        .collect()
      val nonEmpty = bodies.filterNot(isEmptyPage)
      all ++= nonEmpty
      done = nonEmpty.isEmpty
      page += n
    }
    spark.read.schema(schema).json(spark.createDataset(all.toSeq))
  }
}
