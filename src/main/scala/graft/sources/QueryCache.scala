package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.security.MessageDigest

/** Result cache keyed by a deterministic query-config hash — graft's
  * re-expression of the reference's cached-query layer
  * (connectors.py:367-452: cache key from the query config dict, S3
  * object per key, a cache_ttl age check (connectors.py:370-380), and
  * lock-protected refresh; dash_app.py:1134-1138).
  *
  * Spark-first shape: a cache entry is a directory of VERSIONED
  * parquet datasets plus a CURRENT pointer file:
  *
  *   cacheDir/<key>/v-<millis>-<nonce>/   parquet + _SUCCESS
  *   cacheDir/<key>/CURRENT              name of the live version
  *
  * Writers publish a complete new version directory and then swap the
  * CURRENT pointer with an atomic rename — readers always see either
  * the old complete version or the new complete version, never an
  * absent or partial dataset, and concurrent writers can't collide
  * (each writes its own version; last pointer-swap wins). Staleness =
  * version age vs. `ttlMillis` (the reference's cache_ttl, default
  * 30 days); expired entries are recomputed on read. Superseded
  * versions are garbage-collected after a grace period so in-flight
  * readers of the old version finish unharmed.
  */
object QueryCache {

  /** Default entry lifetime: 30 days (the reference's cache_ttl). */
  val DefaultTtlMillis: Long = 30L * 24 * 3600 * 1000

  /** Grace before deleting a superseded version (in-flight readers). */
  private val GcGraceMillis: Long = 15L * 60 * 1000

  /** Deterministic cache key from a canonical config string. Callers
    * serialize their query config (sorted keys!) into `config`. */
  def cacheKey(config: String): String =
    MessageDigest.getInstance("SHA-256")
      .digest(config.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(32)

  /** Read-through cache: serves the CURRENT version if present,
    * complete, and younger than `ttlMillis`; otherwise computes
    * `build`, publishes it as a new version, and reads it back. */
  def cached(spark: SparkSession, cacheDir: String, config: String,
             ttlMillis: Long = DefaultTtlMillis)
      (build: => DataFrame): DataFrame = {
    val entry = Paths.get(cacheDir, cacheKey(config))
    currentVersion(entry) match {
      case Some(v) if System.currentTimeMillis() - versionMillis(v) <= ttlMillis =>
        spark.read.parquet(v.toString)
      case _ =>
        publish(spark, entry, build)
    }
  }

  /** Force refresh: recompute and atomically repoint CURRENT. */
  def refresh(spark: SparkSession, cacheDir: String, config: String)
      (build: => DataFrame): DataFrame =
    publish(spark, Paths.get(cacheDir, cacheKey(config)), build)

  /** The live, complete version dir for an entry, if any. */
  private def currentVersion(entry: Path): Option[Path] = {
    val ptr = entry.resolve("CURRENT")
    if (!Files.exists(ptr)) None
    else {
      val name = new String(Files.readAllBytes(ptr), "UTF-8").trim
      val v = entry.resolve(name)
      // a version is only live if its write completed (_SUCCESS); a
      // pointer to a damaged/missing dir reads as a miss, not an error
      if (name.startsWith("v-") && Files.exists(v.resolve("_SUCCESS"))) Some(v)
      else None
    }
  }

  private def versionMillis(v: Path): Long =
    v.getFileName.toString.split("-")(1).toLong

  /** Write a new complete version, swap CURRENT atomically, GC old. */
  private def publish(spark: SparkSession, entry: Path, build: => DataFrame): DataFrame = {
    Files.createDirectories(entry)
    val vName = s"v-${System.currentTimeMillis()}-${(System.nanoTime() % 0xFFFFFF).toHexString}"
    val tmp = entry.resolve(s".tmp-$vName")
    build.write.mode("overwrite").parquet(tmp.toString)
    // same-directory renames: atomic on POSIX
    Files.move(tmp, entry.resolve(vName), StandardCopyOption.ATOMIC_MOVE)
    val ptrTmp = entry.resolve(s".CURRENT-$vName")
    Files.write(ptrTmp, vName.getBytes("UTF-8"))
    Files.move(ptrTmp, entry.resolve("CURRENT"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    gc(entry, vName)
    spark.read.parquet(entry.resolve(vName).toString)
  }

  /** Delete superseded versions and orphaned tmp dirs past the grace
    * period. Best-effort: GC failure never fails the query. */
  private def gc(entry: Path, keep: String): Unit =
    try {
      val now = System.currentTimeMillis()
      Files.list(entry).forEach { p =>
        val name = p.getFileName.toString
        val stale =
          (name.startsWith("v-") && name != keep &&
            now - versionMillis(p) > GcGraceMillis) ||
          ((name.startsWith(".tmp-") || name.startsWith(".CURRENT-")) &&
            now - Files.getLastModifiedTime(p).toMillis > GcGraceMillis)
        if (stale) deleteRecursively(p)
      }
    } catch { case _: Throwable => }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
    }
  }
}
