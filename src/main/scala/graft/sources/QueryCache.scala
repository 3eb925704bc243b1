package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.security.MessageDigest

/** Result cache keyed by a deterministic query-config hash — graft's
  * re-expression of the reference's cached-query layer
  * (connectors.py:367-452: cache key from the query config dict, S3
  * object per key, lock-protected refresh; dash_app.py:1134-1138).
  *
  * Spark-first shape: the cache entry is a parquet dataset (readable
  * by any engine, partition-parallel), written atomically via
  * temp-dir + rename so concurrent writers can't expose partial
  * results — the moral equivalent of the reference's refresh lock
  * without any coordination service.
  */
object QueryCache {

  /** Deterministic cache key from a canonical config string. Callers
    * serialize their query config (sorted keys!) into `config`. */
  def cacheKey(config: String): String =
    MessageDigest.getInstance("SHA-256")
      .digest(config.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(32)

  /** Read-through cache: returns the cached dataset for `config` if
    * present, else computes `build`, persists it, and reads it back. */
  def cached(spark: SparkSession, cacheDir: String, config: String)
      (build: => DataFrame): DataFrame = {
    val key = cacheKey(config)
    val target = Paths.get(cacheDir, key)
    if (Files.exists(target.resolve("_SUCCESS"))) {
      spark.read.parquet(target.toString)
    } else {
      val tmp = Paths.get(cacheDir, s".tmp-$key-${System.nanoTime()}")
      build.write.mode("overwrite").parquet(tmp.toString)
      Files.createDirectories(target.getParent)
      try {
        Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
      } catch {
        case _: java.nio.file.FileAlreadyExistsException |
             _: java.nio.file.DirectoryNotEmptyException =>
          // another writer won the race with identical content (key is
          // content-addressed); drop our copy
          deleteRecursively(tmp)
      }
      spark.read.parquet(target.toString)
    }
  }

  /** Force refresh: recompute and atomically replace. */
  def refresh(spark: SparkSession, cacheDir: String, config: String)
      (build: => DataFrame): DataFrame = {
    val key = cacheKey(config)
    val target = Paths.get(cacheDir, key)
    val tmp = Paths.get(cacheDir, s".tmp-$key-${System.nanoTime()}")
    build.write.mode("overwrite").parquet(tmp.toString)
    val old = Paths.get(cacheDir, s".old-$key-${System.nanoTime()}")
    if (Files.exists(target)) Files.move(target, old)
    Files.move(tmp, target)
    if (Files.exists(old)) deleteRecursively(old)
    spark.read.parquet(target.toString)
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
    }
  }
}
