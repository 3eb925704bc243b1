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
  *
  * OBJECT-STORE COMMIT (rename-free): S3-style stores have no atomic
  * rename, so every publish ALSO drops a `.current-v-…` MARKER file
  * (one single-object PUT — atomic on S3) beside the version dir, and
  * readers that find no usable CURRENT pointer resolve the live
  * version as "newest marker whose version dir is complete
  * (_SUCCESS)". With `-Dgraft.cache.renameFree=true` the pointer swap
  * is skipped entirely and markers are the ONLY commit record — the
  * protocol then needs no rename anywhere: version data is written
  * directly under its final name (completeness gated by _SUCCESS, the
  * cloud committer's own completion marker), and commit = one marker
  * PUT. Listing-after-put is strongly consistent on current S3;
  * InfraSpec simulates the rename-free path by resolving without any
  * CURRENT file.
  */
object QueryCache {

  /** Default entry lifetime: 30 days (the reference's cache_ttl). */
  val DefaultTtlMillis: Long = 30L * 24 * 3600 * 1000

  /** Grace before deleting a superseded version (in-flight readers). */
  private val GcGraceMillis: Long = 15L * 60 * 1000

  /** How long a .lease marks a build as in-flight before another
    * process may steal it (a cache build is a full Spark job). */
  private val LeaseMillis: Long = 15L * 60 * 1000

  /** How long a lease loser polls for the holder's publish before
    * giving up and building anyway (duplicate work beats deadlock). */
  private val LeaseWaitMillis: Long = 10L * 60 * 1000

  /** Per-entry in-JVM build locks: N concurrent misses on one entry
    * in one application compute ONCE (the reference's lock-protected
    * refresh, connectors.py:367-452) — at scale a popular dashboard
    * key must not launch the same multi-hour job N times. Keyed by
    * the FULL entry path (distinct cacheDirs never contend), one per
    * distinct entry with NO false sharing — a stripe table would let
    * an unrelated key block behind another's multi-hour build. The
    * table grows by one small monitor object per distinct config per
    * JVM lifetime: bounded by the query surface, not the data. */
  private val entryLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def lockFor(entry: Path): Object =
    entryLocks.computeIfAbsent(entry.toAbsolutePath.toString, _ => new Object)

  /** Deterministic cache key from a canonical config string. Callers
    * serialize their query config (sorted keys!) into `config`. */
  def cacheKey(config: String): String =
    MessageDigest.getInstance("SHA-256")
      .digest(config.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(32)

  /** Read-through cache: serves the CURRENT version if present,
    * complete, and younger than `ttlMillis`; otherwise computes
    * `build`, publishes it as a new version, and reads it back.
    *
    * Refresh is SINGLE-FLIGHT: concurrent misses on the same key are
    * serialized behind a per-key in-JVM lock with a re-check, so only
    * the first computes — the rest read its published version. Across
    * JVMs a best-effort `.lease` file extends the same contract:
    * losers poll for the holder's publish, then (lease expiry) build
    * themselves rather than deadlock. */
  def cached(spark: SparkSession, cacheDir: String, config: String,
             ttlMillis: Long = DefaultTtlMillis)
      (build: => DataFrame): DataFrame = {
    val entry = Paths.get(cacheDir, cacheKey(config))
    def live: Option[Path] = currentVersion(entry)
      .filter(v => System.currentTimeMillis() - versionMillis(v) <= ttlMillis)
    live match {
      case Some(v) => spark.read.parquet(v.toString)
      case None =>
        lockFor(entry).synchronized {
          // double-check: the build we queued behind may be our answer
          live match {
            case Some(v) => spark.read.parquet(v.toString)
            case None => publishSingleFlight(spark, entry, ttlMillis, build)
          }
        }
    }
  }

  /** Force refresh: recompute and atomically repoint CURRENT. */
  def refresh(spark: SparkSession, cacheDir: String, config: String)
      (build: => DataFrame): DataFrame =
    publish(spark, Paths.get(cacheDir, cacheKey(config)), build)

  /** Incremental refresh: UPSERT `delta` into the cached dataset by
    * `mergeKey` (new rows win over cached rows with the same key) and
    * publish the merged result as a new version — the reference's
    * scheduled incremental refresh shape, where a periodic job appends
    * the latest day instead of recomputing the whole window. Readers
    * keep the versioned-publish guarantees: they see the old complete
    * dataset or the new complete dataset, never a half-merge. A
    * missing/expired entry degrades to publishing `delta` alone. */
  def mergeRefresh(spark: SparkSession, cacheDir: String, config: String,
      mergeKey: Seq[String], ttlMillis: Long = DefaultTtlMillis)
      (delta: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.col
    val entry = Paths.get(cacheDir, cacheKey(config))
    // the read-modify-write must be exclusive END TO END or a
    // concurrent merge reads the same base version and the losing
    // CURRENT swap silently drops a delta: in-JVM via the entry lock,
    // cross-process via the .lease held across read+build+publish
    // (cached() only leases the publish because its build is
    // idempotent; a merge is not). A waiter that can't get the lease
    // by the deadline proceeds anyway — duplicate-base merge risk
    // beats deadlock behind a dead holder.
    lockFor(entry).synchronized {
      Files.createDirectories(entry)
      val deadline = System.currentTimeMillis() + LeaseWaitMillis
      var leased = tryAcquireLease(entry)
      while (!leased && System.currentTimeMillis() < deadline) {
        Thread.sleep(200)
        leased = tryAcquireLease(entry)
      }
      try {
        val merged = currentVersion(entry)
          .filter(v => System.currentTimeMillis() - versionMillis(v) <= ttlMillis)
          .map { v =>
            val current = spark.read.parquet(v.toString)
            // anti-join keeps cached rows whose key is NOT replaced
            current.join(delta.select(mergeKey.map(col): _*).distinct(),
                mergeKey, "left_anti")
              .unionByName(delta)
          }
          .getOrElse(delta)
        publish(spark, entry, merged)
      } finally {
        if (leased) {
          try Files.deleteIfExists(entry.resolve(".lease"))
          catch { case _: java.io.IOException => }
        }
      }
    }
  }

  /** True when publishes must not rely on rename at all (object-store
    * mode): commit = marker PUT only, resolution = newest marker. */
  private def renameFree: Boolean =
    sys.props.get("graft.cache.renameFree").contains("true")

  /** The live, complete version dir for an entry, if any: the CURRENT
    * pointer when it is usable, else the newest `.current-v-…` marker
    * whose version completed — the rename-free resolution path. */
  private def currentVersion(entry: Path): Option[Path] =
    pointerVersion(entry).orElse(markerVersion(entry))

  private def pointerVersion(entry: Path): Option[Path] = {
    val ptr = entry.resolve("CURRENT")
    if (renameFree || !Files.exists(ptr)) None
    else {
      val name = new String(Files.readAllBytes(ptr), "UTF-8").trim
      val v = entry.resolve(name)
      // a version is only live if its write completed (_SUCCESS); a
      // pointer to a damaged/missing dir reads as a miss, not an error
      if (name.startsWith("v-") && Files.exists(v.resolve("_SUCCESS"))) Some(v)
      else None
    }
  }

  /** Newest complete version by commit marker: markers are named
    * `.current-v-<millis>-<nonce>`, so (millis, nonce) orders commits;
    * markers pointing at incomplete/vanished versions are skipped (a
    * writer that died between data PUT and marker PUT left no marker;
    * one that died before _SUCCESS left an unusable marker — both read
    * as "previous version still live"). */
  private def markerVersion(entry: Path): Option[Path] = {
    if (!Files.isDirectory(entry)) return None
    val listing = Files.list(entry)
    val names =
      try {
        val b = Seq.newBuilder[String]
        listing.forEach(p => b += p.getFileName.toString)
        b.result()
      } finally listing.close()
    names.filter(_.startsWith(".current-v-"))
      .map(_.stripPrefix(".current-"))
      .sortBy(n => (versionMillis(entry.resolve(n)), n))(Ordering.Tuple2(
        Ordering.Long.reverse, Ordering.String.reverse))
      .iterator
      .map(entry.resolve)
      .find(v => Files.exists(v.resolve("_SUCCESS")))
  }

  /** Millis encoded in a v-<millis>-<nonce> name; malformed names
    * (a manual copy, a truncated write) read as infinitely old, so
    * readers treat them as expired and GC reclaims them — never an
    * exception out of a cache internals path. */
  private def versionMillis(v: Path): Long =
    try v.getFileName.toString.split("-")(1).toLong
    catch { case _: RuntimeException => 0L } // epoch: ancient, not overflow-prone

  /** Cross-JVM single-flight: take the `.lease` file (atomic create,
    * stale leases stolen by mtime), build+publish, release. A loser
    * polls for a fresh CURRENT from the lease holder and only falls
    * back to building after the wait budget — the cross-process
    * equivalent of the reference's get_lock-protected refresh. */
  /** One attempt to take the entry's `.lease` file: atomic create, or
    * steal-by-mtime when the holder looks dead. Best-effort: an IO
    * failure other than "already exists" reads as acquired (the lease
    * must never block correctness, only duplicate work). */
  private def tryAcquireLease(entry: Path): Boolean = {
    val lease = entry.resolve(".lease")
    val now = System.currentTimeMillis()
    try { Files.createFile(lease); true }
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        try {
          if (now - Files.getLastModifiedTime(lease).toMillis > LeaseMillis) {
            // holder died mid-build: steal by refreshing the mtime
            Files.setLastModifiedTime(lease,
              java.nio.file.attribute.FileTime.fromMillis(now))
            true
          } else false
        } catch { case _: java.io.IOException => false }
      case _: java.io.IOException => true // lease is best-effort only
    }
  }

  private def publishSingleFlight(spark: SparkSession, entry: Path,
      ttlMillis: Long, build: => DataFrame): DataFrame = {
    Files.createDirectories(entry)
    val lease = entry.resolve(".lease")
    val acquired = tryAcquireLease(entry)
    if (acquired) {
      try publish(spark, entry, build)
      finally {
        try Files.deleteIfExists(lease)
        catch { case _: java.io.IOException => }
      }
    } else {
      // another process is building: poll for its publish
      val deadline = System.currentTimeMillis() + LeaseWaitMillis
      var result: Option[Path] = None
      while (result.isEmpty && System.currentTimeMillis() < deadline &&
             Files.exists(lease)) {
        Thread.sleep(200)
        result = currentVersion(entry)
          .filter(v => System.currentTimeMillis() - versionMillis(v) <= ttlMillis)
      }
      result
        .orElse(currentVersion(entry)
          .filter(v => System.currentTimeMillis() - versionMillis(v) <= ttlMillis))
        .map(v => spark.read.parquet(v.toString))
        .getOrElse(publish(spark, entry, build)) // holder never published
    }
  }

  /** Write a new complete version, commit it, GC old. Commit order:
    * (1) version data written DIRECTLY under its final name — no tmp
    * rename; liveness is gated by _SUCCESS (written last by the
    * committer), so a partial write is never resolvable; (2) the
    * `.current-<vName>` marker — one small-object PUT, the rename-free
    * commit record; (3) unless renameFree, the CURRENT pointer swap
    * (atomic same-directory rename, the POSIX fast path — readers
    * prefer it, markers are their fallback). A crash between any two
    * steps leaves the previous version live and this one GC-able. */
  private def publish(spark: SparkSession, entry: Path, build: => DataFrame): DataFrame = {
    Files.createDirectories(entry)
    val vName = s"v-${System.currentTimeMillis()}-${(System.nanoTime() % 0xFFFFFF).toHexString}"
    build.write.mode("overwrite").parquet(entry.resolve(vName).toString)
    Files.write(entry.resolve(s".current-$vName"), vName.getBytes("UTF-8"))
    if (!renameFree) {
      val ptrTmp = entry.resolve(s".CURRENT-$vName")
      Files.write(ptrTmp, vName.getBytes("UTF-8"))
      Files.move(ptrTmp, entry.resolve("CURRENT"),
        StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    }
    gc(entry, vName)
    spark.read.parquet(entry.resolve(vName).toString)
  }

  /** Delete superseded versions and orphaned tmp dirs past the grace
    * period. Best-effort: GC failure never fails the query (but only
    * IO failures are absorbed — anything else is a real bug and
    * propagates). */
  private def gc(entry: Path, keep: String): Unit =
    try {
      val now = System.currentTimeMillis()
      val listing = Files.list(entry)
      try {
        listing.forEach { p =>
          val name = p.getFileName.toString
          val stale =
            (name.startsWith("v-") && name != keep &&
              now - versionMillis(p) > GcGraceMillis) ||
            // commit markers die with their version (keep's stays)
            (name.startsWith(".current-v-") && name != s".current-$keep" &&
              now - versionMillis(entry.resolve(
                name.stripPrefix(".current-"))) > GcGraceMillis) ||
            ((name.startsWith(".tmp-") || name.startsWith(".CURRENT-")) &&
              now - Files.getLastModifiedTime(p).toMillis > GcGraceMillis)
          if (stale) deleteRecursively(p)
        }
      } finally listing.close()
    } catch { case _: java.io.IOException | _: java.io.UncheckedIOException => }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
    }
  }
}
