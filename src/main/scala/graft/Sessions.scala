package graft

import org.apache.spark.sql.SparkSession

/** Shared SparkSession construction for every graft entrypoint (Bench,
  * Verify, the audit mains, the test fixture), so session hygiene is
  * decided once:
  *
  *  - Derby (the embedded metastore db some specs exercise through
  *    JDBC) writes `derby.log` into `user.dir`, and Spark creates
  *    `spark-warehouse/` there, unless redirected — both are repo-root
  *    litter. Point both at target/ (already gitignored, wiped by
  *    clean).
  *
  *  - The three deliberate partition-less windows in the library (the
  *    date spine, the chi² ranking over the vocab-sized frame, the
  *    dim²-triangle corr ranking) are metadata-bounded by construction,
  *    but Spark logs a blanket "No Partition Defined for Window
  *    operation" warning PER EXECUTION — hundreds of identical lines
  *    per bench run, burying real warnings. Scope that logger (the
  *    whole physical window-exec package — the warning's logger name is
  *    the concrete exec class, which varies) to ERROR instead of
  *    muting anything globally.
  */
object Sessions {

  /** The core count behind a `local[...]` argument: `*` resolves to
    * the machine's processors (what Spark itself does with it); any
    * other non-numeric value is rejected loudly — a silent fixed
    * fallback would mis-size initialPartitionNum AND hide typos. */
  def resolveCpus(cpus: String): Int =
    if (cpus == "*") Runtime.getRuntime.availableProcessors()
    else scala.util.Try(cpus.toInt).getOrElse(
      throw new IllegalArgumentException(
        s"SPARK_GRAFT_CPUS must be an integer or '*', got '$cpus'"))

  /** Builder with the shared hygiene + determinism settings applied.
    * Callers add master/parallelism and any entrypoint-specific conf.
    *
    * `periodicGc` is the ContextCleaner's timer-GC interval (see the
    * inline note at the conf below). The 2-minute default is the
    * debris bound for GENERIC long-lived sessions; the measurement
    * mains (Bench, Verify) pass a long interval and instead reap
    * deterministically at their own query boundaries — a timer-driven
    * `System.gc()` is a 1-2 s stop-the-world Full pause that lands at
    * a random point of whatever query is running (r10 measured 1.3 to
    * 1.8 s pauses inside timed reps AND inside the load-sentinel's
    * calibration windows, reading as a fake machine stall), while a
    * boundary GC bounds debris at ONE query's worth and pauses only
    * untimed time. */
  def builder(cpus: String, periodicGc: String = "2min"): SparkSession.Builder = {
    val target = new java.io.File("target")
    target.mkdirs()
    System.setProperty("derby.system.home",
      new java.io.File(target, "derby").getAbsolutePath)
    new java.io.File(target, "derby").mkdirs()
    SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // Let AQE pick the per-stage shuffle width instead of pinning
      // every exchange to `cpus` partitions: start each shuffle at
      // 8×cpus and let coalescePartitions shrink toward the 64 MB
      // advisory target. At sf0.1 this coalesces right back to ~cpus
      // (no small-partition overhead); at sf100 the 500M-row postings
      // and pair shuffles keep enough partitions to stay under the
      // per-task memory that was forcing sort-spills at a fixed 32.
      // Results are partitioning-free by library-wide design (integer
      // determinism, data-derived shard keys), which the oracle gates
      // verify at every scale factor.
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        (resolveCpus(cpus) * 8).toString)
      // Shuffle files of FINISHED queries are only deleted when the
      // driver GCs their RDD references (ContextCleaner); with a large
      // heap a long multi-query session can go 30+ min (the default
      // periodicGC interval) without one, accumulating tens of GB of
      // dead shuffle files — the sf100 bench hit ENOSPC exactly this
      // way while its LIVE working set fit comfortably. A 2-minute
      // periodic GC bounds the debris at a few queries' worth (for the
      // measurement mains the bound is per-query instead — see the
      // `periodicGc` param doc above).
      .config("spark.cleaner.periodicGC.interval", periodicGc)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        new java.io.File(target, "spark-warehouse").getAbsolutePath)
      .config("spark.ui.enabled", "false")
  }

  /** Narrow the benign-by-construction window warning out of the logs
    * (see class doc). Call AFTER setLogLevel, which resets levels. */
  def quietBoundedWindowWarnings(): Unit =
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window",
      org.apache.logging.log4j.Level.ERROR)

  /** Per-session memo store, WEAKLY keyed by the session OBJECT.
    * Session lifetime is the library's cache-invalidation granularity
    * (q17/q18 gate probe, q86/q89 merge log, the q45/q88 centroid
    * model): a fresh session re-probes/re-trains, so on-disk data
    * changes are picked up then. Until r13 these memos keyed on the
    * session's identity HASH in a global map — entries outlived
    * session.stop() for the life of the JVM (a long-lived JVM cycling
    * sessions over large corpora accumulates dead centroid models),
    * and a collected session's identity hash can in principle be
    * reused by a successor, aliasing a stale entry (VERDICT r12
    * What's-wrong #3). Weak keys fix both: a dropped session's whole
    * memo map becomes collectable with it, and the key IS the live
    * object, so aliasing is impossible. */
  private val perSessionMemos =
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[Any, AnyRef]]()

  /** One session's memo map (created on first use). WeakHashMap is not
    * thread-safe, so map lookup synchronizes; entry computation runs
    * in the per-session ConcurrentHashMap's computeIfAbsent (two
    * sessions never serialize each other's training). Package-visible
    * for the memo specs; operators go through sessionMemo. */
  private[graft] def memoMap(spark: SparkSession)
      : java.util.concurrent.ConcurrentHashMap[Any, AnyRef] =
    perSessionMemos.synchronized {
      var m = perSessionMemos.get(spark)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[Any, AnyRef]()
        perSessionMemos.put(spark, m)
      }
      m
    }

  /** Session-scoped memoization. `key` must carry an operator
    * discriminator (e.g. ("centroids", dir, k, iters)) — all of a
    * session's memos share one map. */
  def sessionMemo[T <: AnyRef](spark: SparkSession, key: Any)(
      compute: => T): T =
    memoMap(spark).computeIfAbsent(key, _ => compute).asInstanceOf[T]

  /** Sessions currently holding memo entries — the spec hook for the
    * collectability contract (a stopped, dropped session's entries
    * must not pin memory). */
  private[graft] def liveMemoSessionCount: Int =
    perSessionMemos.synchronized { perSessionMemos.size }

  /** The standard entrypoint session: hygiene + WARN log level with
    * the window-package warning scoped out. */
  def local(cpus: String, periodicGc: String = "2min"): SparkSession = {
    val s = builder(cpus, periodicGc).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    quietBoundedWindowWarnings()
    s
  }
}
