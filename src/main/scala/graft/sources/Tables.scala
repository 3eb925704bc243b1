package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the graft engine.
  *
  * Every operator reads through here so that scan-level concerns
  * (format, schema discovery, future bucketing/partition layout) have a
  * single home. At 100 TB these would be catalog tables partitioned by
  * date; the API is kept to (session, dir) → DataFrame so swapping the
  * physical layout does not touch operator code.
  *
  * Reference equivalent: connectors.py:50-146 (Athena/BigQuery/S3
  * readers returning pandas frames) — re-expressed as lazy Spark scans
  * so filters and column pruning push down into the parquet reader
  * instead of materializing whole tables like the reference does.
  */
object Tables {
  private def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = read(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = read(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = read(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = read(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = read(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = read(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = read(spark, dir, "lineitem")
  /** `events.ts` lands with whatever physical timestamp layout the
    * producer chose, and the test generator has shipped BOTH: INT64
    * TIMESTAMP(NANOS) (which Spark's vectorized reader rejects — read
    * nanos as long and truncate to microseconds) and plain
    * TIMESTAMP(MICROS) without UTC adjustment (surfacing as
    * TIMESTAMP_NTZ). Normalize every layout to the session-zone
    * TimestampType so operator code sees one shape; the session zone is
    * pinned UTC by every entrypoint, so the NTZ cast is value-preserving.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // the NTZ→TimestampType cast below is value-preserving ONLY in a
    // UTC session; pin it here (not just by entrypoint convention) so a
    // future caller that forgets the pin can't silently shift every
    // event by the local zone offset
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    val df = read(spark, dir, "events")
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => df
      // fail fast at the scan boundary: an unexpected physical layout
      // (INT96, string, date…) would otherwise surface as an opaque
      // error deep inside whichever operator touches ts first
      case dt => throw new IllegalStateException(
        s"unexpected events.ts type: $dt (expected long-nanos, TIMESTAMP_NTZ, or TIMESTAMP)")
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings")

  /** Repartition `df` by `keys` ONLY when its scan is under-parallel
    * (fewer planned partitions than cores). The test tables are
    * single-split parquet files whose 1-partition scans would serialize
    * every downstream codegen pass — but on a production many-file
    * table the scan is already parallel, and an unconditional
    * `repartition` there is a full exchange of the input (for a
    * full-text corpus, the most expensive possible shuffle) placed
    * before map-side work that needs no co-partitioning at all. The
    * gate reads the PLANNED partition count (no job runs) and is a
    * no-op at scale. */
  def parallelized(df: DataFrame, keys: org.apache.spark.sql.Column*): DataFrame = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= math.min(cores, 16)) df
    else df.repartition(keys: _*)
  }

  /** Date-partitioned parquet sink — the layout a 100 TB fact table
    * needs: writes land under <path>/<partitionCol>=<value>/ so reads
    * with a date predicate prune whole directories (verified by the
    * PartitionFilters entry in the scan plan). */
  def writePartitionedByDay(df: DataFrame, tsCol: String, path: String): Unit = {
    import org.apache.spark.sql.functions.{col, to_date}
    df.withColumn("p_day", to_date(col(tsCol)))
      .write.mode("overwrite")
      .partitionBy("p_day")
      .parquet(path)
  }

  /** Bucketed catalog table sink — the co-located-join layout: rows are
    * pre-shuffled into `buckets` files by the join key and each bucket
    * sorted, so a join between two tables bucketed the same way runs
    * with ZERO exchange (the shuffle was paid once at write time, not
    * per query). This is the difference between re-shuffling a 100 TB
    * fact table on every fact-fact join and never shuffling it again —
    * the InfraSpec asserts the exchange-free plan. Bucketing requires
    * the catalog (saveAsTable); read back with spark.table(name). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)

  /** Small-file compaction — the table-maintenance pass every
    * long-lived 100 TB dataset needs: streaming/incremental writers
    * leave thousands of KB-sized files whose per-file open/footer
    * cost eventually dominates scans. Sizes the output by the INPUT'S
    * actual bytes (filesystem metadata, no data pass), rewrites in
    * one shuffle-round-robin repartition, and returns the file count.
    * Round-robin (not coalesce) so output files are even regardless
    * of input file skew; layout-sensitive tables should recompact
    * through writeZOrdered/writeBucketed instead.
    *
    * Object-store note: the `mode("overwrite")` commit here delegates
    * atomicity to the configured committer — on HDFS/POSIX the default
    * rename-based FileOutputCommitter is fine; on S3-style stores run
    * with a cloud-native committer (no rename, task files PUT directly
    * + completion marker) and swap the compacted dir in at the CATALOG
    * layer (the compact-into-sibling + catalog-swap contract above is
    * exactly so the data move itself never needs an atomic rename). */
  def compact(spark: SparkSession, inPath: String, outPath: String,
      targetFileBytes: Long = 128L * 1024 * 1024): Int = {
    val p = new org.apache.hadoop.fs.Path(inPath)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = new org.apache.hadoop.fs.Path(outPath)
    // in-place would overwrite (delete) the input mid-read and lose
    // the table; compact into a sibling dir and swap at the catalog
    require(fs.makeQualified(p) != fs.makeQualified(out),
      s"compact cannot run in-place: $inPath == $outPath")
    // recursive walk, skipping _SUCCESS/.crc metadata so the size
    // estimate counts only data bytes
    var bytes = 0L
    val it = fs.listFiles(p, true)
    while (it.hasNext) {
      val s = it.next()
      val n = s.getPath.getName
      if (!n.startsWith("_") && !n.startsWith(".")) bytes += s.getLen
    }
    val files = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    spark.read.parquet(inPath)
      .repartition(files)
      .write.mode("overwrite").parquet(outPath)
    files
  }

  /** ORC sink/source — the second columnar format of the lake
    * (ORC-resident warehouses are common JDBC-migration sources).
    * Spark's native ORC reader supports the same predicate pushdown
    * and column pruning as parquet (InfraSpec asserts PushedFilters
    * on the ORC scan), so operators are format-agnostic: swap the
    * loader, keep the plan. */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Z-ordered layout sink: range-partition + sort the rows by the
    * Morton interleave of two integer columns (Exprs.zValue2), so
    * EVERY file covers a small rectangle of the (x, y) space and
    * parquet min/max stats prune scans filtered on EITHER column —
    * the multi-dimensional clustering a single-column sort can't give
    * (its second column spans the full range in every file). `bits`
    * bounds the grid resolution; columns must be non-negative (mask/
    * offset upstream). The z column itself is dropped from the files:
    * the layout IS the artifact. */
  def writeZOrdered(df: DataFrame, path: String, xCol: String, yCol: String,
      bits: Int, files: Int): Unit = {
    import org.apache.spark.sql.functions.col
    df.withColumn("_z", graft.operators.Exprs.zValue2(col(xCol), col(yCol), bits))
      .repartitionByRange(files, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }
}
