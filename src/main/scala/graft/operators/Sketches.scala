package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Count-Min sketch: fixed-size frequency estimation over an
  * unbounded key domain — the point-query complement of the KMV
  * distinct sketch (q51) and the Misra-Gries heavy-hitter summary
  * (q48). Estimates never undercount; overestimate is bounded by
  * (2/w)·N per hash row with probability 1/2^d.
  *
  * Like q51 (and unlike HLL's engine-internal registers), the whole
  * sketch is DETERMINISTIC over the engine-neutral mix32 hash, so an
  * approximate algorithm gets an EXACT oracle: DuckDB rebuilds the
  * identical d×w counter matrix and replays every estimate, false
  * collisions included.
  */
object Sketches {

  val Depth = 4
  val Width = 512

  /** The d hash rows for one key: row i buckets by
    * mix32(key + i·1000003) mod w. Seed-by-addition keeps every row's
    * input in the masked 32-bit domain, and the mix rounds decorrelate
    * the rows (a multiplicative-only hash would bucket row i as a
    * fixed permutation of row 0). */
  private def rowBuckets(key: Column): Column = array(
    (0 until Depth).map(i => struct(
      lit(i).as("r"),
      (Exprs.mix32(key + lit(i.toLong * 1000003L)) % Width).as("bucket"))): _*)

  /** The sketch itself: d×w counter cells from one pass over the
    * keys. One explode(×d) + one map-side-combinable groupBy — each
    * partition pre-reduces to at most d·w cells before the exchange,
    * so the shuffle carries the SKETCH, not the data, at any scale.
    * That mergeability is the point of the structure: per-partition
    * sketches combine by cell-wise addition, exactly what partial
    * aggregation does. */
  def countMinSketch(keys: DataFrame, key: Column): DataFrame =
    keys.select(explode(rowBuckets(key)).as("rb"))
      .select(col("rb.r").as("r"), col("rb.bucket").as("bucket"))
      .groupBy(col("r"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Point-estimate frequencies of `probes` (column `key`) against a
    * sketch: min over the d cells the key hashes to. Empty cells
    * count 0 (the left join's null). */
  def countMinEstimate(sketch: DataFrame, probes: DataFrame): DataFrame =
    probes.select(col("key"), explode(rowBuckets(col("key"))).as("rb"))
      .select(col("key"), col("rb.r").as("r"), col("rb.bucket").as("bucket"))
      .join(sketch, Seq("r", "bucket"), "left")
      .groupBy(col("key"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cm_estimate"))

  /** q64: sketch the lineitem part-key frequencies, then read back the
    * first 25 part keys and report estimate vs exact with the
    * guaranteed-nonnegative overestimate. The exact counts exist only
    * because the probe set is tiny; the sketch side never needs them.
    * Sketch and probe frames are both broadcast-sized in the final
    * joins — the only full scan is the sketch build. */
  def q64Countmin(spark: SparkSession, dir: String): DataFrame = {
    val sketch = countMinSketch(
      Tables.lineitem(spark, dir), col("l_partkey"))
    val keys = Tables.part(spark, dir)
      .filter(col("p_partkey") < 25)
      .select(col("p_partkey").as("key"))
    val est = countMinEstimate(sketch, keys)
    val exact = Tables.lineitem(spark, dir)
      .filter(col("l_partkey") < 25)
      .groupBy(col("l_partkey").as("key"))
      .agg(count(lit(1)).as("exact_cnt"))
    keys.join(exact, Seq("key"), "left")
      .join(est, Seq("key"))
      .select(
        col("key").as("p_partkey"),
        coalesce(col("exact_cnt"), lit(0L)).as("exact_cnt"),
        col("cm_estimate"),
        (col("cm_estimate") - coalesce(col("exact_cnt"), lit(0L)))
          .as("overestimate"))
  }
}
