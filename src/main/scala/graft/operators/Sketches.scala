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

  /** Hash row i for one key: bucket by mix32(key + i·1000003) mod w.
    * Seed-by-addition keeps every row's input in the masked 32-bit
    * domain, and the mix rounds decorrelate the rows (a
    * multiplicative-only hash would bucket row i as a fixed
    * permutation of row 0). */
  private def bucketCol(key: Column, i: Int): Column =
    Exprs.mix32(key + lit(i.toLong * 1000003L)) % Width

  /** The d buckets, PROJECTED FLAT before the explode. The original
    * form exploded array(struct(i, bucket_i)...) directly: mix32's
    * expression tree textually duplicates its mulMod32 subtree at
    * every round, and inside a Generate those giant generator
    * expressions evaluate WITHOUT whole-stage codegen's subexpression
    * reuse — measured 10.4 s for a 600 k-row sketch build where this
    * form (each bucket evaluated ONCE in a codegen'd Project under
    * the Generate, which then explodes four plain column refs) takes
    * 0.7 s. CollapseProject does not inline a Project under a
    * Generate, so the let-binding holds — the same trap class as the
    * round-1 HOF-loop inlining, one level down. */
  private def flatBuckets(df: DataFrame, key: Column,
      carry: Seq[String]): DataFrame =
    df.select(
      carry.map(col) ++ (0 until Depth).map(i => bucketCol(key, i).as(s"_cm_b$i")): _*)
      .select(
        carry.map(col) :+ posexplode(
          array((0 until Depth).map(i => col(s"_cm_b$i")): _*))
          .as(Seq("r", "bucket")): _*)

  /** The sketch itself: d×w counter cells from one pass over the
    * keys. One explode(×d) + one map-side-combinable groupBy — each
    * partition pre-reduces to at most d·w cells before the exchange,
    * so the shuffle carries the SKETCH, not the data, at any scale.
    * That mergeability is the point of the structure: per-partition
    * sketches combine by cell-wise addition, exactly what partial
    * aggregation does. */
  def countMinSketch(keys: DataFrame, key: Column): DataFrame =
    flatBuckets(keys, key, Seq.empty)
      .groupBy(col("r"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Point-estimate frequencies of `probes` (column `key`) against a
    * sketch: min over the d cells the key hashes to. Empty cells
    * count 0 (the left join's null). */
  def countMinEstimate(sketch: DataFrame, probes: DataFrame): DataFrame =
    flatBuckets(probes, col("key"), Seq("key"))
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
