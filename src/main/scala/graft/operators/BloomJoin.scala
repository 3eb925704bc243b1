package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import Exprs._

/** Deterministic Bloom-filter semi-join reduction.
  *
  * The scale problem: a shuffle join between a 100 TB fact table and a
  * selective key set ships EVERY fact row to the shuffle, even though
  * only a few percent survive the join. A Bloom filter built from the
  * small side and evaluated at the SCAN (no false negatives, bounded
  * false-positive rate) drops the dead rows before they are shuffled —
  * the semi-join reduction of the classic distributed-join literature.
  * Spark's own runtime row-level filtering does this opportunistically
  * with engine-internal hashes; this variant is engine-neutral (mix32,
  * the library's cross-engine hash) so the whole structure — bit
  * positions, false positives included — replays exactly in any
  * engine, which also makes the prune itself oracle-checkable.
  *
  * Sizing: m bits / k hashes are compile-time parameters; the words
  * array is m/64 longs — 4096 bits = 512 bytes here, and even a
  * 100M-key production filter (~1 GB at 10 bits/key) rides the same
  * broadcast path as any map-side join table. The build is one
  * map-side-combinable bit_or aggregate over the SMALL side only.
  */
object BloomJoin {

  val M = 4096 // bits (64 words)
  val K = 3    // hash functions

  private def hash(key: Column, i: Int): Column =
    pmod(mix32(key * lit(8L) + lit(i.toLong)), lit(M.toLong))

  /** Build the packed bit words from the key column of `small`:
    * explode the k positions per key, OR the bits per word — one
    * aggregate, driver-collects m/64 longs. */
  def bloomWords(small: DataFrame, keyCol: String): Array[Long] = {
    val pos = small
      .select(explode(array((0 until K).map(i => hash(col(keyCol), i)): _*))
        .as("pos"))
      .select((col("pos") - col("pos") % 64).divide(64).cast("int").as("w"),
        (col("pos") % 64).cast("int").as("b"))
      .groupBy(col("w"))
      .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), b))").as("mask"))
      .collect()
    val words = new Array[Long](M / 64)
    pos.foreach(r => words(r.getInt(0)) = r.getLong(1))
    words
  }

  /** Membership test as a pure codegen expression over the broadcast
    * word array: k mix32 probes, each a constant-array lookup + bit
    * test — scan speed, no shuffle, no UDF. */
  def bloomTest(words: Array[Long], key: Column): Column =
    (0 until K).map { i =>
      val h = hash(key, i)
      val w = (h - h % 64).divide(64).cast("int")
      val b = (h % 64).cast("int")
      call_function("shiftright",
        element_at(typedlit(words.toSeq), w + 1), b)
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)

  /** The production shape: prune `big` by the Bloom test built from
    * `small`, then exact-verify with the real join — false positives
    * die in the (now tiny) join, false negatives cannot exist. */
  def prunedSemiJoin(big: DataFrame, small: DataFrame, keyCol: String)
      : DataFrame = {
    val words = bloomWords(small, keyCol)
    big.filter(bloomTest(words, col(keyCol)))
      .join(small.select(keyCol).distinct(), Seq(keyCol), "left_semi")
  }

  /** q62: observability report of the reduction — per event type, how
    * many rows the Bloom passes vs the exact semi-join, and the false
    * positives in between. The flagged set is users with any high-value
    * purchase (selective: ~23% of users). The unpruned totals exist for
    * the report; the production path is prunedSemiJoin above, where
    * only Bloom-passing rows reach the join. */
  def q62BloomPrune(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val flagged = ev
      .filter(col("event_type") === "purchase" && col("value") > 190)
      .select(col("user_id")).distinct()
    val words = bloomWords(flagged, "user_id")
    ev.select(col("user_id"), col("event_type"))
      .withColumn("bloom_pass", bloomTest(words, col("user_id")))
      .join(broadcast(flagged.withColumn("is_flagged", lit(true))),
        Seq("user_id"), "left")
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("total_events"),
        count(when(col("bloom_pass"), 1)).as("bloom_pass_events"),
        count(when(col("is_flagged"), 1)).as("flagged_events"),
        count(when(col("bloom_pass") && col("is_flagged").isNull, 1))
          .as("false_positive_events"))
  }
}
