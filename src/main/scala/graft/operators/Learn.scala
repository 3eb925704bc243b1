package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Distributed supervised training: the quality-classifier role of an
  * LLM data pipeline (the fastText-style filter most corpora are
  * gated by — train a cheap linear model, score every document, keep
  * the high side). Re-expressed Spark-first AND deterministically:
  * integer features, integer labels, integer weight updates, so the
  * whole training run replays bit-for-bit in any engine (the q96
  * unrolled-iterations discipline applied to LEARNING rather than
  * factorization).
  */
object Learn {

  /** q99: batch-perceptron training of a document quality classifier,
    * 5 full-batch epochs, every epoch's state oracle-replayed.
    *
    * Features per doc (all exact int64; divisions only on positive
    * operands, so Spark `div` == DuckDB `//`):
    *   x1 = n_words, x2 = n_chars div 100, x3 = stopword count,
    *   x4 = avg word length in milli = ((n_chars−n_words+1)·10³) div n_words
    * Label (integer rule, no float threshold): y = +1 iff the doc is
    * long (n_words ≥ 40) and not stopword-heavy (5·x3 ≤ n_words) —
    * the same length/stopword heuristics q27 blends, as a hard gate.
    *
    * Training is the BATCH perceptron (the per-sample classic is
    * inherently sequential; the batch gradient is a sum — exactly
    * what a cluster aggregates): epoch t computes
    *   g = Σ_{y·(w_t·x) ≤ 0} y·x,   w_{t+1} = w_t + g
    * with w_0 = 0 (so epoch 1's gradient sums every doc). Weights are
    * driver metadata (6 longs) broadcast into the next epoch's
    * aggregate as literals; each epoch is ONE map-side-combinable
    * single-group aggregate over the cached feature frame — the
    * corpus is scanned once for features, then 5 × O(rows/partition)
    * local reduces. No shuffle of anything doc-sized after the
    * feature projection.
    *
    * Overflow audit: |w_j| ≤ epochs · Σ|x_j| ≤ 5·10³·N (x4 ≤ 10³·
    * avg-word-len bound), dot ≤ 5 terms · |w|·|x| ≤ 2.5·10¹³ at
    * N = 10⁶ — int64-safe to corpus ~ 10⁸ docs; beyond that, scale
    * x2/x4 down (a positive constant factor never flips the sign
    * test, which is all the update reads).
    *
    * Output: one row per epoch — misclassified count under w_t and
    * the updated weights w_{t+1} — so the oracle pins the entire
    * trajectory, not just the final model. */
  def q99Perceptron(spark: SparkSession, dir: String): DataFrame = {
    val epochs = 5
    val feats = Tables.parallelized(Tables.documents(spark, dir), col("doc_id"))
      .withColumn("w", split(col("text"), " "))
      .select(
        col("doc_id"),
        size(col("w")).cast("long").as("x1"),
        expr("n_chars div 100").as("x2"),
        expr("size(filter(w, x -> x IN ('join','hash','row')))")
          .cast("long").as("x3"),
        expr("((n_chars - size(w) + 1) * 1000) div size(w)").as("x4"))
      .withColumn("y",
        when(col("x1") >= 40 && col("x3") * 5 <= col("x1"), lit(1L))
          .otherwise(lit(-1L)))
      .cache()
    try {
      var w = Array.fill(5)(0L) // (bias, x1, x2, x3, x4)
      val rows = (1 to epochs).map { epoch =>
        val dot = lit(w(0)) + lit(w(1)) * col("x1") + lit(w(2)) * col("x2") +
          lit(w(3)) * col("x3") + lit(w(4)) * col("x4")
        val mis = col("y") * dot <= 0
        val r = feats.agg(
          count(when(mis, 1)).as("mis"),
          sum(when(mis, col("y")).otherwise(0L)).as("g0"),
          sum(when(mis, col("y") * col("x1")).otherwise(0L)).as("g1"),
          sum(when(mis, col("y") * col("x2")).otherwise(0L)).as("g2"),
          sum(when(mis, col("y") * col("x3")).otherwise(0L)).as("g3"),
          sum(when(mis, col("y") * col("x4")).otherwise(0L)).as("g4"))
          .head() // 1-row aggregate per epoch — metadata-sized
        w = Array.tabulate(5)(j => w(j) + r.getLong(j + 1))
        (epoch.toLong, r.getLong(0), w(0), w(1), w(2), w(3), w(4))
      }
      import spark.implicits._
      rows.toDF("epoch", "mis", "w_bias", "w_words", "w_chars", "w_stop", "w_awl")
    } finally feats.unpersist()
  }
}
