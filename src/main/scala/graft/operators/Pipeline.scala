package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import Exprs._

/** End-to-end training-data pipeline operators: deterministic dataset
  * splitting and the full dedup pass (exact + near-dup with cluster
  * representatives) that produces the kept corpus.
  */
object Pipeline {

  /** Engine-neutral deterministic hash split: Knuth multiplicative
    * hashing on the id — pure integer arithmetic, so any engine
    * assigns identical splits (no RNG, no engine hash function).
    * Thresholds: 80/10/10. */
  def splitCol(id: Column): Column = {
    val h = pmod(id * lit(2654435761L), lit(4294967296L)) % 100
    when(h < 80, "train").when(h < 90, "validation").otherwise("test")
  }

  /** Split assignment + per-(split, lang) stratification stats. */
  def q40HashSplit(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir)
      .withColumn("split", splitCol(col("doc_id")))
      .groupBy(col("split"), col("lang"))
      .agg(
        count(lit(1)).as("docs"),
        sum(col("n_chars")).as("chars"),
        min(col("doc_id")).as("min_doc_id"))
  }

  /** Full dedup pass: exact dups collapse by content hash; near-dup
    * pairs (minhash, J >= 0.5) collapse to their cluster's minimum
    * doc_id via iterative min-label propagation (3 rounds closes
    * chains of length 2^3 — far beyond observed cluster diameters;
    * the general connected-components loop iterates to fixpoint).
    * Output: one row per doc with its representative and kept flag —
    * the projection `filter(kept)` IS the deduplicated corpus. */
  def dedupCorpus(spark: SparkSession, dir: String, rounds: Int = 3): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    // exact: representative = min doc_id of identical text
    val exactRep = docs
      .groupBy(sha2(col("text"), 256).as("h"))
      .agg(min(col("doc_id")).as("exact_rep"), collect_list(col("doc_id")).as("members"))
      .select(explode(col("members")).as("doc_id"), col("exact_rep"))
    // near-dup edges between exact representatives
    val pairs = Dedup.q21DedupMinhash(spark, dir)
      .select(col("doc_a"), col("doc_b"))
    // undirected edges, then propagate the min label `rounds` times
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
    var labels = exactRep.select(col("doc_id"), col("exact_rep").as("rep"))
    var i = 0
    while (i < rounds) {
      val neighborMin = edges.join(labels.withColumnRenamed("doc_id", "dst"), "dst")
        .groupBy(col("src").as("doc_id"))
        .agg(min(col("rep")).as("neighbor_rep"))
      labels = labels.join(neighborMin, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("rep"), coalesce(col("neighbor_rep"), col("rep"))).as("rep"))
      i += 1
    }
    labels.withColumn("kept", col("rep") === col("doc_id"))
  }

  /** Summary for the gate: corpus size, kept docs, dup docs removed. */
  def q41DedupPipeline(spark: SparkSession, dir: String): DataFrame =
    dedupCorpus(spark, dir)
      .agg(
        count(lit(1)).as("docs"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("kept_docs"),
        sum(when(!col("kept"), 1L).otherwise(0L)).as("removed_docs"),
        countDistinct(col("rep")).as("clusters"))
}
