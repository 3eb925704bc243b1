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

  /** Min-label propagation with pointer jumping over undirected edges.
    * Each round: (1) take the min over own + neighbors' labels (one
    * hop), then (2) short-circuit rep -> rep(rep) (pointer jump),
    * which doubles the effective propagation distance — `rounds`
    * rounds close components of diameter ~2^rounds (the plain one-hop
    * loop only closes diameter `rounds`). Rounds are materialized via
    * localCheckpoint so the plan stays flat instead of growing 3^r
    * self-references — the standard Spark iterative-algorithm shape
    * (a durable checkpoint dir replaces localCheckpoint on a real
    * cluster where executor loss matters).
    *
    * `initial`: (doc_id, rep) starting labels. `edges`: (src, dst)
    * pairs, treated as undirected. */
  def labelPropagate(initial: DataFrame, edges: DataFrame, rounds: Int): DataFrame = {
    val undirected = edges
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint() // edge derivation (e.g. minhash) runs once, not per round
    var labels = initial.localCheckpoint()
    var i = 0
    while (i < rounds) {
      val neighborMin = undirected.join(labels.withColumnRenamed("doc_id", "dst"), "dst")
        .groupBy(col("src").as("doc_id"))
        .agg(min(col("rep")).as("neighbor_rep"))
      val hop = labels.join(neighborMin, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("rep"), coalesce(col("neighbor_rep"), col("rep"))).as("rep"))
      val jump = hop.as("l")
        .join(hop.select(col("doc_id").as("r_id"), col("rep").as("r_rep")).as("r"),
          col("l.rep") === col("r.r_id"), "left")
        .select(col("l.doc_id").as("doc_id"),
          least(col("l.rep"), coalesce(col("r.r_rep"), col("l.rep"))).as("rep"))
      labels = jump.localCheckpoint()
      i += 1
    }
    labels
  }

  /** Full dedup pass: exact dups collapse by content hash; near-dup
    * pairs (minhash, J >= 0.5) collapse to their cluster's minimum
    * doc_id via min-label propagation with pointer jumping (see
    * labelPropagate — 3 rounds close diameter ~8 components; raise
    * `rounds` or loop to fixpoint for adversarially long chains).
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
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    val labels = labelPropagate(
      exactRep.select(col("doc_id"), col("exact_rep").as("rep")), pairs, rounds)
    labels.withColumn("kept", col("rep") === col("doc_id"))
  }

  /** Deterministic stratified sampling — the data-mixing op of a
    * training pipeline (per-source/per-language up/down-weighting into
    * a target mix). Same engine-neutral multiplicative hash as q40, so
    * any engine reproduces the identical sample: no RNG, no seed
    * shipping, and re-runs are idempotent (a doc's fate depends only
    * on its id). Per-stratum keep thresholds are integer per-mille
    * values — no float-rate arithmetic to diverge between engines.
    * One scan, map-side combinable aggregate: scan-speed at any scale. */
  def q43StratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    val permille = when(col("lang") === "en", 500)
      .when(col("lang") === "de", 350)
      .when(col("lang") === "fr", 250)
      .when(col("lang") === "es", 200)
      .otherwise(100)
    val h = pmod(col("doc_id") * lit(2654435761L), lit(4294967296L)) % 1000
    Tables.documents(spark, dir)
      .withColumn("kept", h < permille)
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("docs"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("kept_docs"),
        sum(when(col("kept"), col("n_chars"))).as("kept_chars"),
        min(when(col("kept"), col("doc_id"))).as("min_kept_doc_id"))
      .withColumn("achieved_rate",
        col("kept_docs").cast("double") / col("docs"))
  }

  /** Benchmark-contamination check: which corpus docs share word
    * 8-grams with a benchmark set (decontaminating training data
    * against eval benchmarks). 8-grams, not trigrams, are the
    * published practice (GPT-3 decontaminated on 13-grams, PaLM on
    * 8-grams) and the scale property follows directly: short n-grams
    * match almost everything (a trigram formulation on this corpus
    * produced ~200x the join volume for zero extra signal), long
    * n-grams are near-unique outside true overlap. Postings-join
    * formulation: the benchmark postings table (small by nature —
    * benchmarks are thousands of docs, not billions) broadcasts, the
    * corpus streams past it once, and the corpus×benchmark matrix
    * never forms. Benchmark stand-in here: doc_id % 10 == 0. */
  def q44Contamination(spark: SparkSession, dir: String): DataFrame = {
    val post = Tables.documents(spark, dir)
      .repartition(col("doc_id")) // parallelize shingling off the scan
      .select(col("doc_id"), explode(Dedup.shingles(8)).as("ng"))
    val bench = post.filter(col("doc_id") % 10 === 0)
      .select(col("ng"), col("doc_id").as("bdoc"))
    post.filter(col("doc_id") % 10 =!= 0)
      .join(broadcast(bench), "ng")
      .groupBy(col("doc_id"))
      .agg(
        countDistinct(col("ng")).as("shared_ngrams"),
        countDistinct(col("bdoc")).as("benchmark_docs"))
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
