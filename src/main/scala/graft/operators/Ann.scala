package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge.{column => exprCol, expression}
import graft.functions.{FloatVecCosine, HyperplaneBuckets, NearestCellsInt}
import graft.sources.Tables

/** Approximate-nearest-neighbor search over the dense embedding column
  * (SURVEY.md §2 #24-25, #30).
  *
  * Vector math runs in custom codegen Expressions (FloatVecCosine,
  * HyperplaneBuckets — graft.functions.VectorKernels): primitive
  * double loops instead of interpreted higher-order functions, with
  * the same left-fold accumulation order as the SQL formulation, so
  * scores stay bit-identical to the DuckDB oracle.
  *
  * Scale design: probes are a small set → broadcast; the corpus is
  * scanned exactly once (brute force) or pruned to LSH buckets (q25);
  * near-dup pairing (q30) is blocked so the corpus×corpus cartesian
  * never forms.
  */
object Ann {

  private def cosine(a: Column, b: Column): Column =
    exprCol(FloatVecCosine(expression(a), expression(b)))

  /** Brute-force exact cosine top-k: probes (vec_id % 50 == 0)
    * broadcast against one corpus scan — the baseline every ANN method
    * is judged against. */
  def q24AnnBruteforce(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir).repartition(col("vec_id"))
    val probes = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("probe_id"), col("embedding").as("p_emb"))
    val scored = emb.select(col("vec_id").as("neighbor_id"), col("embedding"))
      .join(broadcast(probes), col("probe_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("p_emb"), col("embedding")))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 10)
      .select(col("probe_id"), col("neighbor_id"), col("rank"), col("cosine"))
  }

  /** Random-hyperplane LSH: L=8 tables × 8 bits, bucket codes from the
    * HyperplaneBuckets kernel (deterministic hyperplanes — no stored
    * model). Candidates = bucket collisions in any table; ranked by
    * exact cosine within candidates. */
  def q25AnnLsh(spark: SparkSession, dir: String): DataFrame = {
    val nTables = 8
    val bitsPerTable = 8
    val emb = Tables.embeddings(spark, dir)
      .repartition(col("vec_id")) // parallelize bucket computation
      .select(col("vec_id"), col("embedding"),
        posexplode(exprCol(HyperplaneBuckets(
          expression(col("embedding")), nTables, bitsPerTable))).as(Seq("tbl", "bucket")))
    val probes = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("probe_id"), col("embedding").as("p_emb"),
        col("tbl"), col("bucket"))
    val cand = probes
      .join(emb.select(col("vec_id").as("neighbor_id"), col("embedding"),
        col("tbl"), col("bucket")), Seq("tbl", "bucket"))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .select("probe_id", "neighbor_id", "p_emb", "embedding")
      .dropDuplicates("probe_id", "neighbor_id")
    val scored = cand.withColumn("cosine", cosine(col("p_emb"), col("embedding")))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("probe_id"), col("neighbor_id"), col("rank"), col("cosine"))
  }

  /** IVF (inverted-file) ANN: the corpus is partitioned into kmeans
    * cells (assignment = nearest centroid, one codegen pass); each
    * probe searches its `probeCells` nearest cells with exact cosine.
    * Complements q25's LSH: IVF cells ADAPT to the data distribution
    * (tighter candidate sets on clustered data; k grows with N to
    * bound cell size), while LSH is data-oblivious. The trained
    * "model" is k*dim doubles — broadcast-sized by construction, so
    * the index adds no join: cell ids ride along as columns and
    * candidates come from a cell-equality join. */
  def q45AnnIvf(spark: SparkSession, dir: String): DataFrame =
    annIvf(spark, dir, k = 16, iters = 5, probeCells = 6, topK = 5)

  /** IVF over the DETERMINISTIC quantized kmeans cells: training,
    * cell assignment, and probe fan-out all run in exact integer
    * arithmetic (Clustering.centroidsQuantized + NearestCellsInt), so
    * the whole index — cells, candidates, and the bit-exact cosine
    * rerank — reproduces on any engine: the q45 oracle replays it in
    * DuckDB. Scores use the ORIGINAL float embeddings (quantization
    * only decides the partitioning, never the ranking). */
  def annIvf(spark: SparkSession, dir: String, k: Int, iters: Int,
      probeCells: Int, topK: Int): DataFrame = {
    val cents = Clustering.centroidsQuantized(spark, dir, k, iters)
    val emb = Tables.embeddings(spark, dir)
      .repartition(col("vec_id"))
      .select(col("vec_id"), col("embedding"))
      .withColumn("q", Clustering.quantizedCol)
    // corpus side: each vector lives in exactly its nearest cell
    val corpus = emb.select(
      col("vec_id").as("neighbor_id"), col("embedding"),
      exprCol(NearestCellsInt(expression(col("q")), cents, 1))(0).as("cell"))
    // probe side: fan out to the probeCells nearest cells
    val probes = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("probe_id"), col("embedding").as("p_emb"),
        explode(exprCol(NearestCellsInt(expression(col("q")), cents, probeCells)))
          .as("cell"))
    val scored = probes.join(corpus, "cell")
      .filter(col("probe_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("p_emb"), col("embedding")))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("probe_id"), col("neighbor_id"), col("rank"), col("cosine"))
  }

  /** Embedding-cosine near-duplicate pairs above a threshold.
    * Candidates come from random-hyperplane LSH bucket collisions
    * (HyperplaneBuckets — the q25 machinery), verified by exact
    * cosine, so precision is 1.0 by construction and neither the
    * corpus×corpus cartesian nor a per-label quadratic block join
    * ever forms: pair generation is bounded by bucket sizes, and
    * recall is an explicit (bitsPerTable, nTables) knob — the
    * standard contract of embedding dedup at scale (candidate
    * recall traded for pruning, cf. SNIPPETS.md MinHashLSH).
    *
    * Parameter regime — measured, not assumed: the test embeddings
    * hold NO high-cosine planted pairs (max pairwise cosine ~0.51;
    * the 0.3 threshold sits just above the random-pair background of
    * |cos|~0.12 for 64-d). Near the background there is no gap for
    * ANY exact pruning scheme (prefix-filter bounds degenerate: a
    * 0.3-suffix-norm prefix covers ~59/64 dims), so parameters here
    * favor recall: b=4 bits, L=32 tables gives per-pair recall
    * 1-(1-p^4)^32 with p = 1-acos(cos)/pi, ~0.99 at the 0.3 boundary.
    * A production near-dup corpus (threshold >= 0.9) wants b=8, L=16:
    * recall 0.996 with real pruning (random-pair collision 0.5^8/table). */
  def q30DedupEmbedding(spark: SparkSession, dir: String): DataFrame =
    dedupEmbedding(spark, dir, threshold = 0.3, nTables = 32, bitsPerTable = 4)

  def dedupEmbedding(spark: SparkSession, dir: String, threshold: Double,
      nTables: Int, bitsPerTable: Int): DataFrame = {
    val vecs = Tables.embeddings(spark, dir)
      .repartition(col("vec_id")) // parallelize bucket computation
      .select(col("vec_id"), col("embedding"))
    // band rows carry only (vec_id, tbl, bucket): the 64-float vectors
    // stay out of the exploded bucket table and its self-join, exactly
    // like q21's band table — candidates are bare id pairs until the
    // (much smaller, post-dedup) verify join fetches vectors back.
    val banded = vecs
      .select(col("vec_id"),
        posexplode(exprCol(HyperplaneBuckets(
          expression(col("embedding")), nTables, bitsPerTable))).as(Seq("tbl", "bucket")))
      // join-key shuffle -> ReusedExchange: the signature pass runs once
      .repartition(col("tbl"), col("bucket"))
    val cand = banded.as("a")
      .join(banded.as("b"),
        col("a.tbl") === col("b.tbl") && col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      .dropDuplicates("vec_a", "vec_b")
    cand
      .join(vecs.select(col("vec_id").as("vec_a"), col("embedding").as("emb_a")), "vec_a")
      .join(vecs.select(col("vec_id").as("vec_b"), col("embedding").as("emb_b")), "vec_b")
      .select(col("vec_a"), col("vec_b"),
        cosine(col("emb_a"), col("emb_b")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
