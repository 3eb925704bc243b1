package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Approximate-nearest-neighbor search over the dense embedding column
  * (SURVEY.md §2 #24-25, #30). Dot products are left-fold double
  * aggregations over the float array — element order is fixed, so the
  * result is bit-identical in any engine that folds left in double
  * (which is how the DuckDB oracle is written).
  *
  * Scale design: probes are a small set → broadcast; the corpus is
  * scanned exactly once (brute force) or pruned to LSH buckets (q25);
  * near-dup pairing (q30) is blocked so the corpus×corpus cartesian
  * never forms.
  */
object Ann {

  /** Left-fold double dot product of two float-array columns. */
  private def dotExpr(a: String, b: String): org.apache.spark.sql.Column =
    expr(s"""aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
                       0D, (acc, p) -> acc + p)""")

  private def withNorm(df: DataFrame): DataFrame =
    df.withColumn("norm", sqrt(expr(
      """aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                   0D, (acc, p) -> acc + p)""")))

  /** Brute-force exact cosine top-k: probes (vec_id % 50 == 0)
    * broadcast against one corpus scan — the baseline every ANN method
    * is judged against. */
  def q24AnnBruteforce(spark: SparkSession, dir: String): DataFrame = {
    val emb = withNorm(Tables.embeddings(spark, dir))
    val probes = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("probe_id"), col("embedding").as("p_emb"),
        col("norm").as("p_norm"))
    val scored = emb.select(col("vec_id").as("neighbor_id"), col("embedding"), col("norm"))
      .join(broadcast(probes), col("probe_id") =!= col("neighbor_id"))
      .withColumn("cosine", dotExpr("p_emb", "embedding") / (col("p_norm") * col("norm")))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 10)
      .select(col("probe_id"), col("neighbor_id"), col("rank"), col("cosine"))
  }

  /** Random-hyperplane LSH: L=8 tables × 8 bits. Hyperplane component
    * signs come from xxhash64(table*64*8 + bit*64 + i) parity — fully
    * deterministic, no stored model. Candidates = bucket collisions in
    * any table; ranked by exact cosine within candidates. */
  def q25AnnLsh(spark: SparkSession, dir: String): DataFrame = {
    val nTables = 8
    val bitsPerTable = 8
    // bucket for table t: 8 sign bits of hyperplane dot products
    val bucketExpr = expr(
      s"""transform(sequence(0, ${nTables - 1}), t ->
            struct(t AS tbl,
              aggregate(sequence(0, ${bitsPerTable - 1}), 0L, (acc, j) ->
                acc + IF(
                  aggregate(sequence(0, size(embedding) - 1), 0D, (s, i) ->
                    s + CAST(element_at(embedding, i + 1) AS DOUBLE) *
                        IF((xxhash64(t * 512 + j * 64 + i) & 1) = 1, 1D, -1D)) >= 0D,
                  shiftleft(1L, j), 0L)) AS bucket))""")
    val emb = withNorm(Tables.embeddings(spark, dir))
      .withColumn("tb", explode(bucketExpr))
      .select(col("vec_id"), col("embedding"), col("norm"),
        col("tb.tbl"), col("tb.bucket"))
    val probes = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("probe_id"), col("embedding").as("p_emb"),
        col("norm").as("p_norm"), col("tbl"), col("bucket"))
    val cand = probes
      .join(emb.select(col("vec_id").as("neighbor_id"), col("embedding"),
        col("norm"), col("tbl"), col("bucket")), Seq("tbl", "bucket"))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .select("probe_id", "neighbor_id", "p_emb", "p_norm", "embedding", "norm")
      .dropDuplicates("probe_id", "neighbor_id")
    val scored = cand.withColumn("cosine",
      dotExpr("p_emb", "embedding") / (col("p_norm") * col("norm")))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("probe_id"), col("neighbor_id"), col("rank"), col("cosine"))
  }

  /** Embedding-cosine near-duplicate pairs above a threshold, blocked
    * by label (the blocking key bounds pair generation; the unblocked
    * scale path is the LSH bucketing of q25). */
  def q30DedupEmbedding(spark: SparkSession, dir: String): DataFrame = {
    val emb = withNorm(Tables.embeddings(spark, dir))
      .select(col("vec_id"), col("label"), col("embedding"), col("norm"))
    emb.as("a")
      .join(emb.as("b"),
        col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .select(
        col("a.label").as("label"),
        col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        (dotExpr("a.embedding", "b.embedding") /
          (col("a.norm") * col("b.norm"))).as("cosine"))
      .filter(col("cosine") >= 0.3)
  }
}
