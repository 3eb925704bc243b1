package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Deduplication operators for LLM training-data pipelines: exact
  * (content hash), MinHash+LSH, SimHash, n-gram Jaccard, and
  * rolling-hash fingerprinting (SURVEY.md §2 #20-23, #29).
  *
  * Scale design: no operator ever forms the doc×doc cartesian.
  * Candidate pairs come from equality joins on LSH band hashes /
  * SimHash chunks / blocking keys, and only candidates are verified
  * exactly. Signatures are computed as single codegen'd expressions
  * over the token array — one scan, no intermediate explode until the
  * (small) candidate join.
  */
object Dedup {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)

  /** Exact dedup via content hash: hash-groupBy, keep min doc_id —
    * the canonical map-side-combinable dedup. */
  def q20DedupExact(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .groupBy(sha2(col("text"), 256).as("text_hash"))
      .agg(
        min(col("doc_id")).as("keep_doc_id"),
        count(lit(1)).as("dup_count"),
        sum(col("n_chars")).as("total_chars"))

  /** Distinct word-3-shingles of the text column, as one expression. */
  private[operators] val shingles3: Column = {
    val w = split(col("text"), " ")
    array_distinct(transform(
      sequence(lit(0), size(w) - 3),
      i => concat_ws(" ", element_at(w, i + 1), element_at(w, i + 2), element_at(w, i + 3))))
  }

  /** MinHash(128) + banded LSH near-dup detection:
    * shingle → 128-perm minhash signature (one nested-transform
    * expression, no explode) → 32 bands × 4 rows → equality join on
    * (band, band_hash) → exact Jaccard verification of candidates.
    * Band-join candidates are a tiny fraction of the corpus, so the
    * verify join is cheap; the cartesian never exists.
    */
  def q21DedupMinhash(spark: SparkSession, dir: String): DataFrame = {
    val nPerm = 128
    val bands = 32 // 4 rows per band: catches J>=~0.8 with p~1
    val sig = expr(
      s"""transform(sequence(0, ${nPerm - 1}),
            k -> array_min(transform(shingles, s -> xxhash64(s, k))))""")
    val withSig = docs(spark, dir)
      .withColumn("shingles", shingles3)
      .withColumn("sig", sig)
      .select(col("doc_id"), col("shingles"), col("sig"))
    val banded = withSig.select(
      col("doc_id"), col("shingles"),
      explode(expr(
        s"""transform(sequence(0, ${bands - 1}),
              b -> struct(b AS band, xxhash64(sig[4*b], sig[4*b+1], sig[4*b+2], sig[4*b+3]) AS bh))"""))
        .as("bb"))
      .select(col("doc_id"), col("shingles"), col("bb.band"), col("bb.bh"))
    val cand = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.shingles").as("sh_a"), col("b.shingles").as("sh_b"))
      .dropDuplicates("doc_a", "doc_b")
    cand
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= 0.5)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** 64-bit SimHash over the token stream (token weight = occurrence
    * count, implicit in iterating the raw token array), computed as a
    * single expression; candidates via the 4×16-bit chunk pigeonhole
    * (hamming <= 3 guarantees one equal chunk), verified by exact
    * hamming distance. */
  def q22DedupSimhash(spark: SparkSession, dir: String): DataFrame = {
    val simhash = expr(
      """aggregate(sequence(0, 63), 0L,
           (acc, j) -> acc + IF(
             aggregate(w, 0L,
               (a, x) -> a + IF((shiftright(xxhash64(x), j) & 1) = 1, 1L, -1L)) >= 0,
             shiftleft(1L, j), 0L))""")
    val withSig = docs(spark, dir)
      .withColumn("w", split(col("text"), " "))
      .withColumn("simhash", simhash)
      .select(col("doc_id"), col("simhash"))
    val chunked = withSig.select(
      col("doc_id"), col("simhash"),
      explode(expr(
        """transform(sequence(0, 3),
             c -> struct(c AS chunk_idx, (shiftright(simhash, 16*c) & 65535) AS chunk))"""))
        .as("cc"))
      .select(col("doc_id"), col("simhash"), col("cc.chunk_idx"), col("cc.chunk"))
    chunked.as("a")
      .join(chunked.as("b"),
        col("a.chunk_idx") === col("b.chunk_idx") && col("a.chunk") === col("b.chunk") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .dropDuplicates("doc_a", "doc_b")
      .filter(col("hamming") <= 8)
  }

  /** Exact n-gram Jaccard within (lang, source) blocks — the
    * blocked-pairwise variant (candidate blocking keeps the pair count
    * linear-ish in block sizes; at 100 TB blocks are the unit of
    * parallelism). */
  def q23NgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val withTri = docs(spark, dir)
      .withColumn("tri", shingles3)
      .select(col("doc_id"), col("lang"), col("source"), col("tri"))
    withTri.as("a")
      .join(withTri.as("b"),
        col("a.lang") === col("b.lang") && col("a.source") === col("b.source") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.lang").as("lang"), col("a.source").as("source"),
        col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        (size(array_intersect(col("a.tri"), col("b.tri"))).cast("double") /
          size(array_union(col("a.tri"), col("b.tri")))).as("jaccard"))
      .filter(col("jaccard") >= 0.02)
  }

  /** Karp-Rabin style document fingerprint: polynomial rolling hash of
    * engine-neutral word values over every 8-word window, fingerprint =
    * window minimum (winnowing). One codegen'd expression per row; the
    * fingerprint is stable under small edits away from the minimal
    * window — the property dedup-by-fingerprint relies on. */
  def q29Fingerprint(spark: SparkSession, dir: String): DataFrame = {
    val fp = expr(
      """array_min(transform(
           sequence(0, size(w) - 8),
           i -> aggregate(
             sequence(0, 7), 0L,
             (acc, k) -> acc * 31 + (length(element_at(w, i + k + 1)) * 131
                                     + ascii(element_at(w, i + k + 1))))))""")
    docs(spark, dir)
      .withColumn("w", split(col("text"), " "))
      .withColumn("fingerprint", fp)
      .select(col("doc_id"), col("fingerprint"), size(col("w")).as("n_words"))
  }
}
