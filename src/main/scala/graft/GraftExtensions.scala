package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{FingerprintMin, FloatVecCosine, HyperplaneBuckets, IntVecSqDist, MinhashBandHashes, NgramHashes, Simhash64, SimhashWords, WordRepStats, WordShingles}

/** SQL surface for graft's custom Catalyst expressions. Two ways in:
  *
  *  1. config: `spark.sql.extensions=graft.GraftExtensions` — the
  *     standard extension-injection path, functions available in every
  *     session of the application;
  *  2. imperative: `GraftExtensions.register(spark)` on a live session.
  *
  * Registered functions:
  *   minhash_band_hashes(arr<long>, nPerm, nBands) -> arr<long>
  *   simhash64(arr<long>) -> long
  *   simhash_words(arr<string>) -> long   (engine-neutral token hash)
  *   floatvec_cosine(arr<float>, arr<float>) -> double
  *   hyperplane_buckets(arr<float>, nTables, bits) -> arr<long>
  *   int_vec_sq_dist(arr<long>, arr<long>) -> long
  *   ngram_hashes(text, n, distinct) -> arr<long>
  *   word_shingles(text, n) -> arr<string>
  *   word_rep_stats(text) -> struct<n_words, n_distinct, top_count>
  *   fingerprint_min(text, n) -> long (null under n words)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.definitions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def intLit(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private[graft] val definitions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("minhash_band_hashes",
      new ExpressionInfo(classOf[MinhashBandHashes].getName, "minhash_band_hashes"),
      (args: Seq[Expression]) =>
        MinhashBandHashes(args(0), intLit(args(1), "nPerm"), intLit(args(2), "nBands"))),
    ("simhash64",
      new ExpressionInfo(classOf[Simhash64].getName, "simhash64"),
      (args: Seq[Expression]) => Simhash64(args(0))),
    ("simhash_words",
      new ExpressionInfo(classOf[SimhashWords].getName, "simhash_words"),
      (args: Seq[Expression]) => SimhashWords(args(0))),
    ("floatvec_cosine",
      new ExpressionInfo(classOf[FloatVecCosine].getName, "floatvec_cosine"),
      (args: Seq[Expression]) => FloatVecCosine(args(0), args(1))),
    ("hyperplane_buckets",
      new ExpressionInfo(classOf[HyperplaneBuckets].getName, "hyperplane_buckets"),
      (args: Seq[Expression]) =>
        HyperplaneBuckets(args(0), intLit(args(1), "nTables"), intLit(args(2), "bitsPerTable"))),
    ("int_vec_sq_dist",
      new ExpressionInfo(classOf[IntVecSqDist].getName, "int_vec_sq_dist"),
      (args: Seq[Expression]) => IntVecSqDist(args(0), args(1))),
    ("ngram_hashes",
      new ExpressionInfo(classOf[NgramHashes].getName, "ngram_hashes"),
      (args: Seq[Expression]) => NgramHashes(args(0), intLit(args(1), "n"),
        args(2) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Boolean, _) => v
          case other => throw new IllegalArgumentException(
            s"distinct must be a boolean literal, got $other")
        })),
    ("word_shingles",
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (args: Seq[Expression]) => WordShingles(args(0), intLit(args(1), "n"))),
    ("word_rep_stats",
      new ExpressionInfo(classOf[WordRepStats].getName, "word_rep_stats"),
      (args: Seq[Expression]) => WordRepStats(args(0))),
    ("fingerprint_min",
      new ExpressionInfo(classOf[FingerprintMin].getName, "fingerprint_min"),
      (args: Seq[Expression]) => FingerprintMin(args(0), intLit(args(1), "n"))))

  /** Imperative registration on an existing session. */
  def register(spark: SparkSession): Unit =
    definitions.foreach { case (name, info, builder) =>
      org.apache.spark.sql.graftbridge.Bridge.registerFunction(spark, name, info, builder)
    }
}
