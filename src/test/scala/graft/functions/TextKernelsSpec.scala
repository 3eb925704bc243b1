package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge.{column => exprCol, expression}
import graft.SparkFixture

/** Bit-identity of the native text kernels to the built-in-HOF
  * formulations they replaced (the legacy forms are inlined here as
  * the ground truth — this spec IS the record of what they were). */
class TextKernelsSpec extends AnyFunSuite with SparkFixture {

  // --- legacy formulations (verbatim from Dedup pre-kernel) ---

  private def legacyShingles(n: Int): Column = {
    val w = split(col("text"), " ")
    when(size(w) >= n,
      array_distinct(transform(
        sequence(lit(0), size(w) - n),
        i => array_join(slice(w, i + 1, lit(n)), " "))))
      .otherwise(array().cast("array<string>"))
  }

  private def legacyNgramHash(n: Int, distinct: Boolean): Column = {
    val args = (0 until n).map(k => s"hw[i+$k]").mkString(", ")
    val dedup = if (distinct) "array_distinct" else ""
    expr(
      s"""transform(
           array(transform(split(text, ' '), x -> xxhash64(x))),
           hw -> CASE WHEN size(hw) >= $n THEN $dedup(transform(
             sequence(0, size(hw) - $n),
             i -> xxhash64($args)))
             ELSE CAST(array() AS array<bigint>) END)[0]""")
  }

  private val legacyTopCount: Column = expr(
    """aggregate(array_sort(split(text, ' ')),
         named_struct('prev', cast(null as string), 'run', 0, 'best', 0),
         (acc, x) -> named_struct(
           'prev', x,
           'run',  CASE WHEN x = acc.prev THEN acc.run + 1 ELSE 1 END,
           'best', greatest(acc.best,
             CASE WHEN x = acc.prev THEN acc.run + 1 ELSE 1 END)),
         acc -> acc.best)""")

  // --- fixtures: the corpus plus adversarial hand-rolled texts ---

  private lazy val corpus =
    spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")

  private lazy val edgy = {
    import spark.implicits._
    Seq(
      (1L, ""),
      (2L, "one"),
      (3L, "one two"),
      (4L, "one two three"),
      (5L, "a a a a a a"),
      (6L, "a  b   c"), // consecutive separators => empty words
      (7L, " leading and trailing "),
      (8L, "naïve café über schrödinger 東京 таблица"),
      (9L, "x y x y x y x y"),
      (10L, "the the the the quick quick brown fox")
    ).toDF("doc_id", "text")
  }

  private def assertSame(df: org.apache.spark.sql.DataFrame,
      legacy: Column, native: Column, label: String): Unit = {
    val bad = df.select(col("doc_id"), legacy.as("l"), native.as("n"))
      .filter(not(col("l") <=> col("n")))
    assert(bad.isEmpty, s"$label diverges: ${bad.take(3).mkString("; ")}")
  }

  private def nativeShingles(n: Int): Column =
    exprCol(WordShingles(expression(col("text")), n))
  private def nativeNgram(n: Int, d: Boolean): Column =
    exprCol(NgramHashes(expression(col("text")), n, d))

  test("word shingles bit-match the HOF form on corpus + edge cases") {
    for (df <- Seq(corpus, edgy); n <- Seq(1, 3, 8))
      assertSame(df, legacyShingles(n), nativeShingles(n), s"shingles($n)")
  }

  test("ngram hashes (distinct + positional) bit-match the HOF form") {
    for (df <- Seq(corpus, edgy); n <- Seq(1, 3, 4, 8); d <- Seq(true, false))
      assertSame(df, legacyNgramHash(n, d), nativeNgram(n, d), s"ngram($n,$d)")
  }

  test("rolling fingerprint bit-matches the transform+aggregate form") {
    // verbatim legacy q29 form (over w = split(text, ' ')); NULL when
    // the doc has fewer than n words
    def legacyFp(n: Int): Column = {
      val w = split(col("text"), " ")
      when(size(w) >= n, expr(
        s"""array_min(transform(
             sequence(0, size(split(text, ' ')) - $n),
             i -> aggregate(
               sequence(0, ${n - 1}), 0L,
               (acc, k) -> acc * 31 + (length(element_at(split(text, ' '), i + k + 1)) * 131
                                       + ascii(element_at(split(text, ' '), i + k + 1))))))"""))
    }
    for (df <- Seq(corpus, edgy); n <- Seq(1, 3, 8))
      assertSame(df, legacyFp(n),
        exprCol(FingerprintMin(expression(col("text")), n)), s"fingerprint($n)")
  }

  test("word rep stats match size/distinct/run-length formulations") {
    val st = exprCol(WordRepStats(expression(col("text"))))
    val w = split(col("text"), " ")
    for (df <- Seq(corpus, edgy)) {
      val withSt = df.withColumn("st", st)
      val bad = withSt.filter(not(
        col("st.n_words") <=> size(w) &&
          col("st.n_distinct") <=> size(array_distinct(w)) &&
          col("st.top_count") <=> legacyTopCount))
      assert(bad.isEmpty, s"rep stats diverge: ${bad.take(3).mkString("; ")}")
    }
  }
}
