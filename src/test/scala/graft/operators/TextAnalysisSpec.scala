package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

class TextAnalysisSpec extends AnyFunSuite with SparkFixture {

  test("q26 predicted language is always one of the marker languages") {
    val rows = TextAnalysis.q26LangId(spark, sfDir).collect()
    val langs = Set("de", "en", "es", "fr", "zh")
    assert(rows.forall(r => langs.contains(r.getAs[String]("predicted_lang"))))
    // argmax property: the predicted language's score is the max score
    rows.take(50).foreach { r =>
      val scores = langs.toSeq.map(l => l -> r.getAs[Double](s"score_$l")).toMap
      assert(scores(r.getAs[String]("predicted_lang")) === scores.values.max)
    }
  }

  test("q27 quality score stays in [0,1] and formula holds on one row") {
    val rows = TextAnalysis.q27QualityScore(spark, sfDir).collect()
    assert(rows.forall { r =>
      val q = r.getAs[Double]("quality_score"); q >= 0.0 && q <= 1.0 + 1e-12
    })
    val r = rows.head
    val expected = math.min(r.getAs[Int]("n_words") / 50.0, 1.0) * 0.4 +
      (1.0 - r.getAs[Double]("stopword_ratio")) * 0.3 +
      math.min(r.getAs[Double]("avg_word_len") / 6.0, 1.0) * 0.3
    assert(math.abs(r.getAs[Double]("quality_score") - expected) < 1e-12)
  }

  test("q28 token counts agree between whitespace and regex on this corpus") {
    // corpus is lowercase words joined by single spaces, so both
    // tokenizers must agree everywhere
    val diff = TextAnalysis.q28TokenCount(spark, sfDir)
      .filter(col("ws_tokens") =!= col("re_tokens")).count()
    assert(diff === 0)
  }

  test("token counting on synthetic mixed text") {
    import spark.implicits._
    val df = Seq((1L, "abc 123 d4e", 11L)).toDF("doc_id", "text", "n_chars")
    val out = df.select(
      size(split(col("text"), " ")).as("ws"),
      size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+"), lit(0))).as("re"))
      .collect()(0)
    assert(out.getAs[Int]("ws") === 3)
    // regex splits d4e into d, 4, e -> abc, 123, d, 4, e
    assert(out.getAs[Int]("re") === 5)
  }
}
