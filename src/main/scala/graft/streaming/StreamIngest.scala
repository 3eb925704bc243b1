package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Pipeline

/** Streaming ingest preprocessing — the front of the training-data
  * pipeline run as a continuous stage instead of a batch job: score
  * incoming documents (the q27 quality formula), drop the ones below
  * a floor, and chunk the survivors (the q75 windows), all as
  * STATELESS streaming transforms (pure per-row expressions — no
  * watermark, no state store, trivially scalable; the stateful
  * screens — exact/near dedup — compose after this via StreamDedup).
  *
  * Batch/stream parity is by construction: the same Column
  * expressions run in both modes, and the spec asserts the streamed
  * output equals the batch computation row for row.
  */
object StreamIngest {

  /** (doc_id, text, n_chars) stream → quality-filtered chunk stream.
    * minQuality in [0,1] against the q27 composite score. */
  def preprocess(docs: DataFrame, minQuality: Double,
      chunkSize: Int = 64, stride: Int = 48): DataFrame =
    Pipeline.chunkDocs(scored(docs).filter(col("quality_score") >= minQuality),
      chunkSize, stride)

  /** The q27 composite quality score as a streaming-safe projection. */
  def scored(docs: DataFrame): DataFrame = {
    val w = split(col("text"), " ")
    val nWords = size(col("w"))
    val stopRatio =
      expr("size(filter(w, x -> x IN ('join','hash','row')))").cast("double") / nWords
    val avgWordLen = (col("n_chars") - nWords + 1).cast("double") / nWords
    docs.withColumn("w", w)
      .withColumn("quality_score",
        least(nWords.cast("double") / 50.0, lit(1.0)) * 0.4 +
          (lit(1.0) - stopRatio) * 0.3 +
          least(avgWordLen / 6.0, lit(1.0)) * 0.3)
      .drop("w")
  }
}
