package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming DISTRIBUTION-DRIFT monitor — the continuous face of the
  * batch q81 chi-square term drift: as documents arrive, watermarked
  * tumbling windows accumulate per-term counts; when a window closes,
  * its term distribution is scored against a broadcast REFERENCE
  * distribution (the accepted corpus), flagging the ingest batches
  * that shifted vocabulary — the "did this crawl drift" alarm a
  * training pipeline runs at the door.
  *
  * Split of labor (and why): the STREAM side computes only the
  * per-(window, term) counts — state is bounded by vocab × open
  * windows and reclaimed at the watermark. The chi-square READOUT
  * runs as a batch pass over closed windows (driftReport): it needs
  * each window's total, and a second streaming aggregate over the
  * same window cannot join the first in append mode — while a
  * cells-sized batch join downstream is free. This is the standard
  * production split: heavy counting in-stream, tiny readout on close.
  */
object StreamDrift {

  /** (text, ts) document stream → per closed (window, term) counts.
    * Append mode: a cell emits exactly once, when the watermark
    * passes its window end. */
  def termCells(docs: DataFrame, windowLen: String, horizon: String): DataFrame =
    docs
      .withWatermark("ts", horizon)
      .select(col("ts"), explode(split(col("text"), " ")).as("term"))
      .groupBy(window(col("ts"), windowLen).as("win"), col("term"))
      .agg(count(lit(1)).as("o"))

  /** Batch readout over emitted cells: for every closed window and
    * every REFERENCE term (windows missing a term score its full
    * absence — o = 0), the q81 integer-micro chi-square contribution
    * of observed vs expected = ref share × window total. Top drifted
    * terms per window by (chi2 desc, term asc). All arithmetic is
    * the q81 recipe — exact integers into one fixed IEEE op
    * sequence, floored to µ-units — so the report reproduces
    * bit-for-bit on any engine. */
  def driftReport(cells: DataFrame, reference: DataFrame, topN: Int): DataFrame = {
    val d = (c: org.apache.spark.sql.Column) => c.cast("double")
    // Zero-expectation guard: a ref_cnt <= 0 term (or an empty/zeroed
    // reference) makes e = 0, the chi2 division yields Infinity, and
    // floor(Inf) cast to long lands Long.MaxValue — one degenerate
    // reference row would dominate every window's ranking. Chi-square
    // is undefined at zero expectation, so such cells are dropped here
    // rather than scored; callers wanting "new term appeared" alarms
    // should diff vocabularies explicitly (q57 shape), not abuse chi2.
    val ref = reference.filter(col("ref_cnt") > 0)
    val refTot = ref.agg(sum(col("ref_cnt")).as("ref_tot"))
    val winTot = cells.groupBy(col("win")).agg(sum(col("o")).as("w_tot"))
    val grid = winTot.crossJoin(broadcast(ref))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("win"))
      .orderBy(col("chi2_micro").desc, col("term").asc)
    grid
      .join(cells, Seq("win", "term"), "left")
      .withColumn("o", coalesce(col("o"), lit(0L)))
      .crossJoin(broadcast(refTot))
      .withColumn("e", d(col("w_tot")) * d(col("ref_cnt")) / d(col("ref_tot")))
      .withColumn("chi2_micro",
        floor((d(col("o")) - col("e")) * (d(col("o")) - col("e")) / col("e")
          * lit(1000000.0)).cast("long"))
      .withColumn("drift_rank", row_number().over(w))
      .filter(col("drift_rank") <= topN)
      .select(col("win"), col("term"), col("o"), col("w_tot"),
        col("chi2_micro"), col("drift_rank"))
  }
}
