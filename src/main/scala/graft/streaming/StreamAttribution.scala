package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming attribution — the stream-stream face of the batch range
  * join (Olap.q39RangeJoin / the reference's conversion window): each
  * purchase is joined to the clicks of the SAME user in the hour
  * before it, as both streams arrive.
  *
  * This is Structured Streaming's watermarked interval join: the
  * equi-key (user) partitions state, the time-range predicate plus
  * BOTH watermarks let the engine expire buffered rows once no
  * in-range partner can still arrive — state is bounded by
  * (watermark delay + window) of traffic per side, never the full
  * history. Append-mode output: a match is emitted exactly once, and
  * a checkpointed restart resumes with the buffered rows intact (the
  * spec proves a click arriving after a restart still matches a
  * purchase buffered before it).
  */
object StreamAttribution {

  /** Inner interval join: click in [purchase_ts - windowMinutes,
    * purchase_ts). `clicks` and `purchases` need (user_id, event_id,
    * ts) columns; `delay` is the allowed out-of-orderness (the
    * watermark, which also bounds the join state horizon). */
  def attribute(clicks: DataFrame, purchases: DataFrame,
      windowMinutes: Int = 60, delay: String = "2 hours"): DataFrame = {
    val c = clicks
      .withWatermark("ts", delay)
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    val p = purchases
      .withWatermark("ts", delay)
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
    p.join(c,
      col("p_user") === col("c_user") &&
        col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $windowMinutes MINUTES") &&
        col("click_ts") < col("purchase_ts"))
      .select(col("p_user").as("user_id"), col("purchase_id"),
        col("purchase_ts"), col("click_id"), col("click_ts"))
  }
}
