package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication — the ingest-time face of the batch
  * content-hash dedup (operators/Dedup.q20): documents dedupe as they
  * ARRIVE instead of by re-scanning the corpus, which is how a
  * training-data pipeline actually consumes a crawl feed.
  *
  * Spark-first: `dropDuplicatesWithinWatermark` is the built-in keyed
  * dedup state with event-time TTL — first occurrence of a content
  * hash passes, later arrivals drop, and state for hashes older than
  * the watermark delay is reclaimed, so state size is bounded by the
  * dedup horizon (unbounded-history dedup belongs to the batch pass;
  * the two compose: stream-dedup the firehose, batch-dedup the
  * corpus).
  */
object StreamDedup {

  /** Content-hash dedup over a streaming document frame with columns
    * (doc_id, text, ts). Emits first-seen documents with their hash. */
  def dedupStream(docs: DataFrame, horizon: String = "1 hour"): DataFrame =
    docs
      .withColumn("text_hash", sha2(col("text"), 256))
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("text_hash")
}
