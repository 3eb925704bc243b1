package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Dedup

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

  /** Streaming NEAR-dup detection — the ingest-time face of the batch
    * minhash LSH (operators/Dedup.q21): each arriving doc computes its
    * 32-band minhash signature (same codegen kernel as batch), bands
    * explode to packed single-long claim rows (band id in the low 6
    * bits — see inline note), and `dropDuplicatesWithinWatermark`
    * keyed on the claim keeps only FIRST claimers — a doc that
    * shares any band with an earlier doc inside the horizon loses that
    * band. A per-doc windowed count then closes at the watermark:
    * fresh_bands < bands means some band was already claimed, i.e. the
    * doc is a near-dup CANDIDATE (J >= ~0.8 collides w.h.p. at 32x4).
    *
    * Contract notes, deliberate:
    *  - candidate-level, like q21's band join: ingest flags, the batch
    *    pass (q21/q41) does exact Jaccard verification — streaming has
    *    no second look at the earlier doc's shingles;
    *  - two near-identical docs in ONE micro-batch may split their
    *    bands and BOTH flag — conservative over-flagging, never a miss;
    *  - docs under 3 words have no shingles, hence no near-dup
    *    definition: they are absent from the output (route them
    *    through `dedupStream` for exact dedup instead);
    *  - state is bounded by the horizon on both operators (band claims
    *    and open windows), the property that makes this runnable
    *    against a firehose.
    * Output (append at watermark): doc_id, win, fresh_bands,
    * is_near_dup. */
  def nearDedupStream(docs: DataFrame, horizon: String = "1 hour",
      nPerm: Int = 128, bands: Int = 32): DataFrame = {
    // the packed claim reserves 6 low bits for the band id with tag 63
    // for presence rows: a band count past 62 would collide with the
    // tag (63) or overflow into hash bits (64+), silently mis-keying
    // dedup state — fail loudly instead (ADVICE r12)
    require(bands > 0 && bands < 63,
      s"nearDedupStream supports 1..62 bands (6-bit claim tag, 63 " +
      s"reserved for presence rows); got $bands")
    import org.apache.spark.sql.graftbridge.Bridge.{column => exprCol, expression}
    val bandHashes = exprCol(graft.functions.MinhashBandHashes(
      expression(col("tri")), nPerm, bands))
    val base = docs
      .withColumn("tri", Dedup.triHash)
      // empty signatures are all-identical: without this filter every
      // short doc collides in every band (same guard as batch q21)
      .filter(size(col("tri")) > 0)
    // claim = (band hash << 6) | band id, ONE long instead of the
    // (band int, hash long) pair — the dedup state key is the claim,
    // so packing shrinks every retained state row (r12, VERDICT watch
    // item: 1.24 GB of band-claim state at sf10). Distinctness: bands
    // occupy the low 6 bits (0..31, presence tag 63), the hash keeps
    // its low 58 bits — two DIFFERENT hashes colliding in one claim
    // needs a 58-bit collision among the horizon's claims (~2^-58 per
    // pair; ~1e-6 cumulative at a 1.2M-claim horizon), the same class
    // of risk the 64-bit band hash itself already carries. Flag
    // semantics verified identical on the committed corpora
    // (StreamNearDedupSpec + the sf1/sf10 record re-takes).
    val bandRows = base.select(col("doc_id"), col("ts"),
      posexplode(bandHashes).as(Seq("band", "bh")))
      .select(col("doc_id"), col("ts"),
        shiftleft(col("bh"), 6).bitwiseOR(col("band")).as("claim"))
    // one presence row per doc under a doc-unique claim (tag 63,
    // disjoint from every band id): it always survives the dedup, so a
    // doc whose EVERY band is claimed still reaches the aggregate and
    // reports fresh_bands = 0 instead of silently vanishing
    val presence = base.select(col("doc_id"), col("ts"),
      shiftleft(col("doc_id"), 6).bitwiseOR(lit(63)).as("claim"))
    bandRows.unionByName(presence)
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("claim")
      .groupBy(window(col("ts"), "1 minute").as("win"), col("doc_id"))
      .agg((count(lit(1)) - 1).as("fresh_bands"))
      .select(col("doc_id"), col("win"), col("fresh_bands"),
        (col("fresh_bands") < bands).as("is_near_dup"))
  }
}
