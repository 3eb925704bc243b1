package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import Exprs._

/** End-to-end training-data pipeline operators: deterministic dataset
  * splitting and the full dedup pass (exact + near-dup with cluster
  * representatives) that produces the kept corpus.
  */
object Pipeline {

  /** Knuth multiplicative hash: (id mod 2^32) * 2654435761 mod 2^32,
    * computed via a 16-bit split so no intermediate exceeds ~2^48 —
    * the naive product overflows Long for id > ~3.46e9, which THROWS
    * under ANSI mode, and ids of that magnitude are expected at
    * 100 TB. Equal to the naive formula for id < 2^32 (what the
    * same-formula oracles rely on at test scale); defined — the hash
    * of the low 32 bits — above it. Pure integer arithmetic, so any
    * engine assigns identical values (no RNG, no engine hash fn). */
  def knuth32(id: Column): Column = Exprs.mulMod32(id, 2654435761L)

  /** Engine-neutral deterministic hash split on the id: any engine
    * assigns identical splits. Thresholds: 80/10/10. */
  def splitCol(id: Column): Column = {
    val h = knuth32(id) % 100
    when(h < 80, "train").when(h < 90, "validation").otherwise("test")
  }

  /** Split assignment + per-(split, lang) stratification stats. */
  def q40HashSplit(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir)
      .withColumn("split", splitCol(col("doc_id")))
      .groupBy(col("split"), col("lang"))
      .agg(
        count(lit(1)).as("docs"),
        sum(col("n_chars")).as("chars"),
        min(col("doc_id")).as("min_doc_id"))
  }

  /** Min-label propagation with pointer jumping over undirected edges,
    * run to FIXPOINT. Each round: (1) take the min over own +
    * neighbors' labels (one hop), then (2) short-circuit
    * rep -> rep(rep) (pointer jump), which doubles the effective
    * propagation distance — components of diameter d close in
    * ~log2(d) rounds. The loop stops when a round changes zero labels
    * (one cheap count per round on a checkpointed frame), so
    * adversarially long near-dup chains can never silently split a
    * cluster; `maxRounds` is a runaway backstop, not a tuning knob
    * (64 rounds covers diameter 2^64). Rounds are materialized via
    * localCheckpoint so the plan stays flat instead of growing 3^r
    * self-references — the standard Spark iterative-algorithm shape
    * (a durable checkpoint dir replaces localCheckpoint on a real
    * cluster where executor loss matters).
    *
    * Round hygiene (the q53 discipline): once round i's checkpoint
    * lands, round i-1's blocks are released and every shuffle this
    * function created is provably dead — both are reclaimed ON THE
    * SPOT (Bridge.releaseCheckpoints / removeShuffles) instead of
    * lingering until a driver GC; over ~log2(d) rounds on a 100 TB
    * edge set that's the difference between one round's working set
    * and the whole history on disk.
    *
    * `initial`: (doc_id, rep) starting labels. `edges`: (src, dst)
    * pairs, treated as undirected. Returns a checkpointed frame the
    * caller releases when done. */
  def labelPropagate(initial: DataFrame, edges: DataFrame, maxRounds: Int = 64): DataFrame = {
    import org.apache.spark.sql.graftbridge.Bridge
    val session = initial.sparkSession
    val baseline = Bridge.shuffleIds(session)
    val undirected = edges
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint() // edge derivation (e.g. minhash) runs once, not per round
    var labels = initial.localCheckpoint()
    // fixpoint detector: every label only ever DECREASES, so the rep
    // sum strictly decreases until convergence — one shuffle-free
    // global agg per round instead of a self-join diff (decimal(38,0)
    // so petabyte-scale id sums can't overflow under ANSI)
    def repSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("rep").cast("decimal(38,0)"))).collect()(0)
        .getDecimal(0)
    var prevSum = repSum(labels)
    var i = 0
    var changed = true
    while (changed && i < maxRounds) {
      val neighborMin = undirected.join(labels.withColumnRenamed("doc_id", "dst"), "dst")
        .groupBy(col("src").as("doc_id"))
        .agg(min(col("rep")).as("neighbor_rep"))
      val hop = labels.join(neighborMin, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("rep"), coalesce(col("neighbor_rep"), col("rep"))).as("rep"))
      val jump = hop.as("l")
        .join(hop.select(col("doc_id").as("r_id"), col("rep").as("r_rep")).as("r"),
          col("l.rep") === col("r.r_id"), "left")
        .select(col("l.doc_id").as("doc_id"),
          least(col("l.rep"), coalesce(col("r.r_rep"), col("l.rep"))).as("rep"))
      val next = jump.localCheckpoint()
      val nextSum = repSum(next)
      changed = nextSum.compareTo(prevSum) != 0
      prevSum = nextSum
      // round i is materialized: release round i-1's blocks and delete
      // every shuffle this function has created — labels/undirected are
      // checkpoint storage, so nothing since `baseline` is reachable
      Bridge.releaseCheckpoints(labels)
      Bridge.sweepShuffles(session, Bridge.shuffleIds(session) -- baseline)
      labels = next
      i += 1
    }
    Bridge.releaseCheckpoints(undirected)
    labels
  }

  /** Full dedup pass: exact dups collapse by content hash; near-dup
    * pairs (minhash, J >= 0.5) collapse to their cluster's minimum
    * doc_id via min-label propagation with pointer jumping run to
    * fixpoint (see labelPropagate) — chains of any length collapse to
    * one cluster, in ~log2(diameter) rounds. Output: one row per doc
    * with its representative and kept flag — the projection
    * `filter(kept)` IS the deduplicated corpus. */
  def dedupCorpus(spark: SparkSession, dir: String, maxRounds: Int = 64): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    // exact: representative = min doc_id of identical text
    val exactRep = docs
      .groupBy(sha2(col("text"), 256).as("h"))
      .agg(min(col("doc_id")).as("exact_rep"), collect_list(col("doc_id")).as("members"))
      .select(explode(col("members")).as("doc_id"), col("exact_rep"))
    // near-dup edges between exact representatives
    val pairs = Dedup.q21DedupMinhash(spark, dir)
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    val labels = labelPropagate(
      exactRep.select(col("doc_id"), col("exact_rep").as("rep")), pairs, maxRounds)
    labels.withColumn("kept", col("rep") === col("doc_id"))
  }

  /** Deterministic stratified sampling — the data-mixing op of a
    * training pipeline (per-source/per-language up/down-weighting into
    * a target mix). Same engine-neutral multiplicative hash as q40, so
    * any engine reproduces the identical sample: no RNG, no seed
    * shipping, and re-runs are idempotent (a doc's fate depends only
    * on its id). Per-stratum keep thresholds are integer per-mille
    * values — no float-rate arithmetic to diverge between engines.
    * One scan, map-side combinable aggregate: scan-speed at any scale. */
  def q43StratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    val permille = when(col("lang") === "en", 500)
      .when(col("lang") === "de", 350)
      .when(col("lang") === "fr", 250)
      .when(col("lang") === "es", 200)
      .otherwise(100)
    val h = knuth32(col("doc_id")) % 1000
    Tables.documents(spark, dir)
      .withColumn("kept", h < permille)
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("docs"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("kept_docs"),
        sum(when(col("kept"), col("n_chars"))).as("kept_chars"),
        min(when(col("kept"), col("doc_id"))).as("min_kept_doc_id"))
      .withColumn("achieved_rate",
        col("kept_docs").cast("double") / col("docs"))
  }

  /** Benchmark-contamination check: which corpus docs share word
    * 8-grams with a benchmark set (decontaminating training data
    * against eval benchmarks). 8-grams, not trigrams, are the
    * published practice (GPT-3 decontaminated on 13-grams, PaLM on
    * 8-grams) and the scale property follows directly: short n-grams
    * match almost everything (a trigram formulation on this corpus
    * produced ~200x the join volume for zero extra signal), long
    * n-grams are near-unique outside true overlap. Postings-join
    * formulation: the benchmark postings table (small by nature —
    * benchmarks are thousands of docs, not billions) broadcasts, the
    * corpus streams past it once, and the corpus×benchmark matrix
    * never forms. The broadcast decision is deliberately left to AQE's
    * runtime size measurement rather than a hint: a real benchmark
    * side broadcasts because it IS small, while an over-threshold side
    * degrades gracefully to a shuffle join instead of a guaranteed
    * executor OOM — a forced hint overrides the size check and turns
    * "benchmarks are small by contract" into a scale hazard the moment
    * the contract is violated. Benchmark stand-in here:
    * doc_id % 10 == 0. */
  def q44Contamination(spark: SparkSession, dir: String): DataFrame = {
    // hashed 8-grams, not strings: same distinct-count structure
    // (collisions ~|ng|^2/2^64 — negligible), no string building, and
    // the shuffled postings rows carry 8 bytes instead of ~50-char
    // n-gram strings — shuffle volume is the scale cost here
    val post = Tables.parallelized(Tables.documents(spark, dir), col("doc_id"))
      .select(col("doc_id"), explode(Dedup.ngramHash(8)).as("ng"))
    val bench = post.filter(col("doc_id") % 10 === 0)
      .select(col("ng"), col("doc_id").as("bdoc"))
    post.filter(col("doc_id") % 10 =!= 0)
      .join(bench, "ng")
      .groupBy(col("doc_id"))
      .agg(
        countDistinct(col("ng")).as("shared_ngrams"),
        countDistinct(col("bdoc")).as("benchmark_docs"))
  }

  /** Balanced fixed-size sampling: exactly k docs per stratum,
    * deterministically — rank every doc by the engine-neutral mix32
    * hash of its id and keep the k smallest per language. This is the
    * "bottom-k by hash" sample: uniform (the hash is the randomness),
    * reproducible across engines and re-runs (no RNG, no seed
    * shipping), and stable under corpus growth (a doc's rank only
    * moves if smaller-hash docs arrive — the sample is consistent,
    * like consistent hashing). Complements q43's rate-based
    * stratified sample when the mix needs exact per-stratum COUNTS.
    *
    * Scale shape: TopKAgg (map-side combinable O(k) buffers), not a
    * window sort — the shuffle carries k rows per stratum per
    * partition, never the corpus. */
  def q52BalancedSample(spark: SparkSession, dir: String): DataFrame = {
    val k = 50
    val topk = udaf(new graft.functions.TopKAgg[(Long, Long)](k, Ordering[(Long, Long)]))
    Tables.documents(spark, dir)
      .withColumn("hv", Exprs.mix32(col("doc_id")))
      .groupBy(col("lang"))
      .agg(topk(col("hv"), col("doc_id")).as("sample"))
      .select(col("lang"), posexplode(col("sample")).as(Seq("pos", "s")))
      .select(col("lang"), col("s._2").as("doc_id"), col("s._1").as("hv"),
        (col("pos") + 1).cast("int").as("rank"))
  }

  /** Sequence packing — the concat-and-chunk step that turns a
    * document corpus into fixed-length training sequences (every LLM
    * pretraining pipeline ends with this): documents are laid
    * end-to-end in a deterministic order and cut every `seqLen`
    * tokens; a document belongs to the chunk its first token lands
    * in, and `boundary_docs` counts docs that straddle a cut (the
    * attention-masking overhead of packed training).
    *
    * Scale shape: the corpus is SHARDED by an engine-neutral hash and
    * packed independently per shard — the running token offset is a
    * window sum partitioned by shard, so the prefix-sum parallelizes
    * across shards instead of serializing on one global ordering (a
    * single unpartitioned ORDER BY is the classic scale antipattern
    * here; real pipelines pack per output shard anyway). All
    * arithmetic is integer → exact, order-free, engine-reproducible. */
  def q49SequencePack(spark: SparkSession, dir: String): DataFrame = {
    val seqLen = 512L
    val nShards = 8
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("doc_id"))
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        (knuth32(col("doc_id")) % nShards).as("shard"))
      .withColumn("end_tok", sum(col("n_tokens")).over(w))
      .withColumn("start_tok", col("end_tok") - col("n_tokens"))
      .withColumn("chunk", expr(s"start_tok div $seqLen"))
      .groupBy(col("shard"), col("chunk"))
      .agg(
        count(lit(1)).as("docs"),
        sum(col("n_tokens")).as("tokens"),
        min(col("doc_id")).as("first_doc"),
        sum(when(col("end_tok") > (col("chunk") + 1) * seqLen, 1L).otherwise(0L))
          .as("boundary_docs"))
  }

  /** Summary for the gate: corpus size, kept docs, dup docs removed. */
  def q41DedupPipeline(spark: SparkSession, dir: String): DataFrame =
    dedupCorpus(spark, dir)
      .agg(
        count(lit(1)).as("docs"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("kept_docs"),
        sum(when(!col("kept"), 1L).otherwise(0L)).as("removed_docs"),
        countDistinct(col("rep")).as("clusters"))

  /** q75: document chunking — split each document into fixed-size
    * overlapping token windows (64-token chunks, 16-token overlap →
    * stride 48), the segmentation step in front of embedding /
    * retrieval indexing. Emits (chunk_idx, start_tok, chunk_toks,
    * chunk_text) per chunk; a short doc is one whole chunk.
    *
    * Scale shape: pure per-row expressions — one tokenize, one
    * chunk-start sequence, one posexplode; ZERO shuffles (plan-
    * guarded no-Exchange, like q46/q47). The output is ~n_tokens/48
    * rows per doc, produced streaming through the scan. */
  def q75Chunking(spark: SparkSession, dir: String): DataFrame =
    chunkDocs(Tables.documents(spark, dir), chunkSize = 64, stride = 48)

  /** Library form of q75: chunk any (doc_id, text) frame. */
  def chunkDocs(df: DataFrame, chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize >= 1 && stride >= 1 && stride <= chunkSize,
      "need 1 <= stride <= chunkSize (overlap = chunkSize - stride)")
    df
      .withColumn("w", split(col("text"), " "))
      .withColumn("n", size(col("w")).cast("long"))
      .withColumn("n_chunks",
        when(col("n") <= chunkSize, lit(1L))
          .otherwise(lit(1L) +
            expr(s"(n - $chunkSize + ${stride - 1}) div $stride")))
      .select(col("doc_id"), col("w"), col("n"),
        posexplode(expr(s"sequence(0L, (n_chunks - 1) * $stride, $stride)"))
          .as(Seq("chunk_idx", "start_tok")))
      .select(
        col("doc_id"),
        col("chunk_idx").cast("long").as("chunk_idx"),
        col("start_tok"),
        least(lit(chunkSize.toLong), col("n") - col("start_tok"))
          .as("chunk_toks"),
        array_join(expr(
          s"slice(w, start_tok + 1, least($chunkSize, n - start_tok))"), " ")
          .as("chunk_text"))
  }

  /** q74: quality-weighted corpus subsetting to a token budget — the
    * data-mixing step of training-set assembly: keep the best
    * documents, in a deterministic unbiased order, until the target
    * token count (60% of the corpus here) is reached.
    *
    * Global order = (quality tier DESC, mix32(doc_id), doc_id): tier
    * from the q27 quality score (floor(score*10) — integer, engine-
    * exact because the score itself is oracle-exact), hash order
    * within a tier so the cut is unbiased, doc_id breaking hash ties.
    *
    * Scale shape — the cumulative token position comes from a SHARDED
    * prefix sum, not a global sort (the q49 machinery upgraded with
    * cross-shard offsets): shard = (tier, hv div 2^26) is a PREFIX of
    * the global order, so per-shard windows + broadcast cumulative
    * shard offsets reproduce the exact global running total with
    * ≤ 11×64 metadata rows on the driver-side window and the corpus
    * only ever shuffled by shard. The budget is one broadcast scalar.
    * Docs are emitted iff they START inside the budget; the boundary
    * doc is flagged partial (truncate or keep whole downstream). */
  def q74TokenBudget(spark: SparkSession, dir: String): DataFrame =
    tokenBudget(
      TextAnalysis.q27QualityScore(spark, dir)
        .select(col("doc_id"), col("n_words").cast("long").as("n_tokens"),
          floor(col("quality_score") * 10).cast("long").as("tier")),
      budgetNum = 6, budgetDen = 10)

  /** Library form of q74: subset any (doc_id, n_tokens, tier) frame to
    * budgetNum/budgetDen of its total tokens, in (tier DESC, mix32,
    * doc_id) order, via the sharded prefix sum. */
  def tokenBudget(scored: DataFrame, budgetNum: Int, budgetDen: Int)
      : DataFrame = {
    require(budgetNum >= 0 && budgetDen > 0, "budget must be a valid fraction")
    val subshardDiv = 67108864L // 2^26 → 64 subshards over the 32-bit hash
    val base = scored
      .withColumn("hv", Exprs.mix32(col("doc_id")))
      .withColumn("subshard", expr(s"hv div $subshardDiv"))
    val totals = base.groupBy(col("tier"), col("subshard"))
      .agg(sum(col("n_tokens")).as("shard_toks"))
    // offsets: cumulative shard totals in global order — a window over
    // the ≤ tiers×subshards metadata frame, never over the corpus
    val wOff = org.apache.spark.sql.expressions.Window
      .orderBy(col("tier").desc, col("subshard").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets = totals
      .withColumn("off", coalesce(sum(col("shard_toks")).over(wOff), lit(0L)))
      .select(col("tier"), col("subshard"), col("off"))
    val budget = totals.agg(
      expr(s"(sum(shard_toks) * $budgetNum) div $budgetDen").as("budget_toks"))
    val wIn = org.apache.spark.sql.expressions.Window
      .partitionBy(col("tier"), col("subshard"))
      .orderBy(col("hv").asc, col("doc_id").asc)
    base
      .join(broadcast(offsets), Seq("tier", "subshard"))
      .crossJoin(broadcast(budget))
      .withColumn("start_tok",
        col("off") + sum(col("n_tokens")).over(wIn) - col("n_tokens"))
      .filter(col("start_tok") < col("budget_toks"))
      .select(col("doc_id"), col("tier"), col("n_tokens"), col("start_tok"),
        (col("start_tok") + col("n_tokens") > col("budget_toks")).as("partial"))
  }

  /** q92: mixture REALIZATION — execute q76's rebalancing weights as a
    * deterministic resampling plan and report what the rebalanced
    * corpus actually looks like. Each document is replicated
    * weight_pct div 100 times plus one more when mix32(doc_id) mod 100
    * falls under the fractional remainder — the deterministic
    * per-document Bernoulli that realizes a fractional up-sampling
    * weight exactly in expectation with NO RNG (the q40/q43 split
    * discipline applied to repetition counts). Per-domain readout:
    * input docs/tokens, realized docs/tokens, and the realized token
    * share in ppm — the "did the rebalance land where the weights
    * said" check against q76's uniform target.
    *
    * Scale shape: the weights frame is |domains| rows (broadcast); the
    * corpus is scanned ONCE (per-doc token counts + copies as pure
    * row expressions) into one map-side-combinable groupBy(domain);
    * realized share divides by a 1-row broadcast total. Nothing is
    * ever materialized `copies` times — the plan outputs counts, and a
    * writer realizing the physical copies would explode AFTER this
    * accounting (sequence(1, copies) per row, linear in output).
    * All-integer → oracle-exact. */
  def q92MixtureSample(spark: SparkSession, dir: String): DataFrame = {
    val weights = graft.operators.TextAnalysis.q76MixtureReport(spark, dir)
      .select(col("lang"), col("source"), col("uniform_weight_pct"))
    val perDoc = Tables.parallelized(Tables.documents(spark, dir), col("doc_id"))
      .select(col("doc_id"), col("lang"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .join(broadcast(weights), Seq("lang", "source"))
      .withColumn("copies",
        expr("uniform_weight_pct div 100") +
          when(pmod(mix32(col("doc_id")), lit(100)) < col("uniform_weight_pct") % 100, 1L)
            .otherwise(0L))
    val perDomain = perDoc.groupBy(col("lang"), col("source"))
      .agg(
        first(col("uniform_weight_pct")).as("weight_pct"),
        count(lit(1)).as("docs_in"),
        sum(col("n_tokens")).as("tokens_in"),
        sum(col("copies")).as("docs_out"),
        sum(col("copies") * col("n_tokens")).as("tokens_out"))
    val total = perDomain.agg(sum(col("tokens_out")).as("total_out"))
    perDomain.crossJoin(broadcast(total))
      .select(col("lang"), col("source"), col("weight_pct"),
        col("docs_in"), col("docs_out"), col("tokens_in"), col("tokens_out"),
        expr("tokens_out * 1000000 div total_out").as("realized_ppm"))
  }

  /** q94: training-SHARD assignment + manifest — the last pipeline
    * step before a training run: lay the quality-ordered corpus out
    * into fixed-token-budget shards and emit the per-shard manifest a
    * data loader consumes (doc count, token count, tier range, global
    * token offset). Order is q74's curriculum order (tier DESC — best
    * docs first — then mix32 shuffle within tier); a document belongs
    * to the shard where its global token offset starts (docs are never
    * split — `spans` marks how many boundaries a doc crosses).
    *
    * Scale shape: identical to q74/q49 — the ONLY window over corpus
    * rows is keyed by (tier, subshard) (bounded partitions, no global
    * sort); global offsets come from a broadcast ≤ tiers×64-row
    * metadata frame; the manifest is one map-side-combinable
    * groupBy(shard_id). Output is |corpus_tokens| / shard size rows —
    * metadata-sized from a corpus-sized input. All-integer →
    * oracle-exact. */
  def q94ShardManifest(spark: SparkSession, dir: String): DataFrame = {
    val shardToks = 20000L
    val subshardDiv = 67108864L // 2^26 → 64 subshards over the 32-bit hash
    val base = TextAnalysis.q27QualityScore(spark, dir)
      .select(col("doc_id"), col("n_words").cast("long").as("n_tokens"),
        floor(col("quality_score") * 10).cast("long").as("tier"))
      .withColumn("hv", Exprs.mix32(col("doc_id")))
      .withColumn("subshard", expr(s"hv div $subshardDiv"))
    val totals = base.groupBy(col("tier"), col("subshard"))
      .agg(sum(col("n_tokens")).as("shard_toks"))
    val wOff = org.apache.spark.sql.expressions.Window
      .orderBy(col("tier").desc, col("subshard").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets = totals
      .withColumn("off", coalesce(sum(col("shard_toks")).over(wOff), lit(0L)))
      .select(col("tier"), col("subshard"), col("off"))
    val wIn = org.apache.spark.sql.expressions.Window
      .partitionBy(col("tier"), col("subshard"))
      .orderBy(col("hv").asc, col("doc_id").asc)
    base
      .join(broadcast(offsets), Seq("tier", "subshard"))
      .withColumn("start_tok",
        col("off") + sum(col("n_tokens")).over(wIn) - col("n_tokens"))
      .withColumn("shard_id", expr(s"start_tok div $shardToks"))
      .groupBy(col("shard_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        min(col("tier")).as("min_tier"),
        max(col("tier")).as("max_tier"),
        min(col("start_tok")).as("start_tok"),
        sum(when(
          expr(s"(start_tok + n_tokens - 1) div $shardToks") > col("shard_id"),
          1L).otherwise(0L)).as("spans"))
  }
}
