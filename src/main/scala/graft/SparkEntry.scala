package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * Every entry in `queries` has a same-named, same-aliased DuckDB SQL
  * in `oracleSql` unless the op is not SQL-expressible (then the driver
  * records a rows-only check and the ScalaTest spec carries the oracle).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q02StarJoin(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_agg_filter"    -> Relational.q01AggFilter _,
    "q02_star_join"     -> Relational.q02StarJoin _,
    "q03_topn_order"    -> Relational.q03TopNOrders _,
    "q04_window_topn"   -> Relational.q04TopNAgg _,
    "q05_distinct_agg"  -> Relational.q05DistinctAgg _,
    "q06_sessionize"    -> Relational.q06Sessionize _,
    "q07_trending"      -> Relational.q07Trending _,
    "q08_url_normalize" -> Relational.q08UrlNormalize _,
    "q09_explode_conf"  -> Analytics.q09ExplodeConf _,
    "q10_dynamic_cube"  -> Cube.q10DynamicCube _,
    "q11_pivot"         -> Analytics.q11Pivot _,
    "q12_calendar_window" -> Analytics.q12CalendarWindow _,
    "q13_date_intervals"  -> Analytics.q13DateIntervals _,
    "q14_threshold_monitor" -> Analytics.q14ThresholdMonitor _,
    "q15_bin_histogram" -> Analytics.q15BinHistogram _,
    "q16_num_format"    -> Analytics.q16NumFormat _,
    "q17_cosine_topk"   -> Similarity.q17CosineTopK _,
    "q18_weighted_recs" -> Similarity.q18WeightedRecs _,
    "q19_feature_matrix" -> Similarity.q19FeatureMatrix _,
    "q20_dedup_exact"   -> Dedup.q20DedupExact _,
    "q21_dedup_minhash" -> Dedup.q21DedupMinhash _,
    "q22_dedup_simhash" -> Dedup.q22DedupSimhash _,
    "q23_ngram_jaccard" -> Dedup.q23NgramJaccard _,
    "q24_ann_bruteforce" -> Ann.q24AnnBruteforce _,
    "q25_ann_lsh"       -> Ann.q25AnnLsh _,
    "q26_lang_id"       -> TextAnalysis.q26LangId _,
    "q27_quality_score" -> TextAnalysis.q27QualityScore _,
    "q28_token_count"   -> TextAnalysis.q28TokenCount _,
    "q29_fingerprint"   -> Dedup.q29Fingerprint _,
    "q30_dedup_embedding" -> Ann.q30DedupEmbedding _,
    "q31_multimodal_features" -> Multimodal.q31MultimodalFeatures _,
    "q32_kmeans"              -> Clustering.q32Kmeans _,
    "q33_json_extract"        -> SemiStructured.q33JsonExtract _,
    "q34_timezone"            -> SemiStructured.q34Timezone _,
    "q35_percentiles"         -> Analytics.q35Percentiles _,
    "q36_rollup"              -> Olap.q36Rollup _,
    "q37_running_window"      -> Olap.q37RunningWindow _,
    "q38_asof_join"           -> Olap.q38AsofJoin _,
    "q39_range_join"          -> Olap.q39RangeJoin _,
    "q40_hash_split"          -> Pipeline.q40HashSplit _,
    "q41_dedup_pipeline"      -> Pipeline.q41DedupPipeline _,
    "q42_approx_distinct"     -> Analytics.q42ApproxDistinct _,
    "q43_stratified_sample"   -> Pipeline.q43StratifiedSample _,
    "q44_contamination"       -> Pipeline.q44Contamination _,
    "q45_ann_ivf"             -> Ann.q45AnnIvf _,
    "q46_pii_redact"          -> TextAnalysis.q46PiiRedact _,
    "q47_repetition"          -> TextAnalysis.q47Repetition _,
    "q48_heavy_hitters"       -> Analytics.q48HeavyHitters _,
    "q49_sequence_pack"       -> Pipeline.q49SequencePack _,
    "q50_zorder"              -> Olap.q50Zorder _,
    "q51_kmv_distinct"        -> Analytics.q51KmvDistinct _,
    "q52_balanced_sample"     -> Pipeline.q52BalancedSample _,
    "q53_pagerank"            -> Graph.q53Pagerank _,
    "q54_tfidf"               -> Similarity.q54TfidfTopTerms _,
    "q55_funnel"              -> Analytics.q55Funnel _,
    "q56_retention"           -> Analytics.q56Retention _,
    "q57_vocab"               -> TextAnalysis.q57Vocab _,
    "q58_cdc_merge"           -> Cdc.q58CdcMerge _,
    "q59_scd2"                -> Cdc.q59Scd2 _,
    "q60_transitions"         -> Analytics.q60Transitions _,
    "q61_anomaly"             -> Analytics.q61Anomaly _,
    "q62_bloom_prune"         -> BloomJoin.q62BloomPrune _,
    "q63_boilerplate"         -> Dedup.q63Boilerplate _,
    "q64_countmin"            -> Sketches.q64Countmin _,
    "q65_session_paths"       -> Behavior.q65SessionPaths _,
    "q66_gap_fill"            -> TimeSeries.q66GapFill _,
    "q67_correlation"         -> Stats.q67Correlation _,
    "q68_experiment"          -> Stats.q68Experiment _,
    "q69_pacing"              -> Monitor.q69Pacing _,
    "q70_refresh_select"      -> Monitor.q70RefreshSelect _,
    "q71_rfm"                 -> Behavior.q71Rfm _,
    "q72_corpus_rarity"       -> TextAnalysis.q72CorpusRarity _,
    "q73_incremental_dedup"   -> Dedup.q73IncrementalDedup _,
    "q74_token_budget"        -> Pipeline.q74TokenBudget _,
    "q75_chunking"            -> Pipeline.q75Chunking _,
    "q76_mixture_report"      -> TextAnalysis.q76MixtureReport _,
    "q77_incremental_rollup"  -> Olap.q77IncrementalRollup _,
    "q78_session_funnel"      -> Analytics.q78SessionFunnel _,
    "q79_containment"         -> Dedup.q79Containment _,
    "q80_tokenize"            -> TextAnalysis.q80TokenizeVocab _,
    "q81_chisq_drift"         -> Stats.q81ChisqDrift _,
    "q82_pq_ann"              -> Ann.q82Pq _,
    "q83_dup_span"            -> Dedup.q83DupSpan _,
    "q84_embed_stats"         -> Stats.q84EmbedStats _,
    "q85_snapshot_diff"       -> Cdc.q85SnapshotDiff _,
    "q86_bpe"                 -> TextAnalysis.q86Bpe _,
    "q87_triangles"           -> Graph.q87Triangles _,
    "q88_ivfpq_probe"         -> graft.sources.IvfIndex.q88IvfpqProbe _,
    "q89_bpe_apply"           -> TextAnalysis.q89BpeApply _,
    "q90_semantic_dedup"      -> Ann.q90SemanticDedup _,
    "q91_skew_profile"        -> Profiling.q91SkewProfile _,
    "q92_mixture_sample"      -> Pipeline.q92MixtureSample _,
    "q93_watermark_audit"     -> Profiling.q93WatermarkAudit _,
    "q94_shard_manifest"      -> Pipeline.q94ShardManifest _,
    "q95_ngram_novelty"       -> TextAnalysis.q95NgramNovelty _,
    "q96_pca_power"           -> Stats.q96PcaPower _,
    "q97_bm25"                -> Similarity.q97Bm25 _,
    "q98_bigram_lm"           -> TextAnalysis.q98BigramLm _,
    "q99_perceptron"          -> Learn.q99Perceptron _,
  )

  /** Integer squared distance between a quantized vector and a
    * centroid list (shared by the kmeans and IVF oracles). */
  private def qDist(c: String): String =
    s"list_sum(list_transform(range(1, 65), j -> (v.q[j]-$c.cq[j])*(v.q[j]-$c.cq[j])))"

  /** DuckDB replay of the deterministic quantized kmeans iterations
    * (operators/Clustering.kmeansQuantized): same floor(x*2^24)
    * quantization, same integer distances and argmin tie-break, same
    * floor-division centroid update (empty clusters carry over).
    * Yields CTE text (no WITH) ending in `c$iters(cluster, cq)`. */
  private def kmeansCtes(k: Int, iters: Int): String =
    kmeansCtes(k.toString, iters)

  /** As above with the cluster count as a SQL expression, so an oracle
    * can derive k from the corpus itself and stay valid at every scale
    * factor without overrides. NOTE: each round references its
    * predecessor twice (assignment + carry-over join), so this chain
    * is for oracles where it stands essentially alone (q32/q45/q82/
    * q88) — composed inside a larger WITH it inlines 2^iters plan
    * copies; use flatLloydCtes (single-reference rounds) there. */
  private def kmeansCtes(kSql: String, iters: Int): String = {
    def iterCte(i: Int): String = {
      val prev = s"c${i - 1}"
      s"""
      a$i AS (
        SELECT vec_id, q, cluster FROM (
          SELECT v.vec_id, v.q, c.cluster,
            ROW_NUMBER() OVER (PARTITION BY v.vec_id
              ORDER BY ${qDist("c")} ASC, c.cluster ASC) AS rn
          FROM v CROSS JOIN $prev c
        ) WHERE rn = 1
      ),
      s$i AS (
        SELECT cluster, j, SUM(q[j]) AS s, COUNT(*) AS cnt
        FROM a$i CROSS JOIN (SELECT unnest(range(1, 65)) AS j) dims
        GROUP BY 1, 2
      ),
      n$i AS (
        -- FLOOR division to match Math.floorDiv: DuckDB's integer //
        -- truncates toward zero, so make the numerator exactly
        -- divisible first (subtract the floor-mod remainder)
        SELECT cluster,
          list((s - ((s % cnt + cnt) % cnt)) // cnt ORDER BY j) AS cq
        FROM s$i GROUP BY 1
      ),
      c$i AS (
        SELECT p.cluster AS cluster, COALESCE(x.cq, p.cq) AS cq
        FROM $prev p LEFT JOIN n$i x USING (cluster)
      )"""
    }
    s"""v AS (
        SELECT vec_id,
          list_transform(embedding,
            x -> CAST(floor(CAST(x AS DOUBLE) * 16777216.0) AS BIGINT)) AS q
        FROM embeddings
      ),
      c0 AS (
        SELECT rn - 1 AS cluster, q AS cq FROM (
          SELECT q, ROW_NUMBER() OVER (ORDER BY vec_id) AS rn FROM v
        ) WHERE rn <= ($kSql)
      ),${(1 to iters).map(iterCte).mkString(",")}"""
  }

  /** DuckDB replay of the deterministic TWO-LEVEL coarse quantizer
    * (operators/Clustering.twoLevelQuantizer — q90's cell carve):
    * level 1 trains k1 = ceil(sqrt(max(16, n/250))) supers with the
    * quantized Lloyd's recipe; level 2 trains ceil(n_c/tgt)
    * sub-centroids per super as a GROUPED Lloyd's chain (the argmin
    * joins on the super id instead of crossing the full codebook —
    * the same ~sqrt(k) work reduction the Spark side gets), with
    * identical first-k init by vec_id at both levels, integer argmin
    * tie-breaks, floor-division updates, and empty-cell carry-over.
    * Ends in `cellasg(vec_id, cell)`, cell = prefix-sum offset + sub.
    *
    * CTE DISCIPLINE — every round references its predecessor exactly
    * ONCE: the update computes new means AND the empty-cell carry-over
    * from one scored set (each (cluster, dim) group carries its own
    * old coordinate as `oj`), unlike kmeansCtes' two-reference rounds
    * (assignment + carry-over join). Two chained two-reference rounds
    * here would inline 2^iters × 2^iters plans — the flat-oracle
    * recipe, composed, exceeded the process file-handle budget before
    * it exceeded any CPU budget. Single-reference rounds keep the
    * inlined plan LINEAR in iters, no materialization hints needed,
    * at the cost of exploding the scored set (rows × codebook × dims)
    * instead of just the argmin rows — the committed form's replay is
    * ~n·sqrt(k)·64 rows per round, the same complexity as the engine.
    *
    * The chain trains over the full corpus unconditionally — q90's
    * regime gate silences its ASSIGNMENT with one count predicate at
    * the `cells` union instead of filtering this chain's source (a
    * filtered source re-plans its decorrelated count subquery at every
    * inlined reference: minutes of planner time on empty data). */
  /** One SINGLE-REFERENCE Lloyd's round (the CTE-discipline unit both
    * quantizer replays build from): score prev's codebook (rows =
    * every vector × the codebook entries it can reach), argmin by
    * window, then per (keys, dim): floor-div mean of the chosen rows,
    * or the carried old coordinate when none chose it. keys =
    * "cluster" (flat / level 1, reach = CROSS JOIN) or "super, sub"
    * (level 2, reach = equi-join on super). Referencing the
    * predecessor exactly once keeps the inlined DuckDB plan LINEAR in
    * iterations — the two-reference kmeansCtes recipe is fine standing
    * alone but inlines 2^iters plan copies when composed inside a
    * larger WITH (q90's gated oracle took minutes in the PLANNER at
    * 500 rows before this round replaced its flat branch). */
  private def singleRefLloydRound(out: String, keysIn: String,
      keys: String, join: String, tieCol: String): String = s"""
      $out AS (
        SELECT $keys, list(cq_j ORDER BY j) AS cq FROM (
          SELECT $keys, j,
            CASE WHEN SUM(ch) > 0
              THEN (SUM(qj) - ((SUM(qj) % SUM(ch) + SUM(ch)) % SUM(ch))) // SUM(ch)
              ELSE any_value(oj) END AS cq_j
          FROM (
            SELECT $keys, dims.j,
              CASE WHEN rn = 1 THEN 1 ELSE 0 END AS ch,
              CASE WHEN rn = 1 THEN q[dims.j] ELSE 0 END AS qj,
              cq[dims.j] AS oj
            FROM (
              SELECT $keysIn, c.cq, x.q,
                ROW_NUMBER() OVER (PARTITION BY x.vec_id
                  ORDER BY list_sum(list_transform(range(1, 65),
                    j -> (x.q[j]-c.cq[j])*(x.q[j]-c.cq[j]))) ASC,
                  $tieCol ASC) AS rn
              FROM $join
            ) sc CROSS JOIN (SELECT unnest(range(1, 65)) AS j) dims
          ) GROUP BY ALL
        ) GROUP BY ALL
      )"""

  /** Flat quantized-Lloyd's replay in single-reference rounds: trains
    * a `kSql`-sized codebook over the quantized-vector CTE `src`,
    * emitting `${prefix}0..${prefix}iters` — the composition-safe
    * equivalent of kmeansCtes' chain (bit-identical updates; the
    * carry-over lives inside each round instead of a second prev
    * reference). Ends at `$prefix$iters(cluster, cq)`. */
  private def flatLloydCtes(kSql: String, iters: Int, src: String,
      prefix: String): String = {
    val rounds = (1 to iters).map(i => singleRefLloydRound(s"$prefix$i",
      "c.cluster", "cluster", s"$src x CROSS JOIN $prefix${i - 1} c",
      "c.cluster")).mkString(",")
    s"""${prefix}0 AS (
        SELECT rn - 1 AS cluster, q AS cq FROM (
          SELECT q, ROW_NUMBER() OVER (ORDER BY vec_id) AS rn FROM $src
        ) WHERE rn <= ($kSql)
      ),$rounds"""
  }

  private def twoLevelCtes(iters: Int): String = {
    val k1Sql = """SELECT CASE WHEN t * t >= k THEN t ELSE t + 1 END FROM (
          SELECT GREATEST(16, COUNT(*) // 250) AS k,
            CAST(floor(sqrt(CAST(GREATEST(16, COUNT(*) // 250) AS DOUBLE))) AS BIGINT) AS t
          FROM v)"""
    def round(out: String, keysIn: String, keys: String, join: String,
        tieCol: String): String =
      singleRefLloydRound(out, keysIn, keys, join, tieCol)
    def l1Round(i: Int): String = round(s"l$i",
      "c.cluster", "cluster", s"v x CROSS JOIN l${i - 1} c", "c.cluster")
    def l2Round(i: Int): String = round(s"d$i",
      "c.super, c.sub", "super, sub",
      s"sv x JOIN d${i - 1} c ON c.super = x.super", "c.sub")
    s"""v AS (
        SELECT vec_id,
          list_transform(embedding,
            x -> CAST(floor(CAST(x AS DOUBLE) * 16777216.0) AS BIGINT)) AS q
        FROM embeddings
      ),
      l0 AS (
        SELECT rn - 1 AS cluster, q AS cq FROM (
          SELECT q, ROW_NUMBER() OVER (ORDER BY vec_id) AS rn FROM v
        ) WHERE rn <= ($k1Sql)
      ),${(1 to iters).map(l1Round).mkString(",")},
      sasg AS (
        SELECT vec_id, cluster AS super FROM (
          SELECT v.vec_id, c.cluster,
            ROW_NUMBER() OVER (PARTITION BY v.vec_id
              ORDER BY ${qDist("c")} ASC, c.cluster ASC) AS rn
          FROM v CROSS JOIN l$iters c
        ) WHERE rn = 1
      ),
      sv AS (SELECT s.vec_id, s.super, v.q FROM sasg s JOIN v USING (vec_id)),
      tgtsel AS (
        SELECT GREATEST(1, LEAST(250, (COUNT(*) + 15) // 16)) AS tgt FROM v
      ),
      k2 AS (
        SELECT super,
          (COUNT(*) + (SELECT tgt FROM tgtsel) - 1)
            // (SELECT tgt FROM tgtsel) AS k2
        FROM sv GROUP BY 1
      ),
      d0 AS (
        SELECT x.super, x.rn - 1 AS sub, x.q AS cq FROM (
          SELECT super, q,
            ROW_NUMBER() OVER (PARTITION BY super ORDER BY vec_id) AS rn
          FROM sv
        ) x JOIN k2 ON x.super = k2.super
        WHERE x.rn <= k2.k2
      ),${(1 to iters).map(l2Round).mkString(",")},
      fa AS (
        SELECT vec_id, super, sub FROM (
          SELECT x.vec_id, x.super, d.sub,
            ROW_NUMBER() OVER (PARTITION BY x.vec_id
              ORDER BY list_sum(list_transform(range(1, 65),
                j -> (x.q[j]-d.cq[j])*(x.q[j]-d.cq[j]))) ASC, d.sub ASC) AS rn
          FROM sv x JOIN d$iters d ON d.super = x.super
        ) WHERE rn = 1
      ),
      off AS (
        SELECT super,
          CAST(SUM(k2) OVER (ORDER BY super ROWS UNBOUNDED PRECEDING) - k2
            AS BIGINT) AS off
        FROM k2
      ),
      cellasg AS (
        SELECT f.vec_id, o.off + f.sub AS cell
        FROM fa f JOIN off o USING (super)
      )"""
  }

  /** Exact int64 squared distance between two quantized SUBVECTORS
    * (dsub dims) — the per-subspace unit of the PQ oracle. */
  private def pqSdist(a: String, b: String, dsub: Int): String =
    s"list_sum(list_transform(range(1, ${dsub + 1}), j -> ($a[j]-$b[j])*($a[j]-$b[j])))"

  /** DuckDB replay of the deterministic PQ codebook training
    * (operators/Ann.pqCodebooks): the kmeansCtes recipe with a `sub`
    * dimension folded into every key, so all m subspaces train in one
    * CTE chain — same quantization, integer argmin tie-breaks, and
    * floor-division update. Ends in `pc$iters(sub, code, cq)` plus
    * `vs(vec_id, sub, sq)`. Set `defineV = false` when composing with
    * kmeansCtes in one WITH clause (it already defines the identical
    * quantized-vector CTE `v`). */
  private def pqCtes(m: Int, k: Int, iters: Int, defineV: Boolean = true): String = {
    val dsub = 64 / m
    def iterCte(i: Int): String = {
      val prev = s"pc${i - 1}"
      s"""
      pa$i AS (
        SELECT vec_id, sub, sq, code FROM (
          SELECT vs.vec_id, vs.sub, vs.sq, c.code,
            ROW_NUMBER() OVER (PARTITION BY vs.vec_id, vs.sub
              ORDER BY ${pqSdist("vs.sq", "c.cq", dsub)} ASC, c.code ASC) AS rn
          FROM vs JOIN $prev c ON vs.sub = c.sub
        ) WHERE rn = 1
      ),
      ps$i AS (
        SELECT sub, code, j, SUM(sq[j]) AS s, COUNT(*) AS cnt
        FROM pa$i CROSS JOIN (SELECT unnest(range(1, ${dsub + 1})) AS j) dims
        GROUP BY 1, 2, 3
      ),
      pn$i AS (
        SELECT sub, code,
          list((s - ((s % cnt + cnt) % cnt)) // cnt ORDER BY j) AS cq
        FROM ps$i GROUP BY 1, 2
      ),
      pc$i AS (
        SELECT p.sub, p.code, COALESCE(x.cq, p.cq) AS cq
        FROM $prev p LEFT JOIN pn$i x ON p.sub = x.sub AND p.code = x.code
      )"""
    }
    val vCte = if (defineV)
      """v AS (
        SELECT vec_id,
          list_transform(embedding,
            x -> CAST(floor(CAST(x AS DOUBLE) * 16777216.0) AS BIGINT)) AS q
        FROM embeddings
      ),
      """
    else ""
    s"""${vCte}vs AS (
        SELECT vec_id, sub,
          list_slice(q, sub * $dsub + 1, sub * $dsub + $dsub) AS sq
        FROM v CROSS JOIN (SELECT unnest(range(0, $m)) AS sub) subs
      ),
      pc0 AS (
        SELECT sub, rn - 1 AS code, sq AS cq FROM (
          SELECT sub, sq,
            ROW_NUMBER() OVER (PARTITION BY sub ORDER BY vec_id) AS rn
          FROM vs
        ) WHERE rn <= $k
      ),${(1 to iters).map(iterCte).mkString(",")}"""
  }

  /** DuckDB replay of one BPE merge round (TextAnalysis.q86Bpe): pair
    * stats over the current segmentation, argmax (count DESC, pair
    * ASC), greedy non-overlapping rewrite via the array-form
    * gaps-and-islands rule. List-comprehension / lambda indices are
    * 1-based here vs Spark's 0-based — the expressions compensate
    * (x - jj == x - j0 - 1). */
  private def bpeRoundCtes(i: Int): String = {
    val prev = s"w${i - 1}"
    s"""
      p$i AS (
        SELECT syms[k] AS l, syms[k+1] AS r, CAST(SUM(cnt) AS BIGINT) AS total
        FROM $prev CROSS JOIN LATERAL (SELECT unnest(range(1, len(syms))) AS k)
        WHERE len(syms) >= 2
        GROUP BY 1, 2
      ),
      b$i AS (
        SELECT l, r, total FROM p$i
        ORDER BY total DESC, l ASC, r ASC LIMIT 1
      ),
      w$i AS (
        SELECT word, cnt, flatten(list_transform(range(1, len(syms) + 1),
          q -> CASE
            WHEN list_contains(sel, q)
              THEN [syms[q] || syms[q+1]]
            WHEN list_contains(sel, q - 1) THEN []
            ELSE [syms[q]] END)) AS syms
        FROM (
          SELECT word, cnt, syms,
            [p[j] FOR j IN range(1, len(p) + 1)
              IF (j - list_position(list_transform(p, (x, jj) -> x - jj),
                    list_transform(p, (x, jj) -> x - jj)[j])) % 2 = 0] AS sel
          FROM (
            SELECT word, cnt, syms,
              [k FOR k IN range(1, len(syms))
                IF syms[k] = b.l AND syms[k+1] = b.r] AS p
            FROM $prev CROSS JOIN b$i b
          )
        )
      )"""
  }

  /** q32 oracle: quantized-kmeans cluster summary from exact sums. */
  private def kmeansOracle(k: Int, iters: Int): String =
    s"""
      WITH ${kmeansCtes(k, iters)},
      fin AS (
        SELECT vec_id,
          MAX(CASE WHEN rn = 1 THEN cluster END) AS cluster,
          MAX(CASE WHEN rn = 1 THEN d END) AS d,
          MAX(CASE WHEN rn = 2 THEN d END) AS d2
        FROM (
          SELECT v.vec_id, c.cluster, ${qDist("c")} AS d,
            ROW_NUMBER() OVER (PARTITION BY v.vec_id
              ORDER BY ${qDist("c")} ASC, c.cluster ASC) AS rn
          FROM v CROSS JOIN c$iters c
        ) WHERE rn <= 2
        GROUP BY vec_id
      )
      SELECT cluster, COUNT(*) AS n,
        sqrt(CAST(SUM(d) AS DOUBLE) / COUNT(*)) / 16777216.0 AS rms_dist,
        sqrt(CAST(SUM(d2) AS DOUBLE) / CAST(SUM(d) AS DOUBLE)) AS separation
      FROM fin GROUP BY cluster
    """

  /** DuckDB rebuild of the hyperplane-LSH bucket table
    * (VectorKernels.hyperplaneBuckets): the sign table comes from the
    * same engine-neutral mix32 over plane*2^16 + dim, projections
    * fold left-to-right in double (ordered list_reduce), bucket codes
    * sum sign bits — bit-identical to the kernel. Yields CTEs ending
    * in `buck(vec_id, embedding, tbl, bucket)` plus `e(vec_id,
    * embedding, norm)` for exact-cosine scoring. */
  private def hyperplaneBuckCte(nTables: Int, bitsPerTable: Int): String = {
    val planes = nTables * bitsPerTable
    s"""
      dims AS (SELECT unnest(range(0, 64)) AS i),
      pl AS (SELECT unnest(range(0, $planes)) AS p),
      keys AS (SELECT p, i, p * 65536 + i AS k FROM pl CROSS JOIN dims),
      s1 AS (
        SELECT p, i,
          (((k >> 16) * 2654435761 % 4294967296) * 65536
            + (k & 65535) * 2654435761) % 4294967296 AS a
        FROM keys
      ),
      s2 AS (SELECT p, i, xor(a, a >> 16) AS b FROM s1),
      s3 AS (
        SELECT p, i,
          (((b >> 16) * 2246822519 % 4294967296) * 65536
            + (b & 65535) * 2246822519) % 4294967296 AS d
        FROM s2
      ),
      s4 AS (
        SELECT p, i,
          CASE WHEN (xor(d, d >> 13) & 1) = 1 THEN 1.0 ELSE -1.0 END AS sgn
        FROM s3
      ),
      sgnlist AS (SELECT p, list(sgn ORDER BY i) AS signs FROM s4 GROUP BY p),
      proj AS (
        SELECT em.vec_id, g.p,
          list_reduce(list_transform(range(1, 65),
            i -> CAST(em.embedding[i] AS DOUBLE) * g.signs[i]),
            (a, b) -> a + b) AS s
        FROM embeddings em CROSS JOIN sgnlist g
      ),
      buck AS (
        SELECT vec_id, CAST(p // $bitsPerTable AS BIGINT) AS tbl,
          CAST(SUM(CASE WHEN s >= 0 THEN (1::BIGINT << (p % $bitsPerTable))
                        ELSE 0 END) AS BIGINT) AS bucket
        FROM proj GROUP BY 1, 2
      ),
      e AS (
        SELECT vec_id, embedding,
          sqrt(list_reduce(
            list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
            (a, b) -> a + b)) AS norm
        FROM embeddings
      )"""
  }

  private val cosineSql =
    """list_reduce(list_transform(range(1, 65),
         i -> CAST(p.embedding[i] AS DOUBLE) * CAST(n.embedding[i] AS DOUBLE)),
         (a, b) -> a + b) / (p.norm * n.norm)"""

  /** DuckDB scalar replay of Exprs.mix32 (the engine-neutral 32-bit
    * mix): nested text expansion of the same masked multiply-xorshift
    * rounds the q51/q62 oracles spell out as CTE stages. */
  private def mulMod32Sql(x: String, m: Long): String =
    s"(((($x) >> 16) * $m % 4294967296) * 65536 + (($x) & 65535) * $m) % 4294967296"

  private def mix32Sql(v: String): String = {
    val a = mulMod32Sql(s"(($v) & 4294967295)", 2654435761L)
    val b = s"xor(($a), ($a) >> 16)"
    val d = mulMod32Sql(s"($b)", 2246822519L)
    s"xor(($d), ($d) >> 13)"
  }

  /** The 20-term Morton interleave, spelled out for DuckDB (matches
    * Exprs.zValue2 bit for bit — pure integer shifts). */
  private def zInterleaveSql(x: String, y: String, bits: Int): String =
    (0 until bits).map(j =>
      s"((($x >> $j) & 1) << ${2 * j}) + ((($y >> $j) & 1) << ${2 * j + 1})")
      .mkString(" + ")

  /** DuckDB replay of the deterministic integer PageRank
    * (operators/Graph.pagerank): same RankScale fractions, same
    * floor-division contributions, same order-independent integer
    * sums — iterations unrolled as chained CTEs (the q32 technique).
    * All BIGINT casts keep DuckDB's HUGEINT sums out of the result. */
  private def pagerankOracle(iters: Int): String = {
    def step(i: Int): String =
      s"""
      r$i AS (
        SELECT d.src AS node,
          CAST((SELECT (15 * per) // 100 FROM meta)
            + (85 * COALESCE(s.inc, 0)) // 100 AS BIGINT) AS rank
        FROM deg d LEFT JOIN (
          SELECT e.dst AS dst, CAST(SUM(r.rank // d2.outdeg) AS BIGINT) AS inc
          FROM r${i - 1} r
          JOIN deg d2 ON r.node = d2.src
          JOIN e ON e.src = r.node
          GROUP BY 1
        ) s ON d.src = s.dst
      )"""
    s"""
      WITH e AS (
        SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
      ),
      deg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY 1),
      meta AS (SELECT 1000000000000 // COUNT(*) AS per FROM deg),
      r0 AS (SELECT src AS node, CAST((SELECT per FROM meta) AS BIGINT) AS rank FROM deg),
      ${(1 to iters).map(step).mkString(",")}
      SELECT r.node AS part_key, d.outdeg AS out_degree, r.rank
      FROM r$iters r JOIN deg d ON r.node = d.src
      ORDER BY r.rank DESC, part_key ASC LIMIT 20
    """
  }

  def oracleSql: Map[String, String] = Map(
    "q32_kmeans" -> kmeansOracle(k = 10, iters = 5),
    "q53_pagerank" -> pagerankOracle(iters = 3),
    "q54_tfidf" -> """
      WITH words AS (
        SELECT doc_id, w AS term, COUNT(*) AS tf
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
        GROUP BY 1, 2
      ),
      docfreq AS (SELECT term, COUNT(*) AS df FROM words GROUP BY 1),
      n AS (SELECT COUNT(*) AS n FROM documents),
      scored AS (
        SELECT w.doc_id, w.term, w.tf, f.df,
          w.tf * ((1000000 * (SELECT n FROM n)) // f.df) AS score
        FROM words w JOIN docfreq f USING (term)
      )
      SELECT doc_id, term, tf, df, score, term_rank FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
          ORDER BY score DESC, term ASC) AS term_rank
        FROM scored
      ) WHERE term_rank <= 3
    """,
    "q45_ann_ivf" -> s"""
      WITH ${kmeansCtes("SELECT GREATEST(16, COUNT(*) // 1250) FROM v", iters = 5)},
      e AS (
        SELECT vec_id, embedding,
          sqrt(list_reduce(
            list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
            (a, b) -> a + b)) AS norm
        FROM embeddings
      ),
      ad AS (
        SELECT v.vec_id, c.cluster,
          ROW_NUMBER() OVER (PARTITION BY v.vec_id
            ORDER BY ${qDist("c")} ASC, c.cluster ASC) AS rn
        FROM v CROSS JOIN c5 c
      ),
      corpus AS (SELECT vec_id, cluster FROM ad WHERE rn = 1),
      pc AS (SELECT vec_id, cluster FROM ad WHERE rn <= 6 AND vec_id % 50 = 0),
      cand AS (
        SELECT DISTINCT pr.vec_id AS probe_id, co.vec_id AS neighbor_id
        FROM pc pr JOIN corpus co ON pr.cluster = co.cluster
        WHERE pr.vec_id <> co.vec_id
      ),
      scored AS (
        SELECT c.probe_id, c.neighbor_id, $cosineSql AS cosine
        FROM cand c
        JOIN e p ON c.probe_id = p.vec_id
        JOIN e n ON c.neighbor_id = n.vec_id
      )
      SELECT probe_id, neighbor_id, "rank", cosine FROM (
        SELECT probe_id, neighbor_id, cosine,
          ROW_NUMBER() OVER (PARTITION BY probe_id
            ORDER BY cosine DESC, neighbor_id ASC) AS "rank"
        FROM scored
      ) WHERE "rank" <= 5
    """,
    "q25_ann_lsh" -> s"""
      WITH ${hyperplaneBuckCte(nTables = 8, bitsPerTable = 8)},
      cand AS (
        SELECT DISTINCT pr.vec_id AS probe_id, co.vec_id AS neighbor_id
        FROM buck pr JOIN buck co ON pr.tbl = co.tbl AND pr.bucket = co.bucket
        WHERE pr.vec_id % 50 = 0 AND pr.vec_id <> co.vec_id
      ),
      scored AS (
        SELECT c.probe_id, c.neighbor_id, $cosineSql AS cosine
        FROM cand c
        JOIN e p ON c.probe_id = p.vec_id
        JOIN e n ON c.neighbor_id = n.vec_id
      )
      SELECT probe_id, neighbor_id, "rank", cosine FROM (
        SELECT probe_id, neighbor_id, cosine,
          ROW_NUMBER() OVER (PARTITION BY probe_id
            ORDER BY cosine DESC, neighbor_id ASC) AS "rank"
        FROM scored
      ) WHERE "rank" <= 5
    """,
    "q30_dedup_embedding" -> s"""
      WITH e AS (
        SELECT vec_id, embedding,
          sqrt(list_reduce(
            list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
            (a, b) -> a + b)) AS norm
        FROM embeddings
      ),
      cand AS (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      )
      SELECT vec_a, vec_b, cosine FROM (
        SELECT c.vec_a, c.vec_b, $cosineSql AS cosine
        FROM cand c
        JOIN e p ON c.vec_a = p.vec_id
        JOIN e n ON c.vec_b = n.vec_id
      ) WHERE cosine >= 0.3
    """,
    "q52_balanced_sample" -> """
      WITH m1 AS (
        SELECT lang, doc_id,
          (((((doc_id & 4294967295) >> 16) * 2654435761 % 4294967296) * 65536
            + (doc_id & 65535) * 2654435761) % 4294967296) AS a
        FROM documents
      ),
      m2 AS (SELECT lang, doc_id, xor(a, a >> 16) AS b FROM m1),
      m3 AS (
        SELECT lang, doc_id,
          (((b >> 16) * 2246822519 % 4294967296) * 65536
            + (b & 65535) * 2246822519) % 4294967296 AS d
        FROM m2
      ),
      h AS (SELECT lang, doc_id, xor(d, d >> 13) AS hv FROM m3),
      r AS (
        SELECT lang, doc_id, hv,
          ROW_NUMBER() OVER (PARTITION BY lang ORDER BY hv, doc_id) AS "rank"
        FROM h
      )
      SELECT lang, doc_id, hv, "rank" FROM r WHERE "rank" <= 50
    """,
    "q51_kmv_distinct" -> """
      WITH u AS (SELECT DISTINCT event_type, user_id & 4294967295 AS x FROM events),
      m1 AS (
        SELECT event_type,
          (((x >> 16) * 2654435761 % 4294967296) * 65536
            + (x & 65535) * 2654435761) % 4294967296 AS a
        FROM u
      ),
      m2 AS (SELECT event_type, xor(a, a >> 16) AS b FROM m1),
      m3 AS (
        SELECT event_type,
          (((b >> 16) * 2246822519 % 4294967296) * 65536
            + (b & 65535) * 2246822519) % 4294967296 AS d
        FROM m2
      ),
      h AS (SELECT DISTINCT event_type, xor(d, d >> 13) AS hv FROM m3),
      r AS (
        SELECT event_type, hv,
          ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hv) AS rn,
          COUNT(*) OVER (PARTITION BY event_type) AS nh
        FROM h
      ),
      s AS (
        SELECT event_type,
          MAX(CASE WHEN rn = 32 THEN hv END) AS kth,
          CAST(MAX(CASE WHEN nh >= 32 THEN 32 ELSE nh END) AS BIGINT) AS kmv_size,
          MAX(nh) AS nh
        FROM r GROUP BY 1
      ),
      e AS (
        SELECT event_type, COUNT(DISTINCT user_id) AS users_exact,
          COUNT(*) AS events
        FROM events GROUP BY 1
      )
      SELECT e.event_type, e.users_exact, e.events, s.kmv_size,
        CASE WHEN s.nh >= 32 THEN s.kth END AS kmv_kth,
        CASE WHEN s.nh >= 32 THEN 133143986176.0 / s.kth
             ELSE CAST(s.nh AS DOUBLE) END AS kmv_estimate
      FROM e JOIN s USING (event_type)
    """,
    "q50_zorder" -> s"""
      WITH g AS (
        SELECT o_custkey % 1024 AS x, o_orderkey % 1024 AS y, o_totalprice
        FROM orders
      ),
      z AS (SELECT ${zInterleaveSql("x", "y", 10)} AS zv, o_totalprice FROM g)
      SELECT zv >> 14 AS zbucket, COUNT(*) AS orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        MIN(zv) AS z_min, MAX(zv) AS z_max
      FROM z GROUP BY 1
    """,
    "q49_sequence_pack" -> """
      WITH t AS (
        SELECT doc_id,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
          ((((doc_id & 4294967295) >> 16) * 2654435761 % 4294967296 * 65536
            + (doc_id & 65535) * 2654435761) % 4294967296) % 8 AS shard
        FROM documents
      ),
      c AS (
        SELECT *,
          CAST(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS end_tok
        FROM t
      ),
      d AS (
        SELECT *, end_tok - n_tokens AS start_tok,
          (end_tok - n_tokens) // 512 AS chunk
        FROM c
      )
      SELECT shard, chunk, COUNT(*) AS docs,
        CAST(SUM(n_tokens) AS BIGINT) AS tokens,
        MIN(doc_id) AS first_doc,
        CAST(SUM(CASE WHEN end_tok > (chunk + 1) * 512 THEN 1 ELSE 0 END) AS BIGINT)
          AS boundary_docs
      FROM d GROUP BY 1, 2
    """,
    "q55_funnel" -> """
      WITH s1 AS (
        SELECT user_id, MIN(ts) AS t1 FROM events
        WHERE event_type = 'view' GROUP BY 1
      ),
      s2 AS (
        SELECT e.user_id, MIN(e.ts) AS t2
        FROM events e JOIN s1 ON e.user_id = s1.user_id
        WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY 1
      ),
      s3 AS (
        SELECT e.user_id, MIN(e.ts) AS t3
        FROM events e JOIN s2 ON e.user_id = s2.user_id
        WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1
      ),
      counts AS (
        SELECT '1_view' AS step, COUNT(*) AS users FROM s1
        UNION ALL SELECT '2_view_click', COUNT(*) FROM s2
        UNION ALL SELECT '3_view_click_purchase', COUNT(*) FROM s3
      )
      SELECT step, users,
        CAST(users AS DOUBLE) / NULLIF((SELECT COUNT(*) FROM s1), 0) AS conversion
      FROM counts
    """,
    "q56_retention" -> """
      WITH activity AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
      ),
      cohort AS (
        SELECT user_id, MIN(day) AS cohort_day FROM activity GROUP BY 1
      ),
      sizes AS (
        SELECT cohort_day, COUNT(*) AS cohort_users FROM cohort GROUP BY 1
      ),
      j AS (
        SELECT c.cohort_day,
          CAST(date_diff('day', c.cohort_day, a.day) AS INTEGER) AS "offset",
          a.user_id
        FROM activity a JOIN cohort c ON a.user_id = c.user_id
        WHERE date_diff('day', c.cohort_day, a.day) <= 7
      )
      SELECT j.cohort_day, j."offset",
        COUNT(DISTINCT j.user_id) AS active_users,
        s.cohort_users,
        CAST(COUNT(DISTINCT j.user_id) AS DOUBLE) / s.cohort_users AS retention
      FROM j JOIN sizes s ON j.cohort_day = s.cohort_day
      GROUP BY 1, 2, 4
    """,
    "q57_vocab" -> """
      WITH words AS (
        SELECT unnest(string_split(text, ' ')) AS term FROM documents
      ),
      counts AS (SELECT term, COUNT(*) AS cnt FROM words GROUP BY 1),
      total AS (SELECT COUNT(*) AS total_tokens FROM words),
      ranked AS (
        SELECT term, cnt,
          CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, term ASC) AS INTEGER)
            AS vocab_rank,
          CAST(cnt AS DOUBLE) / (SELECT total_tokens FROM total) AS coverage
        FROM counts
      )
      SELECT term, cnt, vocab_rank, coverage,
        SUM(coverage) OVER (ORDER BY vocab_rank
          ROWS UNBOUNDED PRECEDING) AS cum_coverage
      FROM ranked WHERE vocab_rank <= 24
    """,
    "q58_cdc_merge" -> """
      WITH log AS (
        SELECT user_id AS key, event_id AS seq,
          CASE WHEN event_type = 'purchase' THEN 'D' ELSE 'U' END AS op,
          value, ts
        FROM events
      )
      SELECT key, MAX(seq) AS last_seq, COUNT(*) AS n_changes,
        arg_max(value, seq) AS last_value,
        epoch_us(arg_max(ts, seq)) AS last_ts_us
      FROM log GROUP BY 1
      HAVING arg_max(op, seq) <> 'D'
    """,
    "q59_scd2" -> """
      WITH a AS (
        SELECT user_id AS key, event_id AS seq, ts, event_type AS attr,
          LAG(event_type) OVER
            (PARTITION BY user_id ORDER BY ts, event_id) AS prev_attr
        FROM events
      ),
      t AS (
        SELECT key, seq, ts, attr FROM a
        WHERE prev_attr IS NULL OR attr <> prev_attr
      ),
      f AS (
        SELECT key, attr, ts, seq,
          LEAD(ts) OVER (PARTITION BY key ORDER BY ts, seq) AS eff_to
        FROM t
      )
      SELECT key, attr, epoch_us(ts) AS effective_from_us,
        epoch_us(eff_to) AS effective_to_us,
        (eff_to IS NULL) AS is_current, seq AS from_seq
      FROM f
    """,
    "q60_transitions" -> """
      WITH s AS (
        SELECT user_id, event_id, ts, event_type,
          LEAD(event_type) OVER w AS next_type,
          LEAD(ts) OVER w AS next_ts
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ),
      p AS (
        SELECT event_type AS from_type, next_type AS to_type
        FROM s
        WHERE next_type IS NOT NULL AND next_ts <= ts + INTERVAL 30 MINUTE
      ),
      m AS (
        SELECT from_type, to_type, COUNT(*) AS transitions
        FROM p GROUP BY 1, 2
      )
      SELECT from_type, to_type, transitions,
        CAST(SUM(transitions) OVER (PARTITION BY from_type) AS BIGINT)
          AS from_total,
        CAST(transitions AS DOUBLE) /
          CAST(SUM(transitions) OVER (PARTITION BY from_type) AS DOUBLE)
          AS probability
      FROM m
    """,
    "q61_anomaly" -> """
      WITH daily AS (
        SELECT o_orderpriority AS priority, CAST(o_orderdate AS DATE) AS day,
          CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
            AS revenue_cents,
          COUNT(*) AS orders
        FROM orders GROUP BY 1, 2
      ),
      w AS (
        SELECT priority, day, revenue_cents, orders,
          CAST(COUNT(*) OVER tr AS HUGEINT) AS n,
          CAST(SUM(CAST(revenue_cents AS HUGEINT)) OVER tr AS HUGEINT) AS sx,
          CAST(SUM(CAST(revenue_cents AS HUGEINT)
            * CAST(revenue_cents AS HUGEINT)) OVER tr AS HUGEINT) AS sx2
        FROM daily
        WINDOW tr AS (PARTITION BY priority ORDER BY day
                      ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
      )
      SELECT priority, day, revenue_cents, orders,
        CAST(n AS BIGINT) AS trailing_days,
        CAST(sx AS BIGINT) AS trailing_cents,
        ((n * revenue_cents - sx) * (n * revenue_cents - sx)
          > 9 * n * (n * sx2 - sx * sx)) AS is_anomaly
      FROM w WHERE n >= 4
    """,
    "q62_bloom_prune" -> """
      WITH uids AS (SELECT DISTINCT user_id FROM events),
      k AS (
        SELECT user_id, i, (user_id * 8 + i) & 4294967295 AS k32
        FROM uids CROSS JOIN (SELECT unnest([0, 1, 2]) AS i)
      ),
      s1 AS (
        SELECT user_id, i,
          (((k32 >> 16) * 2654435761 % 4294967296) * 65536
            + (k32 & 65535) * 2654435761) % 4294967296 AS a
        FROM k
      ),
      s2 AS (SELECT user_id, i, xor(a, a >> 16) AS b FROM s1),
      s3 AS (
        SELECT user_id, i,
          (((b >> 16) * 2246822519 % 4294967296) * 65536
            + (b & 65535) * 2246822519) % 4294967296 AS d
        FROM s2
      ),
      h AS (SELECT user_id, i, xor(d, d >> 13) % 4096 AS pos FROM s3),
      flagged AS (
        SELECT DISTINCT user_id FROM events
        WHERE event_type = 'purchase' AND value > 190
      ),
      bloom AS (SELECT DISTINCT pos FROM h JOIN flagged USING (user_id)),
      usr AS (
        SELECT h.user_id, BOOL_AND(bloom.pos IS NOT NULL) AS bloom_pass
        FROM h LEFT JOIN bloom ON h.pos = bloom.pos
        GROUP BY 1
      ),
      ev AS (
        SELECT e.event_type, u.bloom_pass,
          (f.user_id IS NOT NULL) AS flagged
        FROM events e
        JOIN usr u ON e.user_id = u.user_id
        LEFT JOIN flagged f ON e.user_id = f.user_id
      )
      SELECT event_type, COUNT(*) AS total_events,
        CAST(SUM(CASE WHEN bloom_pass THEN 1 ELSE 0 END) AS BIGINT)
          AS bloom_pass_events,
        CAST(SUM(CASE WHEN flagged THEN 1 ELSE 0 END) AS BIGINT)
          AS flagged_events,
        CAST(SUM(CASE WHEN bloom_pass AND NOT flagged THEN 1 ELSE 0 END)
          AS BIGINT) AS false_positive_events
      FROM ev GROUP BY 1
    """,
    "q63_boilerplate" -> """
      WITH t AS (
        SELECT doc_id, list_distinct([array_to_string(w[i:i+7], ' ')
                       for i in range(1, len(w) - 6)]) AS ng
        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
      ),
      p AS (SELECT doc_id, unnest(ng) AS ng FROM t),
      g AS (SELECT ng, COUNT(*) AS docs_with FROM p GROUP BY 1),
      d AS (
        SELECT p.doc_id, COUNT(*) AS total_ngrams,
          CAST(SUM(CASE WHEN g.docs_with >= 2 THEN 1 ELSE 0 END) AS BIGINT)
            AS shared_ngrams
        FROM p JOIN g USING (ng) GROUP BY 1
      )
      SELECT doc_id, total_ngrams, shared_ngrams,
        CAST(shared_ngrams AS DOUBLE) / CAST(total_ngrams AS DOUBLE)
          AS boilerplate_fraction,
        (shared_ngrams * 2 >= total_ngrams) AS is_boilerplate
      FROM d
    """,
    "q64_countmin" -> s"""
      WITH seeds AS (SELECT unnest([0, 1, 2, 3]) AS r),
      h AS (
        SELECT seeds.r,
          ${mix32Sql("l_partkey + seeds.r * 1000003")} % 512 AS bucket
        FROM lineitem CROSS JOIN seeds
      ),
      sk AS (SELECT r, bucket, COUNT(*) AS cnt FROM h GROUP BY 1, 2),
      keys AS (SELECT p_partkey AS key FROM part WHERE p_partkey < 25),
      kh AS (
        SELECT key, seeds.r,
          ${mix32Sql("key + seeds.r * 1000003")} % 512 AS bucket
        FROM keys CROSS JOIN seeds
      ),
      est AS (
        SELECT key, MIN(COALESCE(sk.cnt, 0)) AS cm_estimate
        FROM kh LEFT JOIN sk USING (r, bucket) GROUP BY 1
      ),
      ex AS (
        SELECT l_partkey AS key, COUNT(*) AS exact_cnt
        FROM lineitem WHERE l_partkey < 25 GROUP BY 1
      )
      SELECT k.key AS p_partkey,
        COALESCE(ex.exact_cnt, 0) AS exact_cnt,
        est.cm_estimate,
        est.cm_estimate - COALESCE(ex.exact_cnt, 0) AS overestimate
      FROM keys k
      LEFT JOIN ex USING (key)
      JOIN est USING (key)
    """,
    "q65_session_paths" -> """
      WITH r AS (
        SELECT user_id, event_type,
          ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
            AS rn
        FROM events
      ),
      p AS (
        SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path,
          COUNT(*) AS depth
        FROM r WHERE rn <= 3 GROUP BY 1
      ),
      t AS (SELECT COUNT(DISTINCT user_id) AS total_users FROM events)
      SELECT path, depth, COUNT(*) AS n_users,
        CAST(COUNT(*) AS DOUBLE) / CAST(MAX(total_users) AS DOUBLE) AS share
      FROM p CROSS JOIN t
      GROUP BY path, depth
    """,
    "q66_gap_fill" -> """
      WITH daily AS (
        SELECT o_orderpriority AS priority, CAST(o_orderdate AS DATE) AS day,
          CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
            AS rev_cents,
          COUNT(*) AS n_orders
        FROM orders GROUP BY 1, 2
      ),
      span AS (
        SELECT MIN(CAST(o_orderdate AS DATE)) AS d0,
          MAX(CAST(o_orderdate AS DATE)) AS d1
        FROM orders
      ),
      cal AS (
        SELECT p.priority,
          CAST(unnest(generate_series(span.d0, span.d1, INTERVAL 1 DAY))
            AS DATE) AS day
        FROM (SELECT DISTINCT o_orderpriority AS priority FROM orders) p
        CROSS JOIN span
      ),
      dense AS (
        SELECT c.priority, c.day,
          COALESCE(d.rev_cents, 0) AS revenue_cents,
          COALESCE(d.n_orders, 0) AS orders,
          d.n_orders IS NULL AS is_gap,
          d.rev_cents AS raw_rev,
          CASE WHEN d.n_orders IS NOT NULL THEN c.day END AS data_day
        FROM cal c LEFT JOIN daily d USING (priority, day)
      )
      SELECT priority, day, revenue_cents, orders, is_gap,
        last_value(raw_rev IGNORE NULLS) OVER w AS carried_cents,
        CAST(date_diff('day', last_value(data_day IGNORE NULLS) OVER w, day)
          AS BIGINT) AS days_since_order
      FROM dense
      WINDOW w AS (PARTITION BY priority ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    "q71_rfm" -> """
      WITH pc AS (
        SELECT o_custkey,
          MAX(CAST(o_orderdate AS DATE)) AS last_day,
          COUNT(*) AS frequency,
          CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
            AS monetary_cents
        FROM orders GROUP BY 1
      ),
      a AS (SELECT MAX(last_day) AS anchor FROM pc),
      m AS (
        SELECT o_custkey,
          CAST(date_diff('day', last_day, anchor) AS BIGINT) AS recency_days,
          frequency, monetary_cents
        FROM pc CROSS JOIN a
      ),
      b AS (
        SELECT quantile_cont(recency_days, [0.2, 0.4, 0.6, 0.8]) AS rq,
          quantile_cont(frequency, [0.2, 0.4, 0.6, 0.8]) AS fq,
          quantile_cont(monetary_cents, [0.2, 0.4, 0.6, 0.8]) AS mq
        FROM m
      ),
      s AS (
        SELECT
          CAST(1
            + (CASE WHEN CAST(recency_days AS DOUBLE) < rq[1] THEN 1 ELSE 0 END)
            + (CASE WHEN CAST(recency_days AS DOUBLE) < rq[2] THEN 1 ELSE 0 END)
            + (CASE WHEN CAST(recency_days AS DOUBLE) < rq[3] THEN 1 ELSE 0 END)
            + (CASE WHEN CAST(recency_days AS DOUBLE) < rq[4] THEN 1 ELSE 0 END)
            AS BIGINT) AS r_score,
          CAST(1
            + (CASE WHEN CAST(frequency AS DOUBLE) > fq[1] THEN 1 ELSE 0 END)
            + (CASE WHEN CAST(frequency AS DOUBLE) > fq[2] THEN 1 ELSE 0 END)
            + (CASE WHEN CAST(frequency AS DOUBLE) > fq[3] THEN 1 ELSE 0 END)
            + (CASE WHEN CAST(frequency AS DOUBLE) > fq[4] THEN 1 ELSE 0 END)
            AS BIGINT) AS f_score,
          CAST(1
            + (CASE WHEN CAST(monetary_cents AS DOUBLE) > mq[1] THEN 1 ELSE 0 END)
            + (CASE WHEN CAST(monetary_cents AS DOUBLE) > mq[2] THEN 1 ELSE 0 END)
            + (CASE WHEN CAST(monetary_cents AS DOUBLE) > mq[3] THEN 1 ELSE 0 END)
            + (CASE WHEN CAST(monetary_cents AS DOUBLE) > mq[4] THEN 1 ELSE 0 END)
            AS BIGINT) AS m_score,
          monetary_cents
        FROM m CROSS JOIN b
      )
      SELECT r_score, f_score, m_score,
        COUNT(*) AS customers,
        CAST(SUM(monetary_cents) AS BIGINT) AS cell_cents,
        CASE WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4
               THEN 'champion'
             WHEN r_score <= 2 AND f_score >= 4 THEN 'at_risk'
             WHEN f_score >= 3 THEN 'loyal'
             ELSE 'casual' END AS segment
      FROM s GROUP BY 1, 2, 3
    """,
    "q67_correlation" -> """
      WITH e AS (SELECT CAST(ts AS DATE) AS day, event_type FROM events),
      daily AS (SELECT day, event_type, COUNT(*) AS cnt FROM e GROUP BY 1, 2),
      grid AS (
        SELECT d.day, t.event_type
        FROM (SELECT DISTINCT day FROM e) d
        CROSS JOIN (SELECT DISTINCT event_type FROM e) t
      ),
      dense AS (
        SELECT g.day, g.event_type, COALESCE(daily.cnt, 0) AS cnt
        FROM grid g LEFT JOIN daily USING (day, event_type)
      ),
      p AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
          CAST(a.cnt AS HUGEINT) AS x, CAST(b.cnt AS HUGEINT) AS y
        FROM dense a JOIN dense b
          ON a.day = b.day AND a.event_type < b.event_type
      ),
      s AS (
        SELECT type_a, type_b, COUNT(*) AS n_days,
          SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
          SUM(x * x) AS sxx, SUM(y * y) AS syy
        FROM p GROUP BY 1, 2
      )
      SELECT type_a, type_b, n_days,
        CAST(sx AS BIGINT) AS sum_a, CAST(sy AS BIGINT) AS sum_b,
        CASE WHEN sqrt(CAST(n_days * sxx - sx * sx AS DOUBLE))
               * sqrt(CAST(n_days * syy - sy * sy AS DOUBLE)) > 0
          THEN CAST(n_days * sxy - sx * sy AS DOUBLE)
            / (sqrt(CAST(n_days * sxx - sx * sx AS DOUBLE))
               * sqrt(CAST(n_days * syy - sy * sy AS DOUBLE)))
        END AS pearson_r
      FROM s
    """,
    "q68_experiment" -> s"""
      WITH pu AS (
        SELECT user_id,
          COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchases,
          COALESCE(SUM(CAST(value AS DECIMAL(18,2)))
            FILTER (WHERE event_type = 'purchase'), 0) AS rev
        FROM events GROUP BY 1
      ),
      v AS (
        SELECT ${mix32Sql("user_id")} % 2 AS variant,
          CASE WHEN purchases > 0 THEN 1 ELSE 0 END AS converted, rev
        FROM pu
      ),
      c AS (
        SELECT
          COUNT(*) FILTER (WHERE variant = 0) AS users_a,
          COUNT(*) FILTER (WHERE variant = 1) AS users_b,
          CAST(COALESCE(SUM(converted) FILTER (WHERE variant = 0), 0)
            AS BIGINT) AS conv_a,
          CAST(COALESCE(SUM(converted) FILTER (WHERE variant = 1), 0)
            AS BIGINT) AS conv_b,
          CAST(SUM(rev) FILTER (WHERE variant = 0) AS DOUBLE) AS rev_a,
          CAST(SUM(rev) FILTER (WHERE variant = 1) AS DOUBLE) AS rev_b
        FROM v
      ),
      z AS (
        SELECT *,
          CAST(conv_a AS DOUBLE) / CAST(users_a AS DOUBLE) AS rate_a_,
          CAST(conv_b AS DOUBLE) / CAST(users_b AS DOUBLE) AS rate_b_,
          CAST(conv_a + conv_b AS DOUBLE) / CAST(users_a + users_b AS DOUBLE)
            AS pooled
        FROM c
      ),
      z2 AS (
        SELECT *, sqrt(pooled * (1.0 - pooled)
          * (1.0 / CAST(users_a AS DOUBLE)
             + 1.0 / CAST(users_b AS DOUBLE))) AS se
        FROM z
      )
      SELECT users_a, users_b, conv_a, conv_b,
        CASE WHEN users_a > 0 THEN rate_a_ END AS rate_a,
        CASE WHEN users_b > 0 THEN rate_b_ END AS rate_b,
        CASE WHEN users_a > 0 AND users_b > 0 AND se > 0
          THEN (rate_a_ - rate_b_) / se END AS z_score,
        CASE WHEN users_a > 0
          THEN rev_a / CAST(users_a AS DOUBLE) END AS arpu_a,
        CASE WHEN users_b > 0
          THEN rev_b / CAST(users_b AS DOUBLE) END AS arpu_b
      FROM z2
    """,
    "q01_agg_filter" -> """
      SELECT
        l_returnflag,
        l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-12-01'
      GROUP BY l_returnflag, l_linestatus
    """,
    "q02_star_join" -> """
      SELECT
        r_name AS region_name,
        n_name AS nation_name,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        COUNT(*) AS line_count
      FROM lineitem
      JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name
    """,
    "q03_topn_order" -> """
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders
      ORDER BY o_totalprice DESC, o_orderkey ASC
      LIMIT 10
    """,
    "q04_window_topn" -> """
      SELECT p_brand, p_partkey, p_name, p_retailprice, rn FROM (
        SELECT p_brand, p_partkey, p_name, p_retailprice,
          ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey ASC) AS rn
        FROM part
      ) WHERE rn <= 3
    """,
    "q05_distinct_agg" -> """
      SELECT
        event_type,
        COUNT(DISTINCT user_id) AS users,
        COUNT(*) AS events,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
      FROM events
      GROUP BY event_type
    """,
    "q06_sessionize" -> """
      WITH flagged AS (
        SELECT user_id, ts, event_id,
          CASE WHEN LAG(epoch_ms(ts)) OVER w IS NULL
                 OR epoch_ms(ts) - LAG(epoch_ms(ts)) OVER w > 1800000
               THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ),
      sessions AS (
        SELECT user_id, ts,
          SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS session_seq
        FROM flagged
      ),
      per_session AS (
        SELECT user_id, session_seq,
          COUNT(*) AS hit_depth,
          MAX(epoch_ms(ts)) - MIN(epoch_ms(ts)) AS duration_ms
        FROM sessions GROUP BY user_id, session_seq
      )
      SELECT user_id,
        COUNT(*) AS sessions,
        CAST(SUM(hit_depth) AS BIGINT) AS total_events,
        CAST(SUM(duration_ms) AS BIGINT) AS total_duration_ms,
        CAST(SUM(CASE WHEN hit_depth = 1 THEN 1 ELSE 0 END) AS BIGINT) AS bounces
      FROM per_session GROUP BY user_id
    """,
    "q07_trending" -> """
      SELECT *,
        users - users_benchmark AS users_vs_benchmark,
        CASE WHEN users_benchmark > 0 THEN users / users_benchmark - 1.0 END AS users_pct_vs_benchmark,
        events - events_benchmark AS events_vs_benchmark
      FROM (
        SELECT
          event_type,
          COUNT(DISTINCT CASE WHEN CAST(ts AS DATE) = DATE '2024-01-29' THEN user_id END) AS users,
          CAST(COUNT(DISTINCT CASE WHEN CAST(ts AS DATE) <> DATE '2024-01-29' THEN user_id END) AS DOUBLE) / 4.0 AS users_benchmark,
          COUNT(CASE WHEN CAST(ts AS DATE) = DATE '2024-01-29' THEN 1 END) AS events,
          CAST(COUNT(CASE WHEN CAST(ts AS DATE) <> DATE '2024-01-29' THEN 1 END) AS DOUBLE) / 4.0 AS events_benchmark
        FROM events
        WHERE (CAST(ts AS DATE) = DATE '2024-01-29' OR CAST(ts AS DATE) = DATE '2024-01-22'
               OR CAST(ts AS DATE) = DATE '2024-01-15' OR CAST(ts AS DATE) = DATE '2024-01-08'
               OR CAST(ts AS DATE) = DATE '2024-01-01')
        GROUP BY event_type
      )
    """,
    "q08_url_normalize" -> """
      WITH urls AS (
        SELECT *, 'https://' || source || '.example.com/wiki/' || lang || '?utm=x#frag' AS page_url
        FROM documents
      )
      SELECT
        split_part(split_part(page_url, '://', 2), '/', 1) AS domain,
        regexp_replace(regexp_replace(page_url, '\?.*$', ''), '#.*$', '') AS page,
        COUNT(*) AS docs,
        CAST(SUM(CAST(n_chars AS DECIMAL(18,2))) AS DOUBLE) AS chars
      FROM urls
      GROUP BY 1, 2
    """,
    "q09_explode_conf" -> """
      WITH tax AS (
        SELECT doc_id, n_chars, lang AS value, (doc_id % 10) / 10.0 AS conf FROM documents
        UNION ALL
        SELECT doc_id, n_chars, source AS value, ((doc_id * 7) % 10) / 10.0 AS conf FROM documents
      )
      SELECT value, COUNT(*) AS docs,
        CAST(SUM(CAST(conf AS DECIMAL(18,1))) AS DOUBLE) AS conf_sum,
        CAST(SUM(n_chars) AS BIGINT) AS chars
      FROM tax WHERE conf >= 0.5 GROUP BY value
    """,
    "q10_dynamic_cube" -> """
      WITH base AS (
        SELECT event_type, user_id, value,
          't' || CAST(user_id % 5 AS VARCHAR) AS tag1,
          'u' || CAST(user_id % 3 AS VARCHAR) AS tag2,
          (event_id % 10) / 10.0 AS conf1,
          ((event_id * 3) % 10) / 10.0 AS conf2
        FROM events
        WHERE value >= 1.0
          AND (event_type IN ('click','view','purchase') OR user_id < 100)
          AND NOT (event_type = 'error')
      ),
      exploded AS (
        SELECT event_type, user_id, value, tag1 AS tag, conf1 AS conf FROM base
        UNION ALL
        SELECT event_type, user_id, value, tag2 AS tag, conf2 AS conf FROM base
      )
      SELECT * FROM (
        SELECT event_type, tag,
          COUNT(DISTINCT user_id) AS users,
          COUNT(*) AS events,
          CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
        FROM exploded WHERE conf >= 0.5
        GROUP BY event_type, tag
      ) WHERE users >= 1
      ORDER BY users DESC, event_type ASC, tag ASC LIMIT 100
    """,
    "q11_pivot" -> """
      SELECT CAST(ts AS DATE) AS day,
        CAST(SUM(CASE WHEN event_type='click' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS "click",
        CAST(SUM(CASE WHEN event_type='view' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS "view",
        CAST(SUM(CASE WHEN event_type='purchase' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS "purchase",
        CAST(SUM(CASE WHEN event_type='signup' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS "signup",
        CAST(SUM(CASE WHEN event_type='error' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS "error"
      FROM events GROUP BY 1
    """,
    "q12_calendar_window" -> """
      WITH m AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS ms, o_totalprice FROM orders
        WHERE CAST(date_trunc('month', o_orderdate) AS DATE) IN
          (DATE '2001-07-01', DATE '2001-06-01', DATE '2000-07-01')
      ),
      agg AS (
        SELECT
          CAST(SUM(CASE WHEN ms = DATE '2001-07-01' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS revenue,
          CAST(SUM(CASE WHEN ms = DATE '2001-06-01' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS mom_revenue,
          CAST(SUM(CASE WHEN ms = DATE '2000-07-01' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS yoy_revenue,
          COUNT(CASE WHEN ms = DATE '2001-07-01' THEN 1 END) AS orders
        FROM m
      )
      SELECT *, DATE '2001-07-01' AS month_start,
        CASE WHEN mom_revenue > 0 THEN revenue/mom_revenue - 1.0 END AS mom_pct,
        CASE WHEN yoy_revenue > 0 THEN revenue/yoy_revenue - 1.0 END AS yoy_pct
      FROM agg
    """,
    "q13_date_intervals" -> """
      WITH spine AS (
        SELECT CAST(gs AS DATE) AS day
        FROM generate_series(DATE '2024-01-01', DATE '2024-01-31', INTERVAL 1 DAY) t(gs)
      ),
      daily AS (
        SELECT CAST(ts AS DATE) AS day, COUNT(*) AS events,
          CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
        FROM events GROUP BY 1
      )
      SELECT spine.day, COALESCE(daily.events, 0) AS events,
        COALESCE(daily.value_sum, 0.0) AS value_sum
      FROM spine LEFT JOIN daily USING (day)
    """,
    "q14_threshold_monitor" -> """
      SELECT user_id, COUNT(*) AS events,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum,
        COUNT(CASE WHEN event_type='purchase' THEN 1 END) AS purchases
      FROM events WHERE CAST(ts AS DATE) >= DATE '2024-01-24'
      GROUP BY user_id
      HAVING COUNT(CASE WHEN event_type='purchase' THEN 1 END) = 0
         AND CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) >= 50.0
    """,
    "q15_bin_histogram" -> """
      SELECT bin, COUNT(*) AS orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        bin * 50000.0 AS bin_lo,
        CASE WHEN bin < 9 THEN (bin + 1) * 50000.0 END AS bin_hi
      FROM (SELECT CAST(LEAST(FLOOR(o_totalprice / 50000.0), 9.0) AS BIGINT) AS bin,
              o_totalprice FROM orders)
      GROUP BY bin
    """,
    "q16_num_format" -> """
      WITH agg AS (
        SELECT o_orderpriority,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
          COUNT(*) AS orders
        FROM orders GROUP BY 1
      ),
      fmt AS (
        SELECT *,
          CAST(CAST(revenue AS DECIMAL(30,2)) * 100 AS BIGINT) AS rev_cents,
          orders * 100 AS ord_cents
        FROM agg
      )
      SELECT o_orderpriority, revenue, orders,
        CASE
          WHEN revenue >= 1e12 THEN CAST((rev_cents*20 + 100000000000000) // 200000000000000 // 10 AS VARCHAR) || '.' || CAST((rev_cents*20 + 100000000000000) // 200000000000000 % 10 AS VARCHAR) || 'T'
          WHEN revenue >= 1e9  THEN CAST((rev_cents*20 + 100000000000) // 200000000000 // 10 AS VARCHAR) || '.' || CAST((rev_cents*20 + 100000000000) // 200000000000 % 10 AS VARCHAR) || 'B'
          WHEN revenue >= 1e6  THEN CAST((rev_cents*20 + 100000000) // 200000000 // 10 AS VARCHAR) || '.' || CAST((rev_cents*20 + 100000000) // 200000000 % 10 AS VARCHAR) || 'M'
          WHEN revenue >= 1e3  THEN CAST((rev_cents*20 + 100000) // 200000 // 10 AS VARCHAR) || '.' || CAST((rev_cents*20 + 100000) // 200000 % 10 AS VARCHAR) || 'K'
          ELSE CAST((rev_cents*20 + 100) // 200 // 10 AS VARCHAR) || '.' || CAST((rev_cents*20 + 100) // 200 % 10 AS VARCHAR)
        END AS revenue_fmt,
        CASE
          WHEN orders >= 1e12 THEN CAST((ord_cents*20 + 100000000000000) // 200000000000000 // 10 AS VARCHAR) || '.' || CAST((ord_cents*20 + 100000000000000) // 200000000000000 % 10 AS VARCHAR) || 'T'
          WHEN orders >= 1e9  THEN CAST((ord_cents*20 + 100000000000) // 200000000000 // 10 AS VARCHAR) || '.' || CAST((ord_cents*20 + 100000000000) // 200000000000 % 10 AS VARCHAR) || 'B'
          WHEN orders >= 1e6  THEN CAST((ord_cents*20 + 100000000) // 200000000 // 10 AS VARCHAR) || '.' || CAST((ord_cents*20 + 100000000) // 200000000 % 10 AS VARCHAR) || 'M'
          WHEN orders >= 1e3  THEN CAST((ord_cents*20 + 100000) // 200000 // 10 AS VARCHAR) || '.' || CAST((ord_cents*20 + 100000) // 200000 % 10 AS VARCHAR) || 'K'
          ELSE CAST((ord_cents*20 + 100) // 200 // 10 AS VARCHAR) || '.' || CAST((ord_cents*20 + 100) // 200 % 10 AS VARCHAR)
        END AS orders_fmt
      FROM fmt
    """,
    "q17_cosine_topk" -> """
      WITH words AS (
        SELECT doc_id, w AS word, COUNT(*) AS cnt
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
        GROUP BY 1, 2
      ),
      norms AS (SELECT doc_id, sqrt(SUM(cnt*cnt)) AS norm FROM words GROUP BY 1),
      dots AS (
        SELECT a.doc_id AS probe_doc, b.doc_id AS neighbor_doc, SUM(a.cnt*b.cnt) AS dot
        FROM words a JOIN words b ON a.word = b.word AND a.doc_id <> b.doc_id
        WHERE a.doc_id % 50 = 0
        GROUP BY 1, 2
      )
      SELECT probe_doc, neighbor_doc, "rank", cosine FROM (
        SELECT d.probe_doc, d.neighbor_doc,
          CAST(d.dot AS DOUBLE)/(na.norm*nb.norm) AS cosine,
          ROW_NUMBER() OVER (PARTITION BY d.probe_doc
            ORDER BY CAST(d.dot AS DOUBLE)/(na.norm*nb.norm) DESC, d.neighbor_doc ASC) AS "rank"
        FROM dots d
        JOIN norms na ON d.probe_doc = na.doc_id
        JOIN norms nb ON d.neighbor_doc = nb.doc_id
      ) WHERE "rank" <= 5
    """,
    "q18_weighted_recs" -> """
      WITH words AS (
        SELECT doc_id, w AS word, COUNT(*) AS cnt
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
        GROUP BY 1, 2
      ),
      norms AS (SELECT doc_id, sqrt(SUM(cnt*cnt)) AS norm FROM words GROUP BY 1),
      dots AS (
        SELECT a.doc_id AS probe_doc, b.doc_id AS neighbor_doc, SUM(a.cnt*b.cnt) AS dot
        FROM words a JOIN words b ON a.word = b.word AND a.doc_id <> b.doc_id
        WHERE a.doc_id % 50 = 0
        GROUP BY 1, 2
      ),
      sim AS (
        SELECT probe_doc, neighbor_doc, cosine FROM (
          SELECT d.probe_doc, d.neighbor_doc,
            CAST(d.dot AS DOUBLE)/(na.norm*nb.norm) AS cosine,
            ROW_NUMBER() OVER (PARTITION BY d.probe_doc
              ORDER BY CAST(d.dot AS DOUBLE)/(na.norm*nb.norm) DESC, d.neighbor_doc ASC) AS rnk
          FROM dots d
          JOIN norms na ON d.probe_doc = na.doc_id
          JOIN norms nb ON d.neighbor_doc = nb.doc_id
        ) WHERE rnk <= 20
      ),
      mm AS (SELECT MIN(n_chars) AS mn, MAX(n_chars) AS mx FROM documents),
      pop AS (
        SELECT doc_id AS neighbor_doc, lang, source, n_chars,
          CAST(n_chars - mn AS DOUBLE)/(mx - mn) AS pop_norm
        FROM documents, mm
      )
      SELECT probe_doc, neighbor_doc, lang, source, n_chars,
        similarity_score, popularity_score, combined_score, rec_rank
      FROM (
        SELECT s.probe_doc, s.neighbor_doc, p.lang, p.source, p.n_chars,
          0.7 * s.cosine AS similarity_score,
          0.3 * p.pop_norm AS popularity_score,
          0.7 * s.cosine + 0.3 * p.pop_norm AS combined_score,
          ROW_NUMBER() OVER (PARTITION BY s.probe_doc
            ORDER BY 0.7 * s.cosine + 0.3 * p.pop_norm DESC, p.n_chars DESC,
                     s.neighbor_doc ASC) AS rec_rank
        FROM sim s JOIN pop p USING (neighbor_doc)
        WHERE p.n_chars > 0
      ) WHERE rec_rank <= 5
    """,
    "q19_feature_matrix" -> """
      WITH words AS (
        SELECT doc_id, w AS word, COUNT(*) AS cnt
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
        GROUP BY 1, 2
      )
      SELECT doc_id, COUNT(*) AS n_features, sqrt(SUM(cnt*cnt)) AS l2_norm,
        CAST(MAX(cnt) AS DOUBLE)/sqrt(SUM(cnt*cnt)) AS max_weight
      FROM words GROUP BY 1
    """,
    "q20_dedup_exact" -> """
      SELECT sha256(text) AS text_hash, MIN(doc_id) AS keep_doc_id,
        COUNT(*) AS dup_count, CAST(SUM(n_chars) AS BIGINT) AS total_chars
      FROM documents GROUP BY 1
    """,
    "q21_dedup_minhash" -> """
      WITH t AS (
        SELECT doc_id, list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                       for i in range(1, len(w) - 1)]) AS tri
        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
      )
      SELECT doc_a, doc_b, jaccard FROM (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          CAST(len(list_intersect(a.tri, b.tri)) AS DOUBLE) /
            len(list_distinct(a.tri || b.tri)) AS jaccard
        FROM t a JOIN t b ON a.doc_id < b.doc_id
      ) WHERE jaccard >= 0.5
    """,
    "q22_dedup_simhash" -> """
      WITH s AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      th AS (
        SELECT doc_id,
          list_transform(w, x ->
            list_reduce(
              [0::BIGINT] || list_transform(range(1, length(x)+1), i -> ascii(x[i:i])::BIGINT),
              (a, c) -> (a*31 + c) % 4294967296)) AS hs
        FROM s
      ),
      tok AS (
        SELECT doc_id,
          list_transform(hs, h -> CAST(CAST(h AS HUGEINT) * 2654435761 % 4294967296 AS BIGINT)) AS hi_bits,
          list_transform(hs, h -> CAST(CAST(h AS HUGEINT) * 2246822519 % 4294967296 AS BIGINT)) AS lo_bits
        FROM th
      ),
      sim AS (
        SELECT doc_id,
          list_sum([CASE WHEN list_sum(list_transform(hi_bits, t -> 2*((t >> j) & 1) - 1)) >= 0 THEN (1::BIGINT << j) ELSE 0 END for j in range(0, 32)]) AS hi,
          list_sum([CASE WHEN list_sum(list_transform(lo_bits, t -> 2*((t >> j) & 1) - 1)) >= 0 THEN (1::BIGINT << j) ELSE 0 END for j in range(0, 32)]) AS lo
        FROM tok
      )
      SELECT doc_a, doc_b, hamming FROM (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
          CAST(bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) AS BIGINT) AS hamming
        FROM sim a JOIN sim b ON a.doc_id < b.doc_id
      ) WHERE hamming <= 3
    """,
    "q23_ngram_jaccard" -> """
      WITH t AS (
        SELECT doc_id, lang, source,
          list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                         for i in range(1, len(w) - 1)]) AS tri
        FROM (SELECT doc_id, lang, source, string_split(text, ' ') AS w FROM documents)
      )
      SELECT lang, source, doc_a, doc_b, jaccard FROM (
        SELECT a.lang AS lang, a.source AS source,
          a.doc_id AS doc_a, b.doc_id AS doc_b,
          CAST(len(list_intersect(a.tri, b.tri)) AS DOUBLE) /
            len(list_distinct(a.tri || b.tri)) AS jaccard
        FROM t a JOIN t b
          ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
      ) WHERE jaccard >= 0.02
    """,
    "q24_ann_bruteforce" -> """
      WITH e AS (
        SELECT vec_id, embedding,
          sqrt(list_reduce(
            list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
            (a, b) -> a + b)) AS norm
        FROM embeddings
      ),
      scored AS (
        SELECT p.vec_id AS probe_id, n.vec_id AS neighbor_id,
          list_reduce(
            list_transform(range(1, 65),
              i -> CAST(p.embedding[i] AS DOUBLE) * CAST(n.embedding[i] AS DOUBLE)),
            (a, b) -> a + b) / (p.norm * n.norm) AS cosine
        FROM e p JOIN e n ON p.vec_id % 50 = 0 AND p.vec_id <> n.vec_id
      )
      SELECT probe_id, neighbor_id, "rank", cosine FROM (
        SELECT probe_id, neighbor_id, cosine,
          ROW_NUMBER() OVER (PARTITION BY probe_id
            ORDER BY cosine DESC, neighbor_id ASC) AS "rank"
        FROM scored
      ) WHERE "rank" <= 10
    """,
    "q26_lang_id" -> """
      WITH s AS (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents),
      scored AS (
        SELECT doc_id, lang,
          CAST(len(list_filter(w, x -> x IN ('batch','window','hash'))) AS DOUBLE)/len(w) AS score_de,
          CAST(len(list_filter(w, x -> x IN ('scan','filter','join'))) AS DOUBLE)/len(w) AS score_en,
          CAST(len(list_filter(w, x -> x IN ('table','key','agg'))) AS DOUBLE)/len(w) AS score_es,
          CAST(len(list_filter(w, x -> x IN ('row','column','value'))) AS DOUBLE)/len(w) AS score_fr,
          CAST(len(list_filter(w, x -> x IN ('data','fast','slow'))) AS DOUBLE)/len(w) AS score_zh
        FROM s
      )
      SELECT doc_id, lang,
        CASE
          WHEN score_de = greatest(score_de, score_en, score_es, score_fr, score_zh) THEN 'de'
          WHEN score_en = greatest(score_de, score_en, score_es, score_fr, score_zh) THEN 'en'
          WHEN score_es = greatest(score_de, score_en, score_es, score_fr, score_zh) THEN 'es'
          WHEN score_fr = greatest(score_de, score_en, score_es, score_fr, score_zh) THEN 'fr'
          WHEN score_zh = greatest(score_de, score_en, score_es, score_fr, score_zh) THEN 'zh'
        END AS predicted_lang,
        score_de, score_en, score_es, score_fr, score_zh
      FROM scored
    """,
    "q27_quality_score" -> """
      WITH s AS (SELECT doc_id, n_chars, string_split(text, ' ') AS w FROM documents)
      SELECT doc_id, len(w) AS n_words,
        CAST(n_chars - len(w) + 1 AS DOUBLE)/len(w) AS avg_word_len,
        CAST(len(list_filter(w, x -> x IN ('join','hash','row'))) AS DOUBLE)/len(w) AS stopword_ratio,
        least(CAST(len(w) AS DOUBLE)/50.0, 1.0) * 0.4
          + (1.0 - CAST(len(list_filter(w, x -> x IN ('join','hash','row'))) AS DOUBLE)/len(w)) * 0.3
          + least((CAST(n_chars - len(w) + 1 AS DOUBLE)/len(w))/6.0, 1.0) * 0.3 AS quality_score
      FROM s
    """,
    "q28_token_count" -> """
      SELECT doc_id, len(string_split(text, ' ')) AS ws_tokens,
        len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS re_tokens,
        CAST(n_chars AS DOUBLE)/len(string_split(text, ' ')) AS chars_per_token
      FROM documents
    """,
    "q29_fingerprint" -> """
      SELECT doc_id,
        list_min([list_reduce(
            list_transform(w[i:i+7], x -> (length(x)*131 + ascii(x))::BIGINT),
            (a, b) -> a*31 + b)
          for i in range(1, len(w) - 6)]) AS fingerprint,
        len(w) AS n_words
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
    """,
    "q31_multimodal_features" -> """
      SELECT doc_id,
        CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS media_type,
        n_chars AS media_len,
        n_chars % 640 AS width,
        n_chars % 480 AS height,
        CAST(list_sum(list_transform(range(1, length(text) + 1),
          i -> ascii(text[i:i]))) AS DOUBLE) / length(text) AS mean_byte,
        sha256(text) AS content_hash
      FROM documents
    """,
    "q33_json_extract" -> """
      WITH e AS (
        SELECT *, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events
      )
      SELECT k % 10 AS k_bucket,
        COUNT(*) AS events,
        COUNT(DISTINCT user_id) AS users,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum,
        MIN(k) AS min_k, MAX(k) AS max_k
      FROM e GROUP BY 1
    """,
    "q34_timezone" -> """
      WITH e AS (
        SELECT user_id, timezone('America/New_York', timezone('UTC', ts)) AS ny_ts
        FROM events
      )
      SELECT CAST(ny_ts AS DATE) AS ny_day,
        COUNT(*) AS events,
        COUNT(DISTINCT user_id) AS users,
        strftime(MIN(ny_ts), '%Y-%m-%d %H:%M:%S') AS first_event_ny
      FROM e GROUP BY 1
    """,
    "q35_percentiles" -> """
      SELECT event_type,
        quantile_cont(value, 0.5) AS p50,
        quantile_cont(value, 0.95) AS p95,
        quantile_cont(value, 0.75) AS p75,
        COUNT(*) AS events
      FROM events GROUP BY 1
    """,
    "q36_rollup" -> """
      SELECT r_name, n_name, COUNT(*) AS suppliers,
        CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS acctbal_sum,
        GROUPING(r_name, n_name) AS gid
      FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY ROLLUP(r_name, n_name)
    """,
    "q37_running_window" -> """
      WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS events,
          CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
        FROM events GROUP BY 1, 2
      )
      SELECT *,
        CAST(SUM(events) OVER (PARTITION BY event_type ORDER BY day
          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS events_running,
        AVG(events) OVER (PARTITION BY event_type ORDER BY day
          ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS events_ma7
      FROM daily
    """,
    "q38_asof_join" -> """
      WITH u AS (
        SELECT user_id AS k, ts AS t, event_id, event_type,
          CAST(NULL AS BIGINT) AS o_orderkey, CAST(NULL AS DOUBLE) AS o_totalprice,
          1 AS is_event
        FROM events
        UNION ALL
        SELECT o_custkey, CAST(o_orderdate AS TIMESTAMP), NULL, NULL,
          o_orderkey, o_totalprice, 0
        FROM orders
      ),
      w AS (
        SELECT *,
          last_value(o_orderkey IGNORE NULLS) OVER
            (PARTITION BY k ORDER BY t, is_event, o_orderkey
             ROWS UNBOUNDED PRECEDING) AS asof_orderkey,
          last_value(o_totalprice IGNORE NULLS) OVER
            (PARTITION BY k ORDER BY t, is_event, o_orderkey
             ROWS UNBOUNDED PRECEDING) AS asof_totalprice
        FROM u
      )
      SELECT event_type, COUNT(*) AS events,
        COUNT(asof_orderkey) AS matched,
        CAST(SUM(CAST(asof_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS asof_price_sum,
        MIN(asof_orderkey) AS min_orderkey,
        MAX(asof_orderkey) AS max_orderkey
      FROM w WHERE is_event = 1 GROUP BY 1
    """,
    "q39_range_join" -> """
      WITH per_purchase AS (
        SELECT p.event_id, p.user_id,
          COUNT(CASE WHEN c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts < p.ts
                     THEN 1 END) AS clicks_before
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON c.user_id = p.user_id
        GROUP BY 1, 2
      )
      SELECT clicks_before, COUNT(*) AS purchases
      FROM per_purchase GROUP BY 1
    """,
    "q40_hash_split" -> """
      WITH s AS (
        SELECT *, CASE
          WHEN (doc_id * 2654435761) % 4294967296 % 100 < 80 THEN 'train'
          WHEN (doc_id * 2654435761) % 4294967296 % 100 < 90 THEN 'validation'
          ELSE 'test' END AS split
        FROM documents
      )
      SELECT split, lang, COUNT(*) AS docs, CAST(SUM(n_chars) AS BIGINT) AS chars,
        MIN(doc_id) AS min_doc_id
      FROM s GROUP BY 1, 2
    """,
    "q41_dedup_pipeline" -> """
      WITH RECURSIVE
      t AS (
        SELECT doc_id, text, list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                       for i in range(1, len(w) - 1)]) AS tri
        FROM (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents)
      ),
      exact_pairs AS (
        SELECT a.doc_id AS src, b.doc_id AS dst
        FROM t a JOIN t b ON a.text = b.text AND a.doc_id <> b.doc_id
      ),
      near_pairs AS (
        SELECT a.doc_id AS src, b.doc_id AS dst FROM t a JOIN t b ON a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.tri, b.tri)) AS DOUBLE) /
              len(list_distinct(a.tri || b.tri)) >= 0.5
      ),
      edges AS (
        SELECT src, dst FROM exact_pairs
        UNION SELECT src, dst FROM near_pairs
        UNION SELECT dst, src FROM near_pairs
      ),
      reach AS (
        SELECT src, dst FROM edges
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
      ),
      rep AS (
        SELECT d.doc_id, LEAST(d.doc_id, COALESCE(MIN(r.dst), d.doc_id)) AS rep
        FROM t d LEFT JOIN reach r ON r.src = d.doc_id
        GROUP BY d.doc_id
      )
      SELECT COUNT(*) AS docs,
        CAST(SUM(CASE WHEN rep = doc_id THEN 1 ELSE 0 END) AS BIGINT) AS kept_docs,
        CAST(SUM(CASE WHEN rep <> doc_id THEN 1 ELSE 0 END) AS BIGINT) AS removed_docs,
        COUNT(DISTINCT rep) AS clusters
      FROM rep
    """,
    "q43_stratified_sample" -> """
      WITH s AS (
        SELECT *,
          CASE WHEN lang = 'en' THEN 500 WHEN lang = 'de' THEN 350
               WHEN lang = 'fr' THEN 250 WHEN lang = 'es' THEN 200
               ELSE 100 END AS permille,
          (doc_id * 2654435761) % 4294967296 % 1000 AS h
        FROM documents
      ),
      k AS (SELECT *, h < permille AS kept FROM s)
      SELECT lang, COUNT(*) AS docs,
        CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS kept_docs,
        CAST(SUM(CASE WHEN kept THEN n_chars END) AS BIGINT) AS kept_chars,
        MIN(CASE WHEN kept THEN doc_id END) AS min_kept_doc_id,
        CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS achieved_rate
      FROM k GROUP BY lang
    """,
    "q46_pii_redact" -> """
      WITH pii AS (
        SELECT doc_id,
          text ||
          CASE WHEN doc_id % 5 = 0 THEN ' contact u' || CAST(doc_id AS VARCHAR) || '@mail.test now' ELSE '' END ||
          CASE WHEN doc_id % 7 = 0 THEN ' call 555-' || printf('%03d', doc_id % 1000) || '-' || printf('%04d', doc_id % 10000) ELSE '' END ||
          CASE WHEN doc_id % 9 = 0 THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.' || CAST((doc_id * 7) % 256 AS VARCHAR) ELSE '' END AS raw
        FROM documents
      ),
      cleaned AS (
        SELECT *, regexp_replace(regexp_replace(regexp_replace(raw,
            '[a-z0-9._-]+@[a-z0-9-]+\.[a-z]+', '<EMAIL>', 'g'),
            '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g'),
            '[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS clean
        FROM pii
      )
      SELECT doc_id,
        len(regexp_extract_all(raw, '[a-z0-9._-]+@[a-z0-9-]+\.[a-z]+')) AS emails,
        len(regexp_extract_all(raw, '[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS phones,
        len(regexp_extract_all(raw, '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) AS ips,
        sha256(clean) AS clean_hash,
        length(raw) AS raw_len, length(clean) AS clean_len
      FROM cleaned
    """,
    "q47_repetition" -> """
      WITH s AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      t AS (
        SELECT doc_id, len(w) AS n_words,
          1.0 - CAST(len(list_distinct(w)) AS DOUBLE)/len(w) AS dup_word_frac,
          CASE WHEN len(w) >= 3 THEN
            1.0 - CAST(len(list_distinct([w[i]||' '||w[i+1]||' '||w[i+2] for i in range(1, len(w)-1)])) AS DOUBLE)
                  / (len(w)-2)
            ELSE 0.0 END AS dup_tri_frac,
          CAST(list_max([len(list_filter(w, y -> y = x)) for x in list_distinct(w)]) AS DOUBLE)/len(w) AS top_word_frac
        FROM s
      )
      SELECT *, dup_word_frac > 0.9 OR dup_tri_frac > 0.5 OR top_word_frac > 0.3 AS flagged FROM t
    """,
    "q44_contamination" -> """
      WITH t AS (
        SELECT doc_id, list_distinct([array_to_string(w[i:i+7], ' ')
                       for i in range(1, len(w) - 6)]) AS ng
        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
      ),
      p AS (SELECT doc_id, unnest(ng) AS ng FROM t),
      b AS (SELECT doc_id AS bdoc, ng FROM p WHERE doc_id % 10 = 0),
      c AS (SELECT doc_id, ng FROM p WHERE doc_id % 10 <> 0)
      SELECT c.doc_id,
        COUNT(DISTINCT c.ng) AS shared_ngrams,
        COUNT(DISTINCT b.bdoc) AS benchmark_docs
      FROM c JOIN b ON c.ng = b.ng
      GROUP BY 1
    """,
    "q69_pacing" -> """
      WITH o AS (
        SELECT o_orderpriority AS priority, CAST(o_orderdate AS DATE) AS day,
          CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
      ),
      a AS (
        SELECT
          CAST(date_trunc('month', MAX(day)) AS DATE) AS cur_m,
          CAST(date_trunc('month', MAX(day)) - INTERVAL 1 MONTH AS DATE)
            AS prev_m,
          CAST(EXTRACT(day FROM MAX(day)) AS BIGINT) AS days_elapsed,
          CAST(EXTRACT(day FROM last_day(MAX(day))) AS BIGINT)
            AS days_in_month
        FROM o
      ),
      g AS (
        SELECT priority,
          CAST(SUM(CASE WHEN day >= prev_m AND day < cur_m
                        THEN cents ELSE 0 END) AS BIGINT)
            AS prev_month_cents,
          CAST(SUM(CASE WHEN day >= cur_m THEN cents ELSE 0 END) AS BIGINT)
            AS mtd_cents,
          MAX(days_elapsed) AS days_elapsed,
          MAX(days_in_month) AS days_in_month
        FROM o CROSS JOIN a GROUP BY 1
      ),
      d AS (
        SELECT *,
          (prev_month_cents * 11) // 10 AS forecast_cents,
          (mtd_cents * days_in_month) // days_elapsed AS projected_cents
        FROM g
      )
      SELECT priority, prev_month_cents, mtd_cents, days_elapsed,
        days_in_month, forecast_cents, projected_cents,
        CASE WHEN forecast_cents > 0
          THEN (mtd_cents * 10000) // forecast_cents END AS attainment_bp,
        CASE WHEN forecast_cents > 0
          THEN (projected_cents * 10000) // forecast_cents END AS pace_bp,
        CASE WHEN forecast_cents <= 0 THEN 'no_forecast'
             WHEN (projected_cents * 10000) // forecast_cents >= 10000
               THEN 'on_track'
             ELSE 'behind' END AS status
      FROM d
    """,
    "q70_refresh_select" -> s"""
      WITH a AS (SELECT MAX(ts) AS anchor_ts FROM events),
      t AS (
        SELECT user_id, COUNT(*) AS events_30d,
          CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT)
            AS value_cents_30d,
          MAX(ts) AS last_seen,
          MAX(anchor_ts) AS anchor_ts
        FROM events CROSS JOIN a
        WHERE ts >= anchor_ts - INTERVAL 30 DAY
        GROUP BY 1
        HAVING COUNT(*) >= 5
      ),
      ig AS (
        SELECT c_custkey AS user_id FROM customer
        WHERE ${mix32Sql("c_custkey")} % 20 = 0
      ),
      m AS (
        SELECT c_custkey AS user_id, c_mktsegment AS segment,
          (c_acctbal >= 0) AS is_monetized
        FROM customer
      )
      SELECT t.user_id, t.events_30d, t.value_cents_30d, m.segment,
        epoch_us(t.last_seen) AS last_seen_us,
        (m.segment IS NULL
         OR t.last_seen <= t.anchor_ts - INTERVAL 6 DAY) AS needs_refresh
      FROM t LEFT JOIN m ON t.user_id = m.user_id
      WHERE t.user_id NOT IN (SELECT user_id FROM ig)
        AND (m.is_monetized IS NULL OR NOT m.is_monetized)
    """,
    "q72_corpus_rarity" -> """
      WITH words AS (
        SELECT doc_id, w AS word, COUNT(*) AS cnt
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
              FROM documents)
        GROUP BY 1, 2
      ),
      u AS (SELECT word, CAST(SUM(cnt) AS BIGINT) AS ctf
            FROM words GROUP BY 1),
      tot AS (SELECT CAST(SUM(ctf) AS BIGINT) AS n_total FROM u),
      d AS (
        SELECT w.doc_id,
          CAST(SUM(w.cnt) AS BIGINT) AS n_tokens,
          CAST(SUM(w.cnt * ((1000000 * u.ctf) // (SELECT n_total FROM tot)))
            AS BIGINT) AS ppm_sum,
          CAST(SUM(CASE WHEN u.ctf = 1 THEN w.cnt ELSE 0 END) AS BIGINT)
            AS hapax_tokens
        FROM words w JOIN u USING (word)
        GROUP BY 1
      ),
      s AS (
        SELECT doc_id, n_tokens,
          ppm_sum // n_tokens AS mean_ppm,
          (hapax_tokens * 10000) // n_tokens AS hapax_bp
        FROM d
      ),
      q AS (
        SELECT quantile_cont(mean_ppm, 0.25) AS p25,
          quantile_cont(mean_ppm, 0.75) AS p75
        FROM s
      )
      SELECT doc_id, n_tokens, mean_ppm, hapax_bp,
        CASE WHEN hapax_bp > 2500 THEN 'noisy'
             WHEN CAST(mean_ppm AS DOUBLE) < p25 THEN 'rare'
             WHEN CAST(mean_ppm AS DOUBLE) > p75 THEN 'common'
             ELSE 'mid' END AS bucket
      FROM s CROSS JOIN q
    """,
    "q73_incremental_dedup" -> """
      WITH t AS (
        SELECT doc_id, text,
          list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                         for i in range(1, len(w) - 1)]) AS tri
        FROM (SELECT doc_id, text, string_split(text, ' ') AS w
              FROM documents)
      ),
      b AS (SELECT * FROM t WHERE doc_id % 10 = 0),
      ix AS (SELECT * FROM t WHERE doc_id % 10 <> 0),
      ex AS (
        SELECT b.doc_id, COUNT(*) AS exact_hits
        FROM b JOIN ix ON b.text = ix.text GROUP BY 1
      ),
      nd AS (
        SELECT doc_id, COUNT(*) AS near_dups, MAX(j) AS max_jaccard FROM (
          SELECT b.doc_id AS doc_id,
            CAST(len(list_intersect(b.tri, ix.tri)) AS DOUBLE) /
              len(list_distinct(b.tri || ix.tri)) AS j
          FROM b JOIN ix ON len(b.tri) > 0 AND len(ix.tri) > 0
        ) WHERE j >= 0.5 GROUP BY 1
      )
      SELECT b.doc_id,
        (ex.exact_hits IS NOT NULL) AS dup_exact,
        CAST(COALESCE(nd.near_dups, 0) AS BIGINT) AS near_dups,
        nd.max_jaccard,
        (ex.exact_hits IS NOT NULL OR nd.near_dups IS NOT NULL) AS is_dup
      FROM b LEFT JOIN ex ON b.doc_id = ex.doc_id
      LEFT JOIN nd ON b.doc_id = nd.doc_id
    """,
    "q74_token_budget" -> s"""
      WITH s AS (
        SELECT doc_id, n_chars, string_split(text, ' ') AS w FROM documents
      ),
      q AS (
        SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
          CAST(FLOOR((least(CAST(len(w) AS DOUBLE)/50.0, 1.0) * 0.4
            + (1.0 - CAST(len(list_filter(w, x -> x IN ('join','hash','row')))
                     AS DOUBLE)/len(w)) * 0.3
            + least((CAST(n_chars - len(w) + 1 AS DOUBLE)/len(w))/6.0, 1.0)
              * 0.3) * 10) AS BIGINT) AS tier,
          ${mix32Sql("doc_id")} AS hv
        FROM s
      ),
      bdg AS (SELECT (SUM(n_tokens) * 6) // 10 AS budget_toks FROM q),
      c AS (
        SELECT doc_id, tier, n_tokens,
          COALESCE(SUM(n_tokens) OVER (ORDER BY tier DESC, hv ASC, doc_id ASC
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_tok
        FROM q
      )
      SELECT doc_id, tier, n_tokens, CAST(start_tok AS BIGINT) AS start_tok,
        (start_tok + n_tokens > (SELECT budget_toks FROM bdg)) AS partial
      FROM c WHERE start_tok < (SELECT budget_toks FROM bdg)
    """,
    "q75_chunking" -> """
      WITH s AS (
        SELECT doc_id, string_split(text, ' ') AS w,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS n
        FROM documents
      ),
      c AS (
        SELECT doc_id, w, n,
          CASE WHEN n <= 64 THEN 1 ELSE 1 + (n - 64 + 47) // 48 END
            AS n_chunks
        FROM s
      )
      SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
        CAST(i * 48 AS BIGINT) AS start_tok,
        CAST(LEAST(64, n - i * 48) AS BIGINT) AS chunk_toks,
        array_to_string(w[i * 48 + 1 : i * 48 + LEAST(64, n - i * 48)], ' ')
          AS chunk_text
      FROM c CROSS JOIN unnest(range(0, n_chunks)) AS t(i)
    """,
    "q76_mixture_report" -> """
      WITH base AS (
        SELECT lang, source, COUNT(*) AS docs,
          CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens
        FROM documents GROUP BY 1, 2
      ),
      t AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_domains,
          CAST(SUM(tokens) AS BIGINT) AS total_tokens
        FROM base
      )
      SELECT lang, source, docs, tokens,
        (tokens * 1000000) // total_tokens AS share_ppm,
        LEAST((1000000 // n_domains) * 100
                // GREATEST((tokens * 1000000) // total_tokens, 1),
              1000) AS uniform_weight_pct
      FROM base CROSS JOIN t
    """,
    // the oracle is the FULL-history rollup: hash equality proves the
    // merged incremental state equals a complete recompute
    "q77_incremental_rollup" -> """
      SELECT o_orderpriority AS priority,
        CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
          AS total_cents,
        COUNT(*) AS n_orders,
        MIN(CAST(o_orderdate AS DATE)) AS first_day,
        MAX(CAST(o_orderdate AS DATE)) AS last_day,
        CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
          // COUNT(*) AS avg_cents
      FROM orders GROUP BY 1
    """,
    "q78_session_funnel" -> """
      WITH flagged AS (
        SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
          CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
                 OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
               THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
      ),
      sess AS (
        SELECT user_id, event_id, event_type, ts_us,
          SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                            ROWS UNBOUNDED PRECEDING) AS session_seq
        FROM flagged
      ),
      s1 AS (
        SELECT *, MIN(CASE WHEN event_type = 'view' THEN ts_us END)
          OVER (PARTITION BY user_id, session_seq) AS v
        FROM sess
      ),
      s2 AS (
        SELECT *, MIN(CASE WHEN event_type = 'click' AND ts_us >= v
                           THEN ts_us END)
          OVER (PARTITION BY user_id, session_seq) AS c
        FROM s1
      ),
      s3 AS (
        SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts_us >= c
                           THEN ts_us END)
          OVER (PARTITION BY user_id, session_seq) AS p
        FROM s2
      ),
      per AS (
        SELECT user_id, session_seq, MAX(v) AS v, MAX(c) AS c, MAX(p) AS p
        FROM s3 GROUP BY 1, 2
      ),
      agg AS (
        SELECT COUNT(*) AS sessions,
          COUNT(v) AS with_view,
          COUNT(c) AS view_then_click,
          COUNT(p) AS full_path
        FROM per
      )
      SELECT sessions, with_view, view_then_click, full_path,
        CASE WHEN with_view > 0
          THEN (view_then_click * 10000) // with_view END AS click_conv_bp,
        CASE WHEN view_then_click > 0
          THEN (full_path * 10000) // view_then_click END AS purchase_conv_bp
      FROM agg
    """,
    "q79_containment" -> """
      WITH t AS (
        SELECT doc_id,
          list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]
                         for i in range(1, len(w) - 2)]) AS ng
        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
      ),
      p AS (
        SELECT a.doc_id AS da, b.doc_id AS db,
          CAST(len(list_intersect(a.ng, b.ng)) AS BIGINT) AS inter,
          CAST(len(a.ng) AS BIGINT) AS na, CAST(len(b.ng) AS BIGINT) AS nb
        FROM t a JOIN t b ON a.doc_id < b.doc_id
        WHERE len(list_intersect(a.ng, b.ng)) > 0
      )
      SELECT doc_src, doc_tgt, inter, size_src,
        CAST(inter AS DOUBLE) / size_src AS containment
      FROM (
        SELECT da AS doc_src, db AS doc_tgt, inter, na AS size_src FROM p
        UNION ALL
        SELECT db AS doc_src, da AS doc_tgt, inter, nb AS size_src FROM p
      ) WHERE CAST(inter AS DOUBLE) / size_src >= 0.5
    """,
    "q80_tokenize" -> """
      WITH words AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
      ),
      vocab AS (
        SELECT w AS term FROM (
          SELECT w, COUNT(*) AS cnt FROM words GROUP BY 1
        ) ORDER BY cnt DESC, w ASC LIMIT 24
      )
      SELECT doc_id,
        CAST(COUNT(*) AS BIGINT) AS n_words,
        CAST(COUNT(CASE WHEN v.term IS NULL THEN 1 END) AS BIGINT) AS oov_words,
        CAST(SUM(CASE WHEN v.term IS NOT NULL THEN 1 ELSE len(w) END) AS BIGINT)
          AS n_tokens,
        CAST(COUNT(CASE WHEN v.term IS NULL THEN 1 END) AS DOUBLE) / COUNT(*)
          AS oov_rate
      FROM words LEFT JOIN vocab v ON words.w = v.term
      GROUP BY doc_id
    """,
    "q81_chisq_drift" -> """
      WITH cells AS (
        SELECT source, w AS term, CAST(COUNT(*) AS BIGINT) AS o
        FROM (SELECT source, unnest(string_split(text, ' ')) AS w FROM documents)
        GROUP BY 1, 2
      ),
      rt AS (SELECT source, CAST(SUM(o) AS BIGINT) AS r_tot FROM cells GROUP BY 1),
      ct AS (
        SELECT term, CAST(SUM(o) AS BIGINT) AS c_tot,
          CAST(COUNT(*) AS BIGINT) AS n_sources
        FROM cells GROUP BY 1
      ),
      nt AS (SELECT CAST(SUM(r_tot) AS BIGINT) AS n_tot FROM rt),
      contrib AS (
        SELECT c.term, ct.c_tot, ct.n_sources,
          CAST(floor((CAST(c.o AS DOUBLE) - e) * (CAST(c.o AS DOUBLE) - e) / e
            * 1000000.0) AS BIGINT) AS chi2_micro
        FROM (
          SELECT c.source, c.term, c.o,
            CAST(rt.r_tot AS DOUBLE) * CAST(ct.c_tot AS DOUBLE)
              / CAST((SELECT n_tot FROM nt) AS DOUBLE) AS e
          FROM cells c JOIN rt USING (source) JOIN ct USING (term)
        ) c JOIN ct USING (term)
      )
      SELECT term, chi2_micro_sum, term_total, n_sources, drift_rank FROM (
        SELECT term,
          CAST(SUM(chi2_micro) AS BIGINT) AS chi2_micro_sum,
          MAX(c_tot) AS term_total,
          MAX(n_sources) AS n_sources,
          ROW_NUMBER() OVER (ORDER BY SUM(chi2_micro) DESC, term ASC)
            AS drift_rank
        FROM contrib GROUP BY term
      ) WHERE drift_rank <= 20
    """,
    "q82_pq_ann" -> s"""
      WITH ${pqCtes(m = 8, k = 16, iters = 3)},
      enc AS (
        SELECT vec_id, sub, code FROM (
          SELECT vs.vec_id, vs.sub, c.code,
            ROW_NUMBER() OVER (PARTITION BY vs.vec_id, vs.sub
              ORDER BY ${pqSdist("vs.sq", "c.cq", 8)} ASC, c.code ASC) AS rn
          FROM vs JOIN pc3 c ON vs.sub = c.sub
        ) WHERE rn = 1
      ),
      adc AS (
        SELECT p.vec_id AS probe_id, e.vec_id AS neighbor_id,
          CAST(SUM(${pqSdist("p.sq", "cb.cq", 8)}) AS BIGINT) AS adc_dist
        FROM vs p
        JOIN enc e ON p.sub = e.sub
        JOIN pc3 cb ON cb.sub = e.sub AND cb.code = e.code
        WHERE p.vec_id % 50 = 0 AND e.vec_id <> p.vec_id
        GROUP BY 1, 2
      ),
      short AS (
        SELECT probe_id, neighbor_id, adc_dist FROM (
          SELECT probe_id, neighbor_id, adc_dist,
            ROW_NUMBER() OVER (PARTITION BY probe_id
              ORDER BY adc_dist ASC, neighbor_id ASC) AS adc_rank
          FROM adc
        ) WHERE adc_rank <= (SELECT GREATEST(300, COUNT(*) * 3 // 20) FROM v)
      ),
      rerank AS (
        SELECT s.probe_id, s.neighbor_id, s.adc_dist,
          CAST(list_sum(list_transform(range(1, 65),
            j -> (p.q[j]-n.q[j])*(p.q[j]-n.q[j]))) AS BIGINT) AS dist
        FROM short s
        JOIN v p ON s.probe_id = p.vec_id
        JOIN v n ON s.neighbor_id = n.vec_id
      )
      SELECT probe_id, neighbor_id, "rank", adc_dist, dist FROM (
        SELECT probe_id, neighbor_id, adc_dist, dist,
          ROW_NUMBER() OVER (PARTITION BY probe_id
            ORDER BY dist ASC, neighbor_id ASC) AS "rank"
        FROM rerank
      ) WHERE "rank" <= 10
    """,
    // the q88 oracle replays the ENTIRE persisted-index lifecycle:
    // coarse-quantizer training (kmeansCtes — identical to q45's),
    // PQ codebook training (pqCtes — identical to q82's, sharing the
    // quantized-vector CTE v), corpus cell assignment + encode, 6-cell
    // probe fan-out, candidate = cell match, ADC shortlist (serveShortlist
    // = 15% of the design-constant candidate pool), exact
    // integer rerank top-10 — proving the artifact's build AND serve
    // paths end-to-end, not just the in-query twin.
    "q88_ivfpq_probe" -> s"""
      WITH ${kmeansCtes("SELECT GREATEST(16, COUNT(*) // 1250) FROM v", iters = 5)},
      ${pqCtes(m = 8, k = 16, iters = 3, defineV = false)},
      ad AS (
        SELECT v.vec_id, c.cluster,
          ROW_NUMBER() OVER (PARTITION BY v.vec_id
            ORDER BY ${qDist("c")} ASC, c.cluster ASC) AS rn
        FROM v CROSS JOIN c5 c
      ),
      corpus_cell AS (SELECT vec_id, cluster FROM ad WHERE rn = 1),
      probe_cell AS (
        SELECT vec_id, cluster FROM ad WHERE rn <= 6 AND vec_id % 50 = 0
      ),
      enc AS (
        SELECT vec_id, sub, code FROM (
          SELECT vs.vec_id, vs.sub, c.code,
            ROW_NUMBER() OVER (PARTITION BY vs.vec_id, vs.sub
              ORDER BY ${pqSdist("vs.sq", "c.cq", 8)} ASC, c.code ASC) AS rn
          FROM vs JOIN pc3 c ON vs.sub = c.sub
        ) WHERE rn = 1
      ),
      cand AS (
        SELECT pr.vec_id AS probe_id, co.vec_id AS neighbor_id
        FROM probe_cell pr JOIN corpus_cell co ON pr.cluster = co.cluster
        WHERE pr.vec_id <> co.vec_id
      ),
      adc AS (
        SELECT ca.probe_id, ca.neighbor_id,
          CAST(SUM(${pqSdist("p.sq", "cb.cq", 8)}) AS BIGINT) AS adc_dist
        FROM cand ca
        JOIN vs p ON p.vec_id = ca.probe_id
        JOIN enc e ON e.vec_id = ca.neighbor_id AND e.sub = p.sub
        JOIN pc3 cb ON cb.sub = e.sub AND cb.code = e.code
        GROUP BY 1, 2
      ),
      short AS (
        SELECT probe_id, neighbor_id, adc_dist FROM (
          SELECT probe_id, neighbor_id, adc_dist,
            ROW_NUMBER() OVER (PARTITION BY probe_id
              ORDER BY adc_dist ASC, neighbor_id ASC) AS adc_rank
          FROM adc
        ) WHERE adc_rank <= ${graft.sources.IvfIndex.serveShortlist(6)}
      ),
      rerank AS (
        SELECT s.probe_id, s.neighbor_id, s.adc_dist,
          CAST(list_sum(list_transform(range(1, 65),
            j -> (p.q[j]-n.q[j])*(p.q[j]-n.q[j]))) AS BIGINT) AS dist
        FROM short s
        JOIN v p ON s.probe_id = p.vec_id
        JOIN v n ON s.neighbor_id = n.vec_id
      )
      SELECT probe_id, neighbor_id, "rank", adc_dist, dist FROM (
        SELECT probe_id, neighbor_id, adc_dist, dist,
          ROW_NUMBER() OVER (PARTITION BY probe_id
            ORDER BY dist ASC, neighbor_id ASC) AS "rank"
        FROM rerank
      ) WHERE "rank" <= 10
    """,
    "q83_dup_span" -> """
      WITH g AS (
        SELECT doc_id, i AS pos,
          w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] AS gram
        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        CROSS JOIN LATERAL (SELECT unnest(range(1, len(w) - 2)) AS i)
        WHERE len(w) >= 4
      ),
      shared AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
          a.pos - b.pos AS delta, a.pos AS ia
        FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
      ),
      runs AS (
        SELECT doc_a, doc_b, delta,
          ia - ROW_NUMBER() OVER (PARTITION BY doc_a, doc_b, delta
                                  ORDER BY ia) AS isl
        FROM shared
      ),
      islands AS (
        SELECT doc_a, doc_b, delta, isl,
          CAST(COUNT(*) + 3 AS BIGINT) AS span_words
        FROM runs GROUP BY 1, 2, 3, 4
      )
      SELECT doc_a, doc_b,
        MAX(span_words) AS max_span,
        CAST(COUNT(*) AS BIGINT) AS aligned_runs
      FROM islands GROUP BY 1, 2 HAVING MAX(span_words) >= 10
    """,
    "q84_embed_stats" -> """
      WITH v AS (
        SELECT vec_id,
          list_transform(embedding,
            x -> CAST(floor(CAST(x AS DOUBLE) * 16777216.0) AS BIGINT)) AS q
        FROM embeddings
      ),
      pos AS (
        SELECT vec_id, i, q[i + 1] AS x
        FROM v CROSS JOIN (SELECT unnest(range(0, 64)) AS i) dims
      ),
      d AS (
        SELECT i, CAST(COUNT(*) AS BIGINT) AS n, SUM(x) AS sx, SUM(x*x) AS sxx
        FROM pos GROUP BY 1
      ),
      pairs AS (
        SELECT a.i AS i, b.i AS j, SUM(a.x * b.x) AS sxy
        FROM pos a JOIN pos b ON a.vec_id = b.vec_id AND a.i < b.i
        GROUP BY 1, 2
      ),
      scored AS (
        SELECT p.i, p.j, di.n,
          (CAST(di.n AS DOUBLE) * CAST(p.sxy AS DOUBLE)
            - CAST(di.sx AS DOUBLE) * CAST(dj.sx AS DOUBLE))
          / (sqrt(CAST(di.n AS DOUBLE) * CAST(di.sxx AS DOUBLE)
              - CAST(di.sx AS DOUBLE) * CAST(di.sx AS DOUBLE))
             * sqrt(CAST(di.n AS DOUBLE) * CAST(dj.sxx AS DOUBLE)
                - CAST(dj.sx AS DOUBLE) * CAST(dj.sx AS DOUBLE))) AS corr
        FROM pairs p JOIN d di ON p.i = di.i JOIN d dj ON p.j = dj.i
      )
      SELECT i, j, n, corr, pair_rank FROM (
        SELECT i, j, n, corr,
          ROW_NUMBER() OVER (ORDER BY abs(corr) DESC, i ASC, j ASC) AS pair_rank
        FROM scored
      ) WHERE pair_rank <= 20
    """,
    "q85_snapshot_diff" -> s"""
      WITH m AS (
        SELECT doc_id, source, text, ${mix32Sql("doc_id")} AS mix FROM documents
      ),
      old AS (
        SELECT doc_id, source AS src_old,
          sha256(CASE WHEN mix % 7 = 0 THEN text || ' legacy' ELSE text END)
            AS hash_old
        FROM m WHERE mix % 10 <> 0
      ),
      neu AS (
        SELECT doc_id, source AS src_new, sha256(text) AS hash_new
        FROM m WHERE mix % 11 <> 5
      ),
      classified AS (
        SELECT COALESCE(n.src_new, o.src_old) AS source,
          CASE WHEN o.hash_old IS NULL THEN 'added'
               WHEN n.hash_new IS NULL THEN 'removed'
               WHEN o.hash_old <> n.hash_new THEN 'changed'
               ELSE 'unchanged' END AS status
        FROM old o FULL OUTER JOIN neu n ON o.doc_id = n.doc_id
      )
      SELECT source,
        CAST(COUNT(CASE WHEN status = 'added' THEN 1 END) AS BIGINT) AS added,
        CAST(COUNT(CASE WHEN status = 'removed' THEN 1 END) AS BIGINT) AS removed,
        CAST(COUNT(CASE WHEN status = 'changed' THEN 1 END) AS BIGINT) AS changed,
        CAST(COUNT(CASE WHEN status = 'unchanged' THEN 1 END) AS BIGINT) AS unchanged,
        (COUNT(CASE WHEN status = 'added' THEN 1 END)
          + COUNT(CASE WHEN status = 'removed' THEN 1 END)
          + COUNT(CASE WHEN status = 'changed' THEN 1 END)) * 10000
          // COUNT(*) AS churn_bp
      FROM classified GROUP BY source
    """,
    "q86_bpe" -> s"""
      WITH w0 AS (
        SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS cnt,
          string_split(w, '') AS syms
        FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        GROUP BY 1
      ),${(1 to 5).map(bpeRoundCtes).mkString(",")}
      SELECT * FROM (
        ${(1 to 5).map(i =>
          s"""SELECT $i AS round, l AS lhs, r AS rhs, l || r AS merged,
              total AS pair_count FROM b$i""").mkString(" UNION ALL ")}
      ) ORDER BY round
    """,
    "q87_triangles" -> """
      WITH e AS (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      ),
      tri AS (
        SELECT e1.u AS a, e1.v AS b, e2.v AS c
        FROM e e1
        JOIN e e2 ON e1.v = e2.u
        JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
      ),
      pern AS (
        SELECT node, CAST(COUNT(*) AS BIGINT) AS triangles
        FROM (SELECT unnest([a, b, c]) AS node FROM tri)
        GROUP BY 1
      ),
      deg AS (
        SELECT node, CAST(COUNT(*) AS BIGINT) AS degree
        FROM (SELECT u AS node FROM e UNION ALL SELECT v FROM e)
        GROUP BY 1
      )
      SELECT node AS part_key, triangles, degree, tri_rank FROM (
        SELECT p.node, p.triangles, d.degree,
          ROW_NUMBER() OVER (ORDER BY p.triangles DESC, p.node ASC) AS tri_rank
        FROM pern p JOIN deg d ON p.node = d.node
      ) WHERE tri_rank <= 20
    """,
    // replay training (the q86 CTE chain) and apply w5's final
    // segmentation per word OCCURRENCE — the Spark side instead bakes
    // the 5 merge pairs into literal rewrite expressions; hash
    // equality proves the two formulations tokenize identically.
    "q89_bpe_apply" -> s"""
      WITH w0 AS (
        SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS cnt,
          string_split(w, '') AS syms
        FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        GROUP BY 1
      ),${(1 to 5).map(bpeRoundCtes).mkString(",")}
      SELECT t.doc_id,
        CAST(COUNT(*) AS BIGINT) AS words,
        CAST(SUM(len(w5.syms)) AS BIGINT) AS bpe_tokens,
        CAST(SUM(len(t.word)) AS BIGINT) AS chars,
        CAST(SUM(len(w5.syms)) * 10000
          // GREATEST(SUM(len(t.word)), 1) AS BIGINT) AS tokens_per_10k_chars
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
            FROM documents) t
      JOIN w5 ON w5.word = t.word
      GROUP BY 1
    """,
    // the full SemDeDup lifecycle replayed BRANCH-AND-ALL: the regime
    // gate (Ann.TwoLevelMinVectors) picks flat Lloyd's below 50k
    // vectors and the two-level quantizer above, and the oracle
    // replays the SAME count-derived branch — both chains are present
    // in one static SQL, but each trains over a count-FILTERED source
    // (vtl / vfl), so the un-chosen chain sees zero rows and costs
    // nothing beyond a scalar count. k/k1/tgt derive from the corpus
    // size by the SAME formulas as the Scala side, so this oracle
    // stays valid at every scale factor without overrides; the chosen
    // two-level replay is ~n·sqrt(k) per round, same complexity as
    // the engine.
    "q90_semantic_dedup" -> s"""
      WITH ${twoLevelCtes(iters = 5)},
      vfl AS (
        SELECT vec_id,
          list_transform(embedding,
            x -> CAST(floor(CAST(x AS DOUBLE) * 16777216.0) AS BIGINT)) AS q
        FROM embeddings
        WHERE (SELECT COUNT(*) FROM embeddings) < ${Ann.TwoLevelMinVectors}
      ),
      ${flatLloydCtes("SELECT GREATEST(16, COUNT(*) // 250) FROM vfl",
          iters = 5, src = "vfl", prefix = "fc")},
      flatasg AS (
        SELECT vec_id, cluster AS cell FROM (
          SELECT v.vec_id, c.cluster,
            ROW_NUMBER() OVER (PARTITION BY v.vec_id
              ORDER BY ${qDist("c")} ASC, c.cluster ASC) AS rn
          FROM vfl v CROSS JOIN fc5 c
        ) WHERE rn = 1
      ),
      cells AS (
        -- EXACTLY one branch contributes: the count predicate silences
        -- the two-level assignment in the flat regime, and vfl (the
        -- flat chain's source) is empty in the two-level regime. The
        -- gate is ASYMMETRIC by design — only the flat chain (the
        -- quadratic-at-scale one) trains over a count-filtered source;
        -- the two-level chain keeps its plain source because its ~65
        -- inlined source references each re-plan the filter's
        -- decorrelated subquery (measured: 300 s of PLANNER time on an
        -- EMPTY chain), while executing it small-n costs seconds.
        SELECT vec_id, cell FROM cellasg
        WHERE (SELECT COUNT(*) FROM embeddings) >= ${Ann.TwoLevelMinVectors}
        UNION ALL SELECT vec_id, CAST(cell AS BIGINT) AS cell FROM flatasg
      ),
      e AS (
        SELECT vec_id, embedding,
          sqrt(list_reduce(
            list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
            (a, b) -> a + b)) AS norm
        FROM embeddings
      ),
      pruned AS (
        SELECT DISTINCT b.vec_id
        FROM cells a JOIN cells b ON a.cell = b.cell AND a.vec_id < b.vec_id
        JOIN e p ON a.vec_id = p.vec_id
        JOIN e n ON b.vec_id = n.vec_id
        WHERE $cosineSql >= 0.25
      )
      SELECT g.cell AS cell, CAST(COUNT(*) AS BIGINT) AS n,
        CAST(COUNT(pr.vec_id) AS BIGINT) AS pruned,
        CAST(COUNT(*) - COUNT(pr.vec_id) AS BIGINT) AS kept,
        CAST(COUNT(pr.vec_id) * 10000 // COUNT(*) AS BIGINT) AS prune_bp
      FROM cells g LEFT JOIN pruned pr ON g.vec_id = pr.vec_id
      GROUP BY 1
    """,
    "q91_skew_profile" ->
      Seq(("lineitem", "l_partkey", "lineitem.l_partkey"),
          ("lineitem", "l_suppkey", "lineitem.l_suppkey"),
          ("orders", "o_custkey", "orders.o_custkey"),
          ("events", "user_id", "events.user_id")).map { case (tbl, key, label) =>
        s"""
        SELECT '$label' AS key_name, s.n_rows, s.n_keys, t.top_key, s.max_cnt,
          s.max_cnt * s.n_keys * 100 // s.n_rows AS skew_pct
        FROM (SELECT CAST(SUM(cnt) AS BIGINT) AS n_rows,
                CAST(COUNT(*) AS BIGINT) AS n_keys,
                CAST(MAX(cnt) AS BIGINT) AS max_cnt
              FROM (SELECT $key, COUNT(*) AS cnt FROM $tbl GROUP BY 1)) s
        CROSS JOIN (SELECT CAST($key AS BIGINT) AS top_key
                    FROM (SELECT $key, COUNT(*) AS cnt FROM $tbl GROUP BY 1)
                    ORDER BY cnt DESC, $key ASC LIMIT 1) t"""
      }.mkString(" UNION ALL "),
    // weights replayed from the q76 CTEs; the per-doc deterministic
    // Bernoulli replays through the same mix32 scalar expansion.
    "q92_mixture_sample" -> s"""
      WITH base AS (
        SELECT lang, source, COUNT(*) AS docs,
          CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens
        FROM documents GROUP BY 1, 2
      ),
      t AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_domains,
          CAST(SUM(tokens) AS BIGINT) AS total_tokens
        FROM base
      ),
      w AS (
        SELECT lang, source,
          LEAST((1000000 // n_domains) * 100
                  // GREATEST((tokens * 1000000) // total_tokens, 1),
                1000) AS weight_pct
        FROM base CROSS JOIN t
      ),
      c AS (
        SELECT d.lang, d.source, w.weight_pct, d.n_tokens,
          w.weight_pct // 100
            + CASE WHEN ${mix32Sql("d.doc_id")} % 100 < w.weight_pct % 100
                   THEN 1 ELSE 0 END AS copies
        FROM (SELECT doc_id, lang, source,
                CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
              FROM documents) d
        JOIN w ON d.lang = w.lang AND d.source = w.source
      ),
      pd AS (
        SELECT lang, source, MIN(weight_pct) AS weight_pct,
          CAST(COUNT(*) AS BIGINT) AS docs_in,
          CAST(SUM(copies) AS BIGINT) AS docs_out,
          CAST(SUM(n_tokens) AS BIGINT) AS tokens_in,
          CAST(SUM(copies * n_tokens) AS BIGINT) AS tokens_out
        FROM c GROUP BY 1, 2
      ),
      tt AS (SELECT CAST(SUM(tokens_out) AS BIGINT) AS total_out FROM pd)
      SELECT lang, source, weight_pct, docs_in, docs_out, tokens_in,
        tokens_out, tokens_out * 1000000 // total_out AS realized_ppm
      FROM pd CROSS JOIN tt
    """,
    "q93_watermark_audit" -> """
      WITH l AS (
        SELECT ts,
          MAX(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY event_id
            ROWS UNBOUNDED PRECEDING) - epoch_ms(ts) AS late_ms
        FROM events
      )
      SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_events,
        CAST(SUM(CASE WHEN late_ms > 1000 THEN 1 ELSE 0 END) AS BIGINT) AS drop_1s,
        CAST(SUM(CASE WHEN late_ms > 10000 THEN 1 ELSE 0 END) AS BIGINT) AS drop_10s,
        CAST(SUM(CASE WHEN late_ms > 60000 THEN 1 ELSE 0 END) AS BIGINT) AS drop_60s,
        CAST(MAX(late_ms) AS BIGINT) AS max_late_ms
      FROM l GROUP BY 1
    """,
    // same quality/tier/curriculum-order CTEs as q74; the manifest is
    // the per-20k-token-shard rollup of the global prefix sum
    "q94_shard_manifest" -> s"""
      WITH s AS (
        SELECT doc_id, n_chars, string_split(text, ' ') AS w FROM documents
      ),
      q AS (
        SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
          CAST(FLOOR((least(CAST(len(w) AS DOUBLE)/50.0, 1.0) * 0.4
            + (1.0 - CAST(len(list_filter(w, x -> x IN ('join','hash','row')))
                     AS DOUBLE)/len(w)) * 0.3
            + least((CAST(n_chars - len(w) + 1 AS DOUBLE)/len(w))/6.0, 1.0)
              * 0.3) * 10) AS BIGINT) AS tier,
          ${mix32Sql("doc_id")} AS hv
        FROM s
      ),
      c AS (
        SELECT doc_id, tier, n_tokens,
          CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY tier DESC, hv ASC,
            doc_id ASC ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS BIGINT) AS start_tok
        FROM q
      )
      SELECT CAST(start_tok // 20000 AS BIGINT) AS shard_id,
        CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
        MIN(tier) AS min_tier, MAX(tier) AS max_tier,
        CAST(MIN(start_tok) AS BIGINT) AS start_tok,
        CAST(SUM(CASE WHEN (start_tok + n_tokens - 1) // 20000
                        > start_tok // 20000
                 THEN 1 ELSE 0 END) AS BIGINT) AS spans
      FROM c GROUP BY 1
    """,
    "q95_ngram_novelty" -> """
      WITH t AS (
        SELECT doc_id, list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                       for i in range(1, len(w) - 1)]) AS tri
        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
      ),
      b AS (
        SELECT doc_id, unnest(tri) AS sh FROM t WHERE doc_id % 10 = 0
      ),
      ix AS (
        SELECT DISTINCT unnest(tri) AS sh FROM t WHERE doc_id % 10 <> 0
      )
      SELECT b.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
        CAST(SUM(CASE WHEN ix.sh IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS n_novel,
        CAST((SUM(CASE WHEN ix.sh IS NULL THEN 1 ELSE 0 END) * 10000)
          // COUNT(*) AS BIGINT) AS novelty_bp
      FROM b LEFT JOIN ix ON b.sh = ix.sh
      GROUP BY 1
    """,
    // power iteration replay: gram (floorDiv by n) + 5 unrolled
    // rounds + Rayleigh quotient, all in the floor-mod idiom
    "q96_pca_power" -> {
      val rounds = (1 to 5).map { t =>
        val prev = if (t == 1) "v0" else s"v${t - 1}"
        s"""w$t AS (
        SELECT g.i, CAST(SUM(g.g * v.v) AS BIGINT) AS w
        FROM gram g JOIN $prev v ON g.j = v.i GROUP BY 1
      ),
      m$t AS (SELECT MAX(ABS(w)) AS m FROM w$t),
      v$t AS (
        SELECT i, CAST((w * 10000 - (((w * 10000) % m + m) % m)) // m
          AS BIGINT) AS v
        FROM w$t CROSS JOIN m$t
      )"""
      }.mkString(",\n      ")
      s"""
      WITH q AS (
        SELECT vec_id, list_transform(embedding,
          x -> CAST(floor(CAST(x AS DOUBLE) * 4096.0) AS BIGINT)) AS q
        FROM embeddings
      ),
      nv AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM q),
      pos AS (
        SELECT vec_id, CAST(d.i - 1 AS BIGINT) AS i, q[d.i] AS x
        FROM q CROSS JOIN (SELECT unnest(range(1, 65)) AS i) d
      ),
      tri AS (
        SELECT a.i AS i, b.i AS j, CAST(SUM(a.x * b.x) AS BIGINT) AS s
        FROM pos a JOIN pos b ON a.vec_id = b.vec_id AND a.i <= b.i
        GROUP BY 1, 2
      ),
      gram AS (
        SELECT i, j, (s - ((s % n + n) % n)) // n AS g
        FROM tri CROSS JOIN nv
        UNION ALL
        SELECT j AS i, i AS j, (s - ((s % n + n) % n)) // n AS g
        FROM tri CROSS JOIN nv WHERE i <> j
      ),
      v0 AS (
        SELECT CAST(i AS BIGINT) AS i, CAST(10000 AS BIGINT) AS v
        FROM (SELECT unnest(range(0, 64)) AS i)
      ),
      $rounds,
      wf AS (
        SELECT g.i, CAST(SUM(g.g * v.v) AS BIGINT) AS w
        FROM gram g JOIN v5 v ON g.j = v.i GROUP BY 1
      ),
      ray AS (
        SELECT CAST((num - ((num % den + den) % den)) // den AS BIGINT)
          AS lambda_q
        FROM (SELECT SUM(v.v * w.w) AS num, SUM(v.v * v.v) AS den
              FROM v5 v JOIN wf w ON v.i = w.i)
      )
      SELECT v.i, v.v AS loading, ray.lambda_q
      FROM v5 v CROSS JOIN ray
    """
    },
    // BM25 replay: same integer idf/length-norm scaling, same
    // (df DESC, term ASC) query-term ranking, same top-10 tie order
    "q97_bm25" -> """
      WITH w AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
      ),
      post AS (
        SELECT doc_id, w AS term, CAST(COUNT(*) AS BIGINT) AS tf
        FROM w GROUP BY 1, 2
      ),
      dl AS (
        SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM post GROUP BY 1
      ),
      tot AS (
        SELECT CAST(SUM(dl) AS BIGINT) AS a, CAST(COUNT(*) AS BIGINT) AS n
        FROM dl
      ),
      dft AS (
        SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM post GROUP BY 1
      ),
      q AS (
        SELECT CAST((r - 1) // 3 AS BIGINT) AS qid, term, df
        FROM (SELECT term, df,
                row_number() OVER (ORDER BY df DESC, term ASC) AS r
              FROM dft)
        WHERE r <= 30
      ),
      sc AS (
        SELECT q.qid, p.doc_id,
          CAST(SUM((22 * ((1000 * t.n) // q.df) * p.tf * 100000)
            // (1000000 * p.tf + 300000
                + (9 * ((1000000 * t.n * d.dl) // t.a)) // 10))
            AS BIGINT) AS score,
          CAST(COUNT(*) AS BIGINT) AS matched
        FROM post p
        JOIN q ON p.term = q.term
        JOIN dl d ON p.doc_id = d.doc_id
        CROSS JOIN tot t
        GROUP BY 1, 2
      )
      SELECT qid, doc_id, score, matched, CAST(rk AS INT) AS "rank"
      FROM (SELECT qid, doc_id, score, matched,
              row_number() OVER (PARTITION BY qid
                ORDER BY score DESC, doc_id ASC) AS rk
            FROM sc)
      WHERE rk <= 10
    """,
    // bigram-LM replay: identical integer transition ppm and per-doc
    // integer readout; adjacent pairs from the same whitespace split
    "q98_bigram_lm" -> """
      WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
      ),
      bg AS (
        SELECT doc_id,
          [w[i] || ' ' || w[i+1] for i in range(1, len(w))] AS bgs
        FROM t
      ),
      ib AS (
        SELECT unnest(bgs) AS bg FROM bg WHERE doc_id % 10 <> 0
      ),
      c2 AS (
        SELECT string_split(bg, ' ')[1] AS w1, bg,
          CAST(COUNT(*) AS BIGINT) AS c12
        FROM ib GROUP BY 1, 2
      ),
      c1 AS (
        SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM c2 GROUP BY 1
      ),
      tr AS (
        SELECT c2.bg, (1000000 * c2.c12) // c1.c1 AS p_ppm
        FROM c2 JOIN c1 ON c2.w1 = c1.w1
      ),
      b AS (
        SELECT doc_id, unnest(bgs) AS bg FROM bg WHERE doc_id % 10 = 0
      )
      SELECT b.doc_id,
        CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        CAST(SUM(CASE WHEN tr.p_ppm IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS oov_bigrams,
        CAST(SUM(COALESCE(tr.p_ppm, 0)) // COUNT(*) AS BIGINT)
          AS avg_trans_ppm,
        CAST((SUM(CASE WHEN tr.p_ppm IS NULL THEN 1 ELSE 0 END) * 1000000)
          // COUNT(*) AS BIGINT) AS oov_ppm
      FROM b LEFT JOIN tr ON b.bg = tr.bg
      GROUP BY 1
    """,
    // batch-perceptron replay: integer features/labels, 5 unrolled
    // epochs (gradient = filtered sums, weights = 1-row carries)
    "q99_perceptron" -> {
      val epochs = (1 to 5).map { t =>
        val pw = s"wt${t - 1}"
        val dot = s"(w.b + w.c1*f.x1 + w.c2*f.x2 + w.c3*f.x3 + w.c4*f.x4)"
        s"""e$t AS (
        SELECT
          CAST(COUNT(*) FILTER (WHERE f.y*$dot <= 0) AS BIGINT) AS mis,
          CAST(COALESCE(SUM(f.y) FILTER (WHERE f.y*$dot <= 0), 0) AS BIGINT) AS g0,
          CAST(COALESCE(SUM(f.y*f.x1) FILTER (WHERE f.y*$dot <= 0), 0) AS BIGINT) AS g1,
          CAST(COALESCE(SUM(f.y*f.x2) FILTER (WHERE f.y*$dot <= 0), 0) AS BIGINT) AS g2,
          CAST(COALESCE(SUM(f.y*f.x3) FILTER (WHERE f.y*$dot <= 0), 0) AS BIGINT) AS g3,
          CAST(COALESCE(SUM(f.y*f.x4) FILTER (WHERE f.y*$dot <= 0), 0) AS BIGINT) AS g4
        FROM fy f CROSS JOIN $pw w
      ),
      wt$t AS (
        SELECT w.b + e.g0 AS b, w.c1 + e.g1 AS c1, w.c2 + e.g2 AS c2,
               w.c3 + e.g3 AS c3, w.c4 + e.g4 AS c4
        FROM $pw w CROSS JOIN e$t e
      )"""
      }.mkString(",\n      ")
      val readout = (1 to 5).map { t =>
        s"""SELECT CAST($t AS BIGINT) AS epoch, e$t.mis,
          wt$t.b AS w_bias, wt$t.c1 AS w_words, wt$t.c2 AS w_chars,
          wt$t.c3 AS w_stop, wt$t.c4 AS w_awl
        FROM e$t CROSS JOIN wt$t"""
      }.mkString("\n      UNION ALL\n      ")
      s"""
      WITH f AS (
        SELECT doc_id,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS x1,
          n_chars // 100 AS x2,
          CAST(len(list_filter(string_split(text, ' '),
            x -> x IN ('join','hash','row'))) AS BIGINT) AS x3,
          ((n_chars - len(string_split(text, ' ')) + 1) * 1000)
            // len(string_split(text, ' ')) AS x4
        FROM documents
      ),
      fy AS (
        SELECT *, CAST(CASE WHEN x1 >= 40 AND 5*x3 <= x1
          THEN 1 ELSE -1 END AS BIGINT) AS y
        FROM f
      ),
      wt0 AS (
        SELECT CAST(0 AS BIGINT) AS b, CAST(0 AS BIGINT) AS c1,
          CAST(0 AS BIGINT) AS c2, CAST(0 AS BIGINT) AS c3,
          CAST(0 AS BIGINT) AS c4
      ),
      $epochs
      $readout
    """
    },
  )
}
