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

  /** Vocabulary induction — the top-V corpus terms with frequency and
    * coverage stats (the first step of tokenizer training: how much of
    * the token stream does a V-term vocabulary cover?).
    *
    * Scale shape: term counts are one map-side-combinable groupBy;
    * the global top-V is a SINGLE-GROUP TopKAgg — an O(V) mergeable
    * buffer per partition, so the "global top" costs one k-sized
    * reduce instead of a global sort of the term dictionary (the
    * classic ORDER BY cnt DESC LIMIT V plan sorts every term on one
    * node's merge). The only windowed work (cumulative coverage) runs
    * over the V result rows — driver-scale by construction. */
  def q57Vocab(spark: SparkSession, dir: String): DataFrame = {
    val v = 24
    val counts = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
    // total token count: exact, rides the same scan pre-aggregation
    val total = Tables.documents(spark, dir)
      .select(size(split(col("text"), " ")).cast("long").as("n"))
      .agg(sum(col("n")).as("total_tokens"))
    val ord: Ordering[(Long, String)] = Ordering.by(t => (-t._1, t._2))
    val topv = udaf(new graft.functions.TopKAgg[(Long, String)](v, ord))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("vocab_rank"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    counts.agg(topv(col("cnt"), col("term")).as("top"))
      .select(posexplode(col("top")).as(Seq("pos", "t")))
      .crossJoin(broadcast(total))
      .select(col("t._2").as("term"), col("t._1").as("cnt"),
        (col("pos") + 1).cast("int").as("vocab_rank"),
        (col("t._1").cast("double") / col("total_tokens")).as("coverage"))
      .withColumn("cum_coverage", sum(col("coverage")).over(w))
  }

  /** PII redaction: strip emails / phone numbers / IPv4s and report
    * per-doc redaction counts plus a hash of the cleaned text — the
    * scrub pass every training corpus gets before release. Regexes are
    * deliberately engine-portable (explicit character classes, no
    * shorthand \\d or lookarounds) so Java regex and DuckDB's RE2
    * match identically. Pure per-row codegen: scan speed at 100 TB.
    * The corpus has no organic PII, so deterministic synthetic PII is
    * injected on doc_id%5/7/9 rows — the plumbing under test is the
    * redaction, not the data. */
  def q46PiiRedact(spark: SparkSession, dir: String): DataFrame = {
    val emailRe = "[a-z0-9._-]+@[a-z0-9-]+\\.[a-z]+"
    val phoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
    val ipRe = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
    val withPii = Tables.documents(spark, dir)
      .withColumn("raw", concat(col("text"),
        when(col("doc_id") % 5 === 0,
          concat(lit(" contact u"), col("doc_id"), lit("@mail.test now"))).otherwise(lit("")),
        when(col("doc_id") % 7 === 0,
          concat(lit(" call 555-"), format_string("%03d", col("doc_id") % 1000),
            lit("-"), format_string("%04d", col("doc_id") % 10000))).otherwise(lit("")),
        when(col("doc_id") % 9 === 0,
          concat(lit(" from 10.0."), (col("doc_id") % 256).cast("string"),
            lit("."), ((col("doc_id") * 7) % 256).cast("string"))).otherwise(lit(""))))
    val cleaned = regexp_replace(
      regexp_replace(
        regexp_replace(col("raw"), emailRe, "<EMAIL>"),
        ipRe, "<IP>"),
      phoneRe, "<PHONE>")
    withPii.select(
      col("doc_id"),
      size(regexp_extract_all(col("raw"), lit(emailRe), lit(0))).as("emails"),
      size(regexp_extract_all(col("raw"), lit(phoneRe), lit(0))).as("phones"),
      size(regexp_extract_all(col("raw"), lit(ipRe), lit(0))).as("ips"),
      sha2(cleaned, 256).as("clean_hash"),
      length(col("raw")).as("raw_len"),
      length(cleaned).as("clean_len"))
  }

  /** Repetition filters (the Gopher / RefinedWeb quality rules):
    * duplicate-word fraction, duplicate-trigram fraction, and the
    * top single word's frequency share — high values mark boilerplate
    * and degenerate repetition. All per-row array expressions over one
    * tokenize; the only non-scan work is a size()/array_distinct()
    * pair per rule. */
  def q47Repetition(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graftbridge.Bridge.{column => exprCol, expression}
    // One native kernel pass per row (TextKernels.wordRepStats) yields
    // word count, distinct-word count, and the top word's multiplicity;
    // the trigram side reuses the native shingle kernel. top_count is
    // bit-identical to the previous sorted-run-length aggregate (max
    // multiset multiplicity does not depend on how equal words are
    // grouped) and n_distinct to size(array_distinct(w)); both pinned
    // by TextKernelsSpec. The interpreted-HOF formulations this
    // replaces were the per-row CPU floor of the whole query.
    val stats = exprCol(graft.functions.WordRepStats(expression(col("text"))))
    val nWords = col("st.n_words")
    Tables.documents(spark, dir)
      .withColumn("st", stats)
      .withColumn("tri", Dedup.shingles(3))
      .select(
        col("doc_id"),
        nWords.as("n_words"),
        (lit(1.0) - col("st.n_distinct").cast("double") / nWords)
          .as("dup_word_frac"),
        // tri nonempty implies nWords >= 3, so the denominator is >= 1
        (when(size(col("tri")) > 0,
          lit(1.0) - size(col("tri")).cast("double") / (nWords - 2))
          .otherwise(lit(0.0))).as("dup_tri_frac"),
        (col("st.top_count").cast("double") / nWords).as("top_word_frac"))
      .withColumn("flagged",
        col("dup_word_frac") > 0.9 || col("dup_tri_frac") > 0.5 ||
          col("top_word_frac") > 0.3)
  }

  /** q72: corpus-frequency document scoring — the language-model
    * quality filter of a CCNet-style pipeline, with the LM replaced
    * by the corpus's own unigram distribution so the score is exact
    * integer arithmetic (a real KenLM plugs in at the same join).
    * Per doc: mean token commonness in ppm of the corpus (low = the
    * doc is made of rare/garbage tokens) and the hapax share in basis
    * points (high = tokens that appear nowhere else — mojibake, ids,
    * binary spill). Buckets are RELATIVE to the corpus (quality
    * filters keep/drop by percentile, not absolute perplexity):
    * noisy = hapax share above 25% absolute (a hard garbage floor),
    * rare = mean commonness below the corpus p25, common = above the
    * p75, else mid. The quartile frame is one 1-row exact-percentile
    * aggregate broadcast into the bucket expression (the q71
    * pattern; approx_percentile is the 100 TB drop-in).
    *
    * Scale shape: per-doc term counts reduce BEFORE the unigram
    * aggregate (both map-side combinable); the score join is
    * postings-keyed (term), linear in the postings table — the same
    * shape as q54/q63, never a doc×vocab product. The corpus-total
    * frame is one broadcast row. Overflow audit: ppm ≤ 10^6 by
    * construction, so ppm_sum ≤ 10^6·doc_len; with doc_len < 10^7
    * tokens the per-doc sum stays under 10^13 « 2^63, and the
    * 10^6·ctf numerator needs ctf < 9.2·10^12 — both hold at 100 TB
    * (ctf is bounded by total corpus tokens only for THE most common
    * token; widen ppm's numerator to decimal(38,0) past ~10^12-token
    * corpora). */
  /** q76: corpus mixture report (the data card every corpus release
    * ships, and the input of mixture rebalancing): per (lang, source)
    * domain — docs, tokens, token share in ppm, and the integer
    * resampling weight that would rebalance the corpus to a UNIFORM
    * domain mixture (weight_pct = 100·target_share/current_share,
    * capped at 10x — the standard up-sampling cap; DoReMi-style
    * learned weights plug in at the same column).
    *
    * Scale shape: ONE map-side-combinable groupBy over the corpus;
    * the domain-count and total-token frames are 1-row broadcasts;
    * output is |domains| rows. All arithmetic integer (ppm, pct,
    * floor division) — oracle-exact. */
  def q76MixtureReport(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(spark, dir)
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("docs"),
        sum(size(split(col("text"), " ")).cast("long")).as("tokens"))
    val totals = base.agg(
      count(lit(1)).as("n_domains"),
      sum(col("tokens")).as("total_tokens"))
    // Denominator guard: a domain holding < 1 ppm of tokens floors
    // share_ppm to 0; dividing by it would be NULL (Spark) / error
    // (strict engines), and least(NULL, cap) silently resolves to the
    // cap — handing the tiniest domain the max up-sample weight by
    // accident. greatest(share, 1) clamps sub-ppm domains to the 1-ppm
    // weight (already at the 10x cap for any uniform target >= 10 ppm),
    // which is the intended "rarest domains hit the cap" semantics,
    // explicitly. Oracle SQL mirrors the same GREATEST.
    base.crossJoin(broadcast(totals))
      .select(col("lang"), col("source"), col("docs"), col("tokens"),
        expr("(tokens * 1000000) div total_tokens").as("share_ppm"),
        least(
          expr("(1000000 div n_domains) * 100 div greatest((tokens * 1000000) div total_tokens, 1)"),
          lit(1000L)).as("uniform_weight_pct"))
  }

  def q72CorpusRarity(spark: SparkSession, dir: String): DataFrame = {
    val post = Similarity.postings(spark, dir) // doc_id, word, cnt
    val unigram = post.groupBy(col("word")).agg(sum(col("cnt")).as("ctf"))
    val total = unigram.agg(sum(col("ctf")).as("n_total"))
    val scored = post.join(unigram, "word")
      .crossJoin(broadcast(total))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("cnt")).as("n_tokens"),
        sum(col("cnt") * expr("(1000000 * ctf) div n_total")).as("ppm_sum"),
        sum(when(col("ctf") === 1, col("cnt")).otherwise(lit(0L)))
          .as("hapax_tokens"))
      .select(
        col("doc_id"), col("n_tokens"),
        expr("ppm_sum div n_tokens").as("mean_ppm"),
        expr("(hapax_tokens * 10000) div n_tokens").as("hapax_bp"))
    val quartiles = scored.agg(
      percentile(col("mean_ppm"), lit(0.25)).as("p25"),
      percentile(col("mean_ppm"), lit(0.75)).as("p75"))
    scored.crossJoin(broadcast(quartiles))
      .withColumn("bucket",
        when(col("hapax_bp") > 2500, lit("noisy"))
          .when(col("mean_ppm").cast("double") < col("p25"), lit("rare"))
          .when(col("mean_ppm").cast("double") > col("p75"), lit("common"))
          .otherwise(lit("mid")))
      .drop("p25", "p75")
  }

  /** Tokenizer APPLICATION — the step after q57's vocab induction:
    * tokenize every document against the induced top-V word vocab
    * with character-level fallback for out-of-vocab words (an in-vocab
    * word is one token; an OOV word decomposes into its characters,
    * the wordpiece-style worst case). Per-doc readout: word count,
    * OOV words, realized token count, and the OOV rate — the numbers
    * that decide whether a vocab is big enough before an expensive
    * tokenizer run at corpus scale.
    *
    * Scale shape: the vocab is V rows BY CONSTRUCTION (TakeOrdered,
    * deterministic count-desc/term-asc order — exactly q57's ranking),
    * so the membership join broadcasts; everything else is one
    * explode + one map-side-combinable groupBy over the corpus scan.
    * Token arithmetic is integer; the only double is one final
    * division — oracle-exact. */
  /** BPE MERGE INDUCTION — real tokenizer training, not just vocab
    * counting: 5 rounds of "count adjacent symbol pairs over the
    * current segmentation → merge the most frequent pair everywhere
    * (greedy left-to-right, non-overlapping)", seeded from
    * characters, pair statistics weighted by corpus word counts.
    * Output = the learned merge table (round, pair, merged symbol,
    * pair count) — the artifact a BPE tokenizer ships.
    *
    * Spark-first iteration shape (the q32/q53/q82 recipe applied to
    * a tokenizer): state lives in a (word, cnt, syms) frame keyed by
    * DISTINCT words — corpus scale only enters the one-off seed
    * groupBy, every round is vocabulary-sized; the argmax pair is a
    * 1-row driver collect (metadata, like a centroid); the rewrite
    * is pure array expressions — the greedy non-overlap rule is the
    * gaps-and-islands trick in array form (occurrence positions at
    * run-relative even offsets merge; a merged pair shields its
    * right neighbor), so rounds stay whole-stage codegen with no
    * UDF. The DuckDB oracle replays all 5 rounds unrolled —
    * list-comprehension CTEs with the IDENTICAL greedy rule (lambda
    * indices are 1-based there, 0-based here; the expressions
    * compensate) — so the hash gate proves the whole iterative
    * training, ties and all (ties break count DESC, pair ASC). */
  def q86Bpe(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    bpeMerges(spark, dir, rounds = 5)
      .toDF("round", "lhs", "rhs", "merged", "pair_count")
  }

  /** One greedy non-overlapping merge pass: rewrite `syms` so every
    * (bl, br) adjacency becomes the merged symbol, scanning left to
    * right (a merged pair shields its right neighbor). The rule is the
    * gaps-and-islands trick in array form — occurrence positions at
    * even run-relative offsets merge — so it stays whole-stage codegen
    * with no UDF. Shared by training (q86, on the distinct-word state)
    * and application (q89, on the exploded corpus). */
  private[graft] def mergeRewrite(df: DataFrame, bl: String, br: String): DataFrame = {
    def lit_(s: String) = s.replace("\\", "\\\\").replace("'", "\\'")
    df.withColumn("p", expr(
        s"""CASE WHEN size(syms) >= 2 THEN
              filter(sequence(1, size(syms) - 1),
                k -> element_at(syms, k) = '${lit_(bl)}'
                  AND element_at(syms, k + 1) = '${lit_(br)}')
            ELSE CAST(array() AS array<bigint>) END"""))
      // run id: occurrence position minus its (1-based) rank — constant
      // within a run of CONSECUTIVE positions (Spark lambda index j0 is
      // 0-based; DuckDB's jj is 1-based: x - j0 - 1 == x - jj)
      .withColumn("rid", expr("transform(p, (x, j0) -> x - j0 - 1)"))
      // greedy non-overlap: within each run, keep even run-relative
      // offsets (1st, 3rd, ... occurrence)
      .withColumn("sel", expr(
        """CASE WHEN size(p) = 0 THEN CAST(array() AS array<bigint>)
           ELSE transform(
             filter(sequence(1, size(p)),
               j -> (j - array_position(rid, element_at(rid, j))) % 2 = 0),
             j -> element_at(p, j)) END"""))
      .withColumn("syms", expr(
        """flatten(transform(sequence(1, size(syms)),
             q -> CASE
               WHEN array_contains(sel, q)
                 THEN array(concat(element_at(syms, q), element_at(syms, q + 1)))
               WHEN array_contains(sel, q - 1) THEN CAST(array() AS array<string>)
               ELSE array(element_at(syms, q)) END))"""))
      .drop("p", "rid", "sel")
  }

  /** The q86 training loop, reusable: returns the merge log —
    * (round, lhs, rhs, merged, pair_count) — as DRIVER-SIDE metadata
    * (5 rows, like a centroid set). All checkpointed training state is
    * released before returning, so callers get the artifact with a
    * clean block manager.
    *
    * Memoized per (session, dir, rounds) — the q17/q18 gate-probe
    * precedent: q86 (report the log) and q89 (apply it corpus-wide)
    * share the identical training computation, so within one session
    * the second caller gets the 5-row artifact for free; a fresh
    * session re-trains, which is the library's standing
    * cache-invalidation granularity for on-disk data changes. Stored
    * in the WEAK per-session store (Sessions.sessionMemo, r13) so a
    * dropped session's merge logs are collectable with it. */
  private[graft] def mergeKey(dir: String, rounds: Int): Any =
    ("bpe", dir, rounds)

  private[graft] def bpeMerges(spark: SparkSession, dir: String,
      rounds: Int): Seq[(Int, String, String, String, Long)] =
    graft.Sessions.sessionMemo(spark, mergeKey(dir, rounds))(
      trainBpeMerges(spark, dir, rounds))

  private def trainBpeMerges(spark: SparkSession, dir: String,
      rounds: Int): Seq[(Int, String, String, String, Long)] = {
    var words = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .withColumn("syms", split(col("word"), ""))
      .localCheckpoint()
    val pairsOf = expr(
      """CASE WHEN size(syms) >= 2 THEN
           transform(sequence(1, size(syms) - 1),
             k -> struct(element_at(syms, k) AS lhs, element_at(syms, k + 1) AS rhs))
         ELSE CAST(array() AS array<struct<lhs: string, rhs: string>>) END""")
    val merges = (1 to rounds).map { r =>
      val prevWords = words // freed once this round's checkpoint lands
      val Array(bl, br, total) = words
        .select(col("cnt"), explode(pairsOf).as("pr"))
        .groupBy(col("pr.lhs").as("lhs"), col("pr.rhs").as("rhs"))
        .agg(sum(col("cnt")).as("total"))
        .orderBy(col("total").desc, col("lhs").asc, col("rhs").asc)
        .limit(1).collect()
        .map(row => Array(row.getString(0), row.getString(1),
          row.getLong(2).toString)).head
      words = mergeRewrite(words, bl, br)
        .localCheckpoint() // bound the per-round plan growth
      // eager checkpoint above has materialized the new state; the
      // previous round's blocks are dead — release them now instead of
      // letting 5 rounds of corpus-vocab frames pile up until GC
      org.apache.spark.sql.graftbridge.Bridge.releaseCheckpoints(prevWords)
      (r, bl, br, bl + br, total.toLong)
    }
    // the result is the driver-side merge log (a LocalRelation) — it
    // does not depend on the checkpointed state, so the final round's
    // blocks can be released too
    org.apache.spark.sql.graftbridge.Bridge.releaseCheckpoints(words)
    merges
  }

  /** q89: BPE tokenizer APPLICATION — the corpus-scale pass that q86's
    * training exists to feed: apply the learned merge table to every
    * document and report the realized tokenization (word count, BPE
    * token count, character count, tokens-per-10k-chars compression).
    * The numbers a data-card publishes and a token-budget planner
    * (q74) consumes.
    *
    * Scale shape: the merge table is DRIVER METADATA (5 rows), and the
    * rewritten tokenization of a word is a pure function of the WORD —
    * so the 5 greedy rewrite passes (the same literal-baked codegen
    * chain as training) run once per DISTINCT word, not once per
    * occurrence. The per-word BPE token length then joins back to the
    * occurrence stream, which only ever carries (doc_id, word): one
    * vocab-sized distinct, 5 array passes over the vocab, one
    * occurrence join AQE is free to broadcast when the vocab is small,
    * and the map-side-combinable groupBy(doc_id). (Rewriting every
    * occurrence — the previous shape — re-paid the array kernels once
    * per corpus word: measured 128.7 s at sf10 against ~the scan cost
    * for this form; the corpus-to-vocab ratio is the win and it only
    * grows with scale.) All-integer output → oracle-exact; the DuckDB
    * oracle replays training (the q86 CTE chain) and applies w5's
    * final segmentation per occurrence — proving train+apply agree end
    * to end across two formulations. */
  def q89BpeApply(spark: SparkSession, dir: String): DataFrame = {
    val merges = bpeMerges(spark, dir, rounds = 5)
    val occ = Tables.parallelized(Tables.documents(spark, dir), col("doc_id"))
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
    // vocab-sized: distinct words through the 5 rewrite passes
    var wl = occ.select(col("word")).distinct()
      .withColumn("syms", split(col("word"), ""))
    merges.foreach { case (_, bl, br, _, _) => wl = mergeRewrite(wl, bl, br) }
    val wordLen = wl.select(col("word").as("w"),
      size(col("syms")).cast("long").as("bpe_len"))
    occ.join(wordLen, occ("word") === wordLen("w"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("words"),
        sum(col("bpe_len")).as("bpe_tokens"),
        sum(length(col("word")).cast("long")).as("chars"))
      .withColumn("tokens_per_10k_chars",
        expr("bpe_tokens * 10000 div greatest(chars, 1)"))
  }

  def q80TokenizeVocab(spark: SparkSession, dir: String): DataFrame = {
    val v = 24
    val words = Tables.parallelized(Tables.documents(spark, dir), col("doc_id"))
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
    val vocab = words.groupBy(col("w").as("term"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term").asc)
      .limit(v)
      .select(col("term"))
    words.join(broadcast(vocab), words("w") === vocab("term"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_words"),
        count(when(col("term").isNull, 1)).as("oov_words"),
        sum(when(col("term").isNotNull, lit(1L))
          .otherwise(length(col("w")).cast("long"))).as("n_tokens"))
      .select(col("doc_id"), col("n_words"), col("oov_words"), col("n_tokens"),
        (col("oov_words").cast("double") / col("n_words")).as("oov_rate"))
  }

  /** q95: cross-corpus n-gram NOVELTY — per incoming-batch document,
    * what fraction of its distinct word-3-shingles has never been seen
    * in the index corpus. The data-selection readout ("Deduplicating
    * Training Data" inverted): a batch doc that is all-seen adds
    * nothing; a high-novelty doc is where new information lives.
    * Batch/index split is q73's convention (doc_id % 10).
    *
    * Scale shape: both sides explode to DISTINCT (doc_id, shingle) /
    * DISTINCT shingle rows — the shingle-keyed left join co-partitions
    * on the shingle string (the q79 postings discipline; the index side
    * is the big one and is touched exactly once, aggregated to one row
    * per distinct shingle BEFORE the join so the join's right side is
    * the vocabulary, not the corpus), then one map-side-combinable
    * groupBy(doc_id) of integer counters. No cartesian anywhere;
    * novelty_bp is integer → oracle-exact. */
  def q95NgramNovelty(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.parallelized(Tables.documents(spark, dir), col("doc_id"))
      .select(col("doc_id"), col("text"))
    val batch = base.filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"), explode(Dedup.shingles3).as("sh"))
    val indexSh = base.filter(col("doc_id") % 10 =!= 0)
      .select(explode(Dedup.shingles3).as("sh"))
      .groupBy(col("sh")).agg(count(lit(1)).as("ix_docs"))
    batch.join(indexSh, Seq("sh"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_shingles"),
        count(when(col("ix_docs").isNull, 1)).as("n_novel"))
      .select(col("doc_id"), col("n_shingles"), col("n_novel"),
        expr("(n_novel * 10000) div n_shingles").as("novelty_bp"))
  }

  /** q98: bigram-LM fluency scoring — the CCNet/Gopher-style
    * "perplexity filter" re-expressed deterministically: train a
    * bigram model on the index corpus (doc_id % 10 != 0, q73/q95's
    * split), score each incoming batch doc (doc_id % 10 == 0) by its
    * average MLE transition probability and its unseen-bigram rate.
    * Low avg_trans_ppm + high oov_ppm = disfluent/outlier text, the
    * rows a quality gate drops. Probabilities are integer ppm —
    * P(w2|w1) = (10⁶·c(w1,w2)) div c(w1·) — and the per-doc readout
    * is an integer sum div count, so the whole train-and-score
    * lifecycle replays bit-for-bit in any engine (the q54 no-ln
    * policy; a monotone transform of the true mean probability).
    *
    * Scale shape: one corpus pass explodes adjacent token pairs
    * (codegen transform over the split array — empty/1-token docs
    * yield no rows by slice construction, no ANSI element_at hazard);
    * index counts c(w1,w2) and c(w1·) are map-side-combinable
    * groupBys; c1 joins back on w1 (vocab-sized stream, the corpus
    * was already reduced); the batch side joins the transition table
    * on the bigram string — an equi-join co-partitioned on the key,
    * never all-pairs — then one integer groupBy(doc_id). OOV handling
    * is the left join's NULL, counted, never divided (greatest-guard
    * unnecessary: post-explode docs have n_bigrams >= 1). */
  def q98BigramLm(spark: SparkSession, dir: String): DataFrame = {
    val bg = Tables.parallelized(Tables.documents(spark, dir), col("doc_id"))
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), explode(expr(
        "transform(slice(w, 1, greatest(size(w) - 1, 0)), " +
          "(x, i) -> struct(x as w1, concat(x, ' ', element_at(w, i + 2)) as bg))"))
        .as("p"))
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.bg").as("bg"))
    val ib = bg.filter(col("doc_id") % 10 =!= 0)
    val c2 = ib.groupBy(col("w1"), col("bg")).agg(count(lit(1)).as("c12"))
    val c1 = c2.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    val trans = c2.join(c1, "w1")
      .select(col("bg"), expr("(1000000 * c12) div c1").as("p_ppm"))
    bg.filter(col("doc_id") % 10 === 0).select(col("doc_id"), col("bg"))
      .join(trans, Seq("bg"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_bigrams"),
        count(when(col("p_ppm").isNull, 1)).as("oov_bigrams"),
        sum(coalesce(col("p_ppm"), lit(0L))).as("sum_ppm"))
      .select(col("doc_id"), col("n_bigrams"), col("oov_bigrams"),
        expr("sum_ppm div n_bigrams").as("avg_trans_ppm"),
        expr("(oov_bigrams * 1000000) div n_bigrams").as("oov_ppm"))
  }
}
