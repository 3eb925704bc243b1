package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

class PipelineSpec extends AnyFunSuite with SparkFixture {

  test("hash split is deterministic, total, and roughly 80/10/10") {
    val df = Pipeline.q40HashSplit(spark, sfDir).cache()
    val total = df.agg(sum("docs")).collect()(0).getLong(0)
    assert(total === spark.read.parquet(s"$sfDir/documents.parquet").count())
    val bySplit = df.groupBy("split").agg(sum("docs").as("n")).collect()
      .map(r => r.getAs[String]("split") -> r.getAs[Long]("n")).toMap
    assert(bySplit.keySet === Set("train", "validation", "test"))
    assert(bySplit("train").toDouble / total > 0.7)
    assert(bySplit("test").toDouble / total < 0.2)
  }

  test("knuth32 survives huge ids under ANSI and matches the naive formula below 2^32") {
    import spark.implicits._
    val ids = Seq(0L, 1L, 999L, 4294967295L, 4294967296L, 5000000000L,
      1L << 40, Long.MaxValue)
    val got = ids.toDF("doc_id")
      .withColumn("h", Pipeline.knuth32(col("doc_id")))
      .withColumn("split", Pipeline.splitCol(col("doc_id")))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("h")).toMap
    ids.foreach { id =>
      val expected = (BigInt(id & 0xFFFFFFFFL) * 2654435761L % BigInt(2).pow(32)).toLong
      assert(got(id) === expected, s"id=$id")
    }
  }

  test("q43 stratified sample: rates land near targets, totals partition the corpus") {
    val out = Pipeline.q43StratifiedSample(spark, sfDir).collect()
    val targets = Map("en" -> 0.5, "de" -> 0.35, "fr" -> 0.25, "es" -> 0.2)
    out.foreach { r =>
      val lang = r.getAs[String]("lang")
      val rate = r.getAs[Double]("achieved_rate")
      val t = targets.getOrElse(lang, 0.1)
      // ~100 docs per stratum: hash-sampling noise is a few percent
      assert(math.abs(rate - t) < 0.15, s"$lang achieved $rate vs target $t")
      assert(rate === r.getAs[Long]("kept_docs").toDouble / r.getAs[Long]("docs"))
      assert(r.getAs[Long]("kept_docs") <= r.getAs[Long]("docs"))
    }
    val total = out.map(_.getAs[Long]("docs")).sum
    assert(total === spark.read.parquet(s"$sfDir/documents.parquet").count())
  }

  test("q44 contamination matches a local 8-gram-overlap computation exactly") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def ngrams(t: String): Set[String] = {
      val w = t.split(" ")
      if (w.length < 8) Set.empty
      else (0 to w.length - 8).map(i => w.slice(i, i + 8).mkString(" ")).toSet
    }
    val bench = docs.filter(_._1 % 10 == 0).map { case (id, t) => id -> ngrams(t) }
    val benchNgrams = bench.values.flatten.toSet
    val expected = docs.filter(_._1 % 10 != 0).flatMap { case (id, t) =>
      val shared = ngrams(t) & benchNgrams
      if (shared.isEmpty) None
      else {
        val hitDocs = bench.count(_._2.exists(shared.contains))
        Some(id -> ((shared.size.toLong, hitDocs.toLong)))
      }
    }
    val got = Pipeline.q44Contamination(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("shared_ngrams"), r.getAs[Long]("benchmark_docs")))).toMap
    assert(got === expected)
  }

  test("label propagation reaches fixpoint on a chain longer than the old fixed-round reach") {
    import spark.implicits._
    // a 33-node path graph: diameter 32 > the 2^3=8 closed by the old
    // fixed 3 rounds — fixpoint must collapse it to a single cluster
    val n = 33
    val initial = (0 until n).map(i => (i.toLong, i.toLong)).toDF("doc_id", "rep")
    val edges = (0 until n - 1).map(i => (i.toLong, i.toLong + 1)).toDF("src", "dst")
    val labels = Pipeline.labelPropagate(initial, edges)
    val reps = labels.select("rep").distinct().collect().map(_.getLong(0))
    assert(reps.toSeq === Seq(0L), "the whole chain must collapse to rep 0")
    // and the documented failure of a fixed 3-round run is real:
    val truncated = Pipeline.labelPropagate(initial, edges, maxRounds = 3)
    assert(truncated.select("rep").distinct().count() > 1,
      "3 rounds cannot close diameter 32 — otherwise this test is vacuous")
  }

  test("q52 balanced sample: exactly k per stratum, deterministic, no window sort") {
    val df = Pipeline.q52BalancedSample(spark, sfDir)
    val rows = df.collect()
    val perLang = rows.groupBy(_.getAs[String]("lang"))
    val counts = spark.read.parquet(s"$sfDir/documents.parquet")
      .groupBy("lang").count().collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("count")).toMap
    perLang.foreach { case (lang, rs) =>
      assert(rs.length === math.min(50L, counts(lang)), lang)
      // ranks dense from 1, ordered by (hash, doc_id)
      val sorted = rs.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).sameElements(1 to rs.length))
      val keys = sorted.map(r => (r.getAs[Long]("hv"), r.getAs[Long]("doc_id")))
      assert(keys.sameElements(keys.sorted))
    }
    // deterministic across runs
    val again = Pipeline.q52BalancedSample(spark, sfDir).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("doc_id"))).toSet
    assert(again === rows.map(r => (r.getAs[String]("lang"), r.getAs[Long]("doc_id"))).toSet)
    // scale shape: mergeable aggregate, not a per-stratum window sort
    // (fresh frame: an executed adaptive plan prints initial+current,
    // double-counting nodes)
    val plan = Pipeline.q52BalancedSample(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.matches("(?s).*\\bWindow\\b.*"))
    assert("ObjectHashAggregate".r.findAllIn(plan).length === 2)
  }

  test("q49 sequence packing matches a local replay; chunks partition every shard's tokens") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").length.toLong)
      .sortBy(_._1)
    def knuth32(id: Long): Long = {
      val id32 = id & 0xFFFFFFFFL
      (((id32 >> 16) * 2654435761L & 0xFFFFFFFFL) * 65536L +
        (id32 & 0xFFFFL) * 2654435761L) & 0xFFFFFFFFL
    }
    val expected = docs.groupBy { case (id, _) => knuth32(id) % 8 }
      .toSeq.flatMap { case (shard, ds) =>
        var cum = 0L
        ds.sortBy(_._1).map { case (id, n) =>
          val start = cum; cum += n
          (shard, start / 512, id, n, cum)
        }
      }
      .groupBy { case (shard, chunk, _, _, _) => (shard, chunk) }
      .map { case ((shard, chunk), rows) =>
        (shard, chunk) -> ((rows.size.toLong, rows.map(_._4).sum,
          rows.map(_._3).min,
          rows.count { case (_, c, _, _, end) => end > (c + 1) * 512 }.toLong))
      }
    val got = Pipeline.q49SequencePack(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("chunk")) ->
        ((r.getAs[Long]("docs"), r.getAs[Long]("tokens"),
          r.getAs[Long]("first_doc"), r.getAs[Long]("boundary_docs")))).toMap
    assert(got === expected)
    // the prefix sum must parallelize across shards, not serialize on
    // a global ordering
    val plan = Pipeline.q49SequencePack(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(shard"),
      "window prefix-sum must partition by shard")
    assert(!plan.contains("SinglePartition"),
      "no global single-partition sort anywhere in the packing plan")
  }

  test("q74 token budget: selection matches the global order's prefix sum") {
    def mix32(v: Long): Long = {
      val mask = 4294967295L
      def mul(x: Long, m: Long): Long =
        (((x >> 16) * m % 4294967296L) * 65536 + (x & 65535) * m) & mask
      val a = mul(v & mask, 2654435761L)
      val b = a ^ (a >> 16)
      val d = mul(b, 2246822519L)
      d ^ (d >> 13)
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val scored = docs.map { case (id, t, nChars) =>
      val w = t.split(" ", -1)
      val n = w.length.toLong
      val stop = w.count(Set("join", "hash", "row")).toDouble / n
      val q = math.min(n.toDouble / 50.0, 1.0) * 0.4 + (1.0 - stop) * 0.3 +
        math.min(((nChars - n + 1).toDouble / n) / 6.0, 1.0) * 0.3
      (id, n, math.floor(q * 10).toLong, mix32(id))
    }
    val total = scored.map(_._2).sum
    val budget = total * 6 / 10
    val ordered = scored.sortBy { case (id, _, tier, hv) => (-tier, hv, id) }
    var cum = 0L
    val expected = ordered.flatMap { case (id, n, tier, _) =>
      val start = cum; cum += n
      if (start < budget) Some(id -> ((tier, n, start, start + n > budget)))
      else None
    }.toMap
    val got = Pipeline.q74TokenBudget(spark, sfDir).collect().map { r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    }.toMap
    assert(got.keySet === expected.keySet)
    got.foreach { case (id, v) => assert(v === expected(id), s"doc $id") }
    // budget semantics: selection covers the budget, at most one partial
    val selTokens = got.values.map(_._2).sum
    assert(selTokens >= budget, "selected docs must cover the budget")
    assert(got.values.count(_._4) <= 1, "at most one boundary doc")
    // the cut is a real subset — quality weighting must drop something
    assert(got.size < docs.length)
  }

  test("q94 shard manifest: matches the global curriculum order's shard rollup") {
    def mix32(v: Long): Long = {
      val mask = 4294967295L
      def mul(x: Long, m: Long): Long =
        (((x >> 16) * m % 4294967296L) * 65536 + (x & 65535) * m) & mask
      val a = mul(v & mask, 2654435761L)
      val b = a ^ (a >> 16)
      val d = mul(b, 2246822519L)
      d ^ (d >> 13)
    }
    val shardToks = 20000L
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val scored = docs.map { case (id, t, nChars) =>
      val w = t.split(" ", -1)
      val n = w.length.toLong
      val stop = w.count(Set("join", "hash", "row")).toDouble / n
      val q = math.min(n.toDouble / 50.0, 1.0) * 0.4 + (1.0 - stop) * 0.3 +
        math.min(((nChars - n + 1).toDouble / n) / 6.0, 1.0) * 0.3
      (id, n, math.floor(q * 10).toLong, mix32(id))
    }
    val ordered = scored.sortBy { case (id, _, tier, hv) => (-tier, hv, id) }
    var cum = 0L
    val rows = ordered.map { case (_, n, tier, _) =>
      val start = cum; cum += n
      (start / shardToks, n, tier, start,
        (start + n - 1) / shardToks > start / shardToks)
    }
    val expected = rows.groupBy(_._1).map { case (shard, rs) =>
      shard -> ((rs.length.toLong, rs.map(_._2).sum, rs.map(_._3).min,
        rs.map(_._3).max, rs.map(_._4).min, rs.count(_._5).toLong))
    }
    val got = Pipeline.q94ShardManifest(spark, sfDir).collect().map { r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    }.toMap
    assert(got === expected)
    // every shard except possibly the last holds >= its token budget
    // (docs are unsplit, so a shard closes only once it overflows)
    val lastShard = got.keys.max
    got.foreach { case (shard, (_, toks, _, _, _, _)) =>
      if (shard != lastShard)
        assert(toks >= shardToks - 500, s"shard $shard suspiciously light")
    }
  }

  test("q75 chunking: windows match a local replay and reconstruct the doc") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val expected = docs.flatMap { case (id, t) =>
      val w = t.split(" ", -1)
      val n = w.length
      val nChunks = if (n <= 64) 1 else 1 + (n - 64 + 47) / 48
      (0 until nChunks).map { i =>
        val start = i * 48
        val len = math.min(64, n - start)
        (id, i.toLong) -> ((start.toLong, len.toLong,
          w.slice(start, start + len).mkString(" ")))
      }
    }.toMap
    val got = Pipeline.q75Chunking(spark, sfDir).collect().map { r =>
      (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getString(4)))
    }.toMap
    assert(got.keySet === expected.keySet)
    got.foreach { case (k, v) => assert(v === expected(k), s"chunk $k") }
    // stride semantics: dropping each chunk's 16-token overlap tail
    // reconstructs the original token stream
    docs.foreach { case (id, t) =>
      val chunks = got.collect { case ((d, i), v) if d == id => (i, v) }
        .toSeq.sortBy(_._1)
      val rebuilt = chunks.map { case (i, (_, _, text)) =>
        val ws = text.split(" ", -1)
        if (i < chunks.length - 1) ws.take(48) else ws
      }.flatten.mkString(" ")
      assert(rebuilt === t, s"doc $id must reconstruct from its chunks")
    }
  }

  test("dedup pipeline: representatives are cluster minima; kept = distinct reps") {
    val labels = Pipeline.dedupCorpus(spark, sfDir).cache()
    // every rep is itself kept, and rep <= doc_id
    assert(labels.filter(col("rep") > col("doc_id")).count() === 0)
    val reps = labels.filter(col("kept")).select("doc_id").collect().map(_.getLong(0)).toSet
    val usedReps = labels.select("rep").distinct().collect().map(_.getLong(0)).toSet
    assert(usedReps.subsetOf(reps))
    // near-dup pairs always share a representative
    val pairs = Dedup.q21DedupMinhash(spark, sfDir).collect()
    val repOf = labels.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("rep")).toMap
    pairs.foreach { p =>
      assert(repOf(p.getAs[Long]("doc_a")) === repOf(p.getAs[Long]("doc_b")))
    }
  }

  test("q92 mixture realization matches a local integer replay") {
    import graft.functions.VectorKernels.mix32Int
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "lang", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3).split(" ", -1).length.toLong))
    val domains = docs.groupBy(d => (d._2, d._3))
    val totalTokens = docs.map(_._4).sum
    val nDomains = domains.size.toLong
    val expected = domains.map { case (k, ds) =>
      val toks = ds.map(_._4).sum
      val share = toks * 1000000L / totalTokens
      val w = math.min((1000000L / nDomains) * 100 / math.max(share, 1L), 1000L)
      val copies = ds.map(d =>
        w / 100 + (if (mix32Int(d._1) % 100 < w % 100) 1L else 0L))
      val tokensOut = ds.zip(copies).map { case (d, c) => c * d._4 }.sum
      k -> ((w, ds.length.toLong, copies.sum, toks, tokensOut))
    }
    val totalOut = expected.values.map(_._5).sum
    val got = Pipeline.q92MixtureSample(spark, sfDir).collect()
    assert(got.length === expected.size)
    got.foreach { r =>
      val e = expected((r.getAs[String]("lang"), r.getAs[String]("source")))
      assert((r.getAs[Long]("weight_pct"), r.getAs[Long]("docs_in"),
        r.getAs[Long]("docs_out"), r.getAs[Long]("tokens_in"),
        r.getAs[Long]("tokens_out")) === e)
      assert(r.getAs[Long]("realized_ppm") === e._5 * 1000000L / totalOut)
    }
    // the rebalance must move every domain's share TOWARD uniform
    // (or onto it) relative to the input mixture, up to the 10x cap
    // and integer granularity: no domain may overshoot to the other
    // side by more than the cap/rounding allow in this corpus
    val uniform = 1000000L / nDomains
    got.foreach { r =>
      val inShare = r.getAs[Long]("tokens_in") * 1000000L / totalTokens
      val outShare = r.getAs[Long]("realized_ppm")
      assert(math.abs(outShare - uniform) <= math.abs(inShare - uniform) + 1000,
        s"domain ${r.getAs[String]("lang")}/${r.getAs[String]("source")} moved away from uniform")
    }
  }
}
