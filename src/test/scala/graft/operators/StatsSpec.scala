package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Local ground truth for the statistical operators: both are
  * re-derived from a collect of the sf0.001 events, independent of
  * the Spark plan and the DuckDB oracle. */
class StatsSpec extends AnyFunSuite with SparkFixture {

  private lazy val events = graft.sources.Tables.events(spark, sfDir)
    .selectExpr("user_id", "event_type", "value",
      "CAST(CAST(ts AS DATE) AS STRING) AS day")
    .collect()
    .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3)))

  test("q67: pearson r matches a local computation on the dense grid") {
    val days = events.map(_._4).distinct.sorted
    val types = events.map(_._2).distinct.sorted
    val cnt = events.groupBy(e => (e._4, e._2)).map { case (k, v) => k -> v.length.toLong }
    def series(t: String): Seq[Long] = days.map(d => cnt.getOrElse((d, t), 0L))
    val expected = (for {
      a <- types; b <- types if a < b
    } yield {
      val (xs, ys) = (series(a), series(b))
      val n = xs.length.toLong
      val (sx, sy) = (xs.sum, ys.sum)
      val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
      val (sxx, syy) = (xs.map(x => x * x).sum, ys.map(y => y * y).sum)
      val den = math.sqrt((n * sxx - sx * sx).toDouble) *
        math.sqrt((n * syy - sy * sy).toDouble)
      (a, b) -> (n, sx, sy,
        if (den > 0) Some((n * sxy - sx * sy).toDouble / den) else None)
    }).toMap
    val got = Stats.q67Correlation(spark, sfDir).collect().map { r =>
      (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4),
          if (r.isNullAt(5)) None else Some(r.getDouble(5)))
    }.toMap
    assert(got.keySet === expected.keySet)
    got.foreach { case (k, (n, sx, sy, rv)) =>
      val (en, esx, esy, erv) = expected(k)
      assert((n, sx, sy) === (en, esx, esy), s"sums for $k")
      (rv, erv) match {
        case (Some(g), Some(e)) => assert(g === e, s"r for $k (exact)")
        case (g, e)             => assert(g === e, s"r presence for $k")
      }
    }
    // sanity: |r| <= 1 for every pair
    got.values.flatMap(_._4).foreach(r => assert(math.abs(r) <= 1.0))
  }

  test("q68: variant cells and z match a local replay of the same hash") {
    def mix32(v: Long): Long = {
      val mask = 4294967295L
      def mul(x: Long, m: Long): Long =
        (((x >> 16) * m % 4294967296L) * 65536 + (x & 65535) * m) & mask
      val a = mul(v & mask, 2654435761L)
      val b = a ^ (a >> 16)
      val d = mul(b, 2246822519L)
      d ^ (d >> 13)
    }
    val perUser = events.groupBy(_._1).map { case (uid, rows) =>
      val p = rows.filter(_._2 == "purchase")
      (mix32(uid) % 2,
        if (p.nonEmpty) 1L else 0L,
        p.map(e => BigDecimal(e._3).setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum)
    }.toSeq
    val (va, vb) = perUser.partition(_._1 == 0)
    assert(va.nonEmpty && vb.nonEmpty, "both variants populated")
    val (na, nb) = (va.length.toLong, vb.length.toLong)
    val (ca, cb) = (va.map(_._2).sum, vb.map(_._2).sum)
    val rateA = ca.toDouble / na.toDouble
    val rateB = cb.toDouble / nb.toDouble
    val pooled = (ca + cb).toDouble / (na + nb).toDouble
    val se = math.sqrt(pooled * (1.0 - pooled) * (1.0 / na + 1.0 / nb))

    val r = Stats.q68Experiment(spark, sfDir).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      === (na, nb, ca, cb))
    assert(r.getDouble(4) === rateA)
    assert(r.getDouble(5) === rateB)
    if (se > 0) assert(r.getDouble(6) === (rateA - rateB) / se)
    assert(r.getDouble(7) === (va.map(_._3).sum.toDouble / na.toDouble))
    assert(r.getDouble(8) === (vb.map(_._3).sum.toDouble / nb.toDouble))
  }

  test("q68: assignment is not the parity split (the knuth32 trap)") {
    val uids = events.map(_._1).distinct
    def mix32(v: Long): Long = {
      val mask = 4294967295L
      def mul(x: Long, m: Long): Long =
        (((x >> 16) * m % 4294967296L) * 65536 + (x & 65535) * m) & mask
      val a = mul(v & mask, 2654435761L)
      val b = a ^ (a >> 16)
      val d = mul(b, 2246822519L)
      d ^ (d >> 13)
    }
    assert(uids.exists(u => mix32(u) % 2 != u % 2),
      "mix32 % 2 must not degenerate to user_id % 2")
  }

  test("q81: chi-square drift matches a local contingency replay") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("source", "text").collect()
      .flatMap(r => r.getString(1).split(" ").map(w => (r.getString(0), w)))
    val cells = docs.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val rowTot = cells.groupBy(_._1._1).map { case (s, m) => s -> m.values.sum }
    val colTot = cells.groupBy(_._1._2).map { case (t, m) => t -> m.values.sum }
    val nSources = cells.groupBy(_._1._2).map { case (t, m) => t -> m.size.toLong }
    val nTot = rowTot.values.sum
    val chi = cells.toSeq.map { case ((s, t), o) =>
      val e = rowTot(s).toDouble * colTot(t).toDouble / nTot.toDouble
      t -> math.floor((o.toDouble - e) * (o.toDouble - e) / e * 1000000.0).toLong
    }.groupBy(_._1).map { case (t, v) => t -> v.map(_._2).sum }
    val expected = chi.toSeq.sortBy { case (t, c) => (-c, t) }.take(20)
      .zipWithIndex.map { case ((t, c), i) =>
        t -> ((c, colTot(t), nSources(t), i + 1))
      }.toMap
    val got = Stats.q81ChisqDrift(spark, sfDir).collect().map { r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4)))
    }.toMap
    assert(got === expected)
    // a non-degenerate corpus must show nonzero drift somewhere
    assert(got.values.exists(_._1 > 0))
  }

  test("q84: top correlated dim pairs match a local sufficient-stats replay") {
    val q = spark.read.parquet(s"$sfDir/embeddings.parquet").collect()
      .map(_.getAs[Seq[Float]]("embedding").map(x =>
        math.floor(x.toDouble * Clustering.QuantScale).toLong).toArray)
    val n = q.length.toLong
    val dim = 64
    val sx = Array.tabulate(dim)(i => q.map(v => BigInt(v(i))).sum)
    val sxx = Array.tabulate(dim)(i => q.map(v => BigInt(v(i)) * v(i)).sum)
    def corr(i: Int, j: Int): Double = {
      val sxy = q.map(v => BigInt(v(i)) * v(j)).sum
      val cnum = n.toDouble * sxy.toDouble - sx(i).toDouble * sx(j).toDouble
      cnum / (math.sqrt(n.toDouble * sxx(i).toDouble - sx(i).toDouble * sx(i).toDouble) *
        math.sqrt(n.toDouble * sxx(j).toDouble - sx(j).toDouble * sx(j).toDouble))
    }
    val all = for (i <- 0 until dim; j <- i + 1 until dim) yield (i, j, corr(i, j))
    val expected = all.sortBy { case (i, j, c) => (-math.abs(c), i, j) }.take(20)
      .zipWithIndex.map { case ((i, j, c), r) => (i, j, r + 1) -> c }.toMap
    val got = Stats.q84EmbedStats(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(4)) -> r.getDouble(3)).toMap
    assert(got.keySet === expected.keySet)
    got.foreach { case (k, c) => assert(math.abs(c - expected(k)) < 1e-12, s"$k") }
  }

  test("q96: power iteration matches a single-threaded integer replay") {
    val dim = 64
    val vecs = graft.sources.Tables.embeddings(spark, sfDir)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(x =>
        math.floor(x.toDouble * 4096.0).toLong).toArray)
    val n = vecs.length.toLong
    val g = Array.ofDim[Long](dim, dim)
    for (i <- 0 until dim; j <- i until dim) {
      val s = vecs.map(v => v(i) * v(j)).sum
      val d = Math.floorDiv(s, n)
      g(i)(j) = d; g(j)(i) = d
    }
    var v = Array.fill(dim)(10000L)
    for (_ <- 1 to 5) {
      val w = Array.tabulate(dim)(i => (0 until dim).map(j => g(i)(j) * v(j)).sum)
      val m = w.map(math.abs).max
      v = w.map(x => Math.floorDiv(x * 10000L, m))
    }
    val wf = Array.tabulate(dim)(i => (0 until dim).map(j => g(i)(j) * v(j)).sum)
    val num = v.indices.map(i => BigInt(v(i)) * BigInt(wf(i))).sum
    val den = v.map(x => BigInt(x) * BigInt(x)).sum
    val lambda = ((num - num.mod(den)) / den).toLong
    val got = Stats.q96PcaPower(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.size === dim)
    (0 until dim).foreach { i =>
      assert(got(i.toLong) === ((v(i), lambda)), s"dim $i")
    }
    // the result is a direction: the max-|loading| dim sits at ±10000
    assert(got.values.map(p => math.abs(p._1)).max === 10000L)
  }

  test("GramTriangleAgg is exact past int64 and flush/merge-order free") {
    import graft.functions.GramTriangleAgg
    // dim=2, components at the 2^24 quantization scale: products are
    // 2^48, so 40,000 unflushed rows (> 2^15) would overflow a long —
    // only the periodic decimal-string flush keeps the sum exact
    // (true total 40,000 * 2^48 ≈ 1.13e19 > Long.MaxValue ≈ 9.2e18).
    val agg = new GramTriangleAgg(2, strict = true, flushEvery = 8192)
    val big = 1L << 24
    val n = 40000
    val rows = Seq.fill(n)(Seq(big, big))
    val whole = rows.foldLeft(agg.zero)(agg.reduce)
    val expect = (BigInt(n) * (BigInt(1) << 48)).toString
    assert(BigInt(expect) > BigInt(Long.MaxValue), "test must cross int64")
    assert(agg.finish(whole).map(c => (c.i, c.j, c.s)) === Seq((0, 1, expect)))
    // merge of two half-streams gives the identical carry
    val (l, r) = rows.splitAt(17000)
    val merged = agg.merge(l.foldLeft(agg.zero)(agg.reduce),
      r.foldLeft(agg.zero)(agg.reduce))
    assert(agg.finish(merged).head.s === expect)
    // a component past the overflow-safety bound is rejected loudly
    intercept[IllegalArgumentException] {
      agg.reduce(agg.zero, Seq(1L << 31, 1L << 31))
    }
    // non-strict triangle matches a brute-force on deterministic data,
    // with a flush forced mid-stream
    val d3 = new GramTriangleAgg(3, strict = false, flushEvery = 1)
    val vs = Seq(Seq(1L, -2L, 3L), Seq(-4L, 5L, 6L), Seq(7L, 8L, -9L))
    val got = d3.finish(vs.foldLeft(d3.zero)(d3.reduce))
      .map(c => (c.i, c.j) -> c.s).toMap
    for (i <- 0 until 3; j <- i until 3) {
      val brute = vs.map(v => BigInt(v(i)) * BigInt(v(j))).sum.toString
      assert(got((i, j)) === brute, s"cell ($i,$j)")
    }
  }
}
