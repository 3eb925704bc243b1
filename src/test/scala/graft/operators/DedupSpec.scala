package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

class DedupSpec extends AnyFunSuite with SparkFixture {

  test("q20 exact dedup: one group per distinct text, keeps min doc_id") {
    val df = Dedup.q20DedupExact(spark, sfDir).cache()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    assert(df.count() === docs.select("text").distinct().count())
    assert(df.agg(sum("dup_count")).collect()(0).getLong(0) === docs.count())
  }

  test("minhash LSH finds planted near-duplicates and skips unrelated docs") {
    // ground truth: exact trigram jaccard >= 0.5 pairs on the corpus
    val withTri = spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("tri", Dedup.shingles3)
      .select(col("doc_id"), col("tri"))
    val truth = withTri.as("a").join(withTri.as("b"), col("a.doc_id") < col("b.doc_id"))
      .withColumn("j", size(array_intersect(col("a.tri"), col("b.tri"))).cast("double") /
        size(array_union(col("a.tri"), col("b.tri"))))
      .filter(col("j") >= 0.5)
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val found = Dedup.q21DedupMinhash(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    // LSH with 32 bands x 4 rows has ~100% recall at J>=0.5 on this corpus
    assert(found === truth)
    assert(found.nonEmpty)
  }

  test("simhash of identical texts collides at hamming 0") {
    import spark.implicits._
    val two = Seq((1L, "alpha beta gamma delta epsilon zeta"), (2L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val sim = two
      .withColumn("w", split(col("text"), " "))
      .withColumn("simhash", expr(
        """aggregate(sequence(0, 63), 0L,
             (acc, j) -> acc + IF(
               aggregate(w, 0L,
                 (a, x) -> a + IF((shiftright(xxhash64(x), j) & 1) = 1, 1L, -1L)) >= 0,
               shiftleft(1L, j), 0L))"""))
      .select("simhash").collect().map(_.getLong(0))
    assert(sim(0) === sim(1))
  }

  test("q22 simhash pairs are EXACTLY the all-pairs hamming <= 3 set") {
    // ground truth: brute-force all-pairs hamming over the same
    // engine-neutral signature — the chunk pigeonhole (4 disjoint
    // 16-bit chunks) must lose nothing at hamming <= 3
    import org.apache.spark.sql.graftbridge.Bridge.{column => exprCol, expression}
    val sig = spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("simhash", exprCol(graft.functions.SimhashWords(
        expression(split(col("text"), " ")))))
      .select(col("doc_id"), col("simhash"))
    val truth = sig.as("a").join(sig.as("b"), col("a.doc_id") < col("b.doc_id"))
      .withColumn("h", bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))))
      .filter(col("h") <= 3)
      .select(col("a.doc_id"), col("b.doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rows = Dedup.q22DedupSimhash(spark, sfDir).collect()
    val found = rows.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(found === truth)
    assert(found.nonEmpty)
    assert(rows.forall(_.getAs[Long]("hamming") <= 3))
  }

  test("wordHash64 matches the documented engine-neutral arithmetic") {
    import org.apache.spark.unsafe.types.UTF8String
    def ref(s: String): Long = {
      val h = s.codePoints().toArray.foldLeft(0L)((a, c) => (a * 31 + c) % 4294967296L)
      val hi = (BigInt(h) * 2654435761L % 4294967296L).toLong
      val lo = (BigInt(h) * 2246822519L % 4294967296L).toLong
      (hi << 32) | lo
    }
    Seq("", "a", "hash", "longerwordhere", "zz9").foreach { w =>
      assert(graft.functions.SketchKernels.wordHash64(UTF8String.fromString(w)) === ref(w))
    }
  }

  test("q23 jaccard is symmetric-bounded and deterministic") {
    val rows = Dedup.q23NgramJaccard(spark, sfDir).collect()
    assert(rows.forall { r =>
      val j = r.getAs[Double]("jaccard"); j >= 0.02 && j <= 1.0
    })
  }

  test("short documents (<3 / <8 words) yield empty shingles and NULL fingerprints, not ANSI crashes") {
    import spark.implicits._
    val df = Seq(
      (1L, ""), (2L, "one"), (3L, "one two"), (4L, "a b c"),
      (5L, "a b c d e f g"), (6L, "a b c d e f g h"))
      .toDF("doc_id", "text")
      .withColumn("s3", Dedup.shingles3)
      .withColumn("th", Dedup.triHash)
      .withColumn("w", split(col("text"), " "))
      .withColumn("fp", Dedup.fingerprint8)
    val rows = df.collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    // "" splits to [""] (1 token); 1-2 word docs have no 3-shingles
    Seq(1L, 2L, 3L).foreach { id =>
      assert(rows(id).getAs[scala.collection.Seq[String]]("s3").isEmpty)
      assert(rows(id).getAs[scala.collection.Seq[Long]]("th").isEmpty)
    }
    assert(rows(4L).getAs[scala.collection.Seq[String]]("s3").length === 1)
    assert(rows(4L).getAs[scala.collection.Seq[Long]]("th").length === 1)
    // <8 words -> NULL fingerprint; 8 words -> exactly one window
    Seq(1L, 2L, 3L, 4L, 5L).foreach(id => assert(rows(id).isNullAt(rows(id).fieldIndex("fp"))))
    assert(!rows(6L).isNullAt(rows(6L).fieldIndex("fp")))
  }

  test("q29 fingerprint is deterministic and shift-stable on a tail edit") {
    import spark.implicits._
    val words = (1 to 20).map(i => s"w$i").mkString(" ")
    val edited = words + " extrawordatend"
    val df = Seq((1L, words), (2L, words), (3L, edited)).toDF("doc_id", "text")
      .withColumn("w", split(col("text"), " "))
      .withColumn("fp", expr(
        """array_min(transform(
             sequence(0, size(w) - 8),
             i -> aggregate(
               sequence(0, 7), 0L,
               (acc, k) -> acc * 31 + (length(element_at(w, i + k + 1)) * 131
                                       + ascii(element_at(w, i + k + 1))))))"""))
      .select("doc_id", "fp").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(df(1L) === df(2L)) // deterministic
    // appending one word adds windows but keeps the existing minimum
    // unless the new windows hash lower; the min can only decrease
    assert(df(3L) <= df(1L))
  }

  test("q63 boilerplate: fractions match a local string-shingle replay") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def grams(t: String): Set[String] = {
      val w = t.split(" ", -1)
      if (w.length < 8) Set.empty
      else w.sliding(8).map(_.mkString(" ")).toSet
    }
    val sets = docs.map { case (id, t) => id -> grams(t) }.filter(_._2.nonEmpty)
    val freq = sets.flatMap(_._2).groupBy(p => p).map { case (g, v) => g -> v.length }
    val expected = sets.map { case (id, s) =>
      val shared = s.count(g => freq(g) >= 2)
      id -> ((s.size.toLong, shared.toLong))
    }.toMap
    val got = Dedup.q63Boilerplate(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === expected)
    // the seeded corpus contains near-dup docs: shared spans must exist
    assert(expected.values.exists(_._2 > 0))
  }

  test("q73 incremental dedup: flags match an exact batch-vs-index replay") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def tri(t: String): Set[String] = {
      val w = t.split(" ", -1)
      if (w.length < 3) Set.empty
      else w.sliding(3).map(_.mkString(" ")).toSet
    }
    val batch = docs.filter(_._1 % 10 == 0)
    val index = docs.filter(_._1 % 10 != 0)
    val expected = batch.map { case (id, t) =>
      val exact = index.count(_._2 == t).toLong
      val s = tri(t)
      val near: Seq[Double] = if (s.isEmpty) Seq.empty
        else index.toSeq.flatMap { case (_, it) =>
          val si = tri(it)
          if (si.isEmpty) None
          else {
            val j = (s & si).size.toDouble / (s | si).size
            if (j >= 0.5) Some(j) else None
          }
        }
      id -> ((exact > 0, near.length.toLong,
        if (near.isEmpty) None else Some(near.max),
        exact > 0 || near.nonEmpty))
    }.toMap
    val got = Dedup.q73IncrementalDedup(spark, sfDir).collect().map { r =>
      r.getLong(0) -> ((r.getBoolean(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)), r.getBoolean(4)))
    }.toMap
    assert(got.keySet === expected.keySet, "one row per batch doc, dup or not")
    got.foreach { case (id, v) => assert(v === expected(id), s"batch doc $id") }
    // the seeded corpus must exercise the near-dup path
    assert(expected.values.exists(_._4))
  }

  test("q73 and q21 agree: incremental near-dups = corpus pairs cut to batch x index") {
    // two independent formulations (batch->index band claims vs full
    // corpus self-join) must see exactly the same cross-split pairs
    val corpusPairs = Dedup.q21DedupMinhash(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val crossSplit = corpusPairs.flatMap { case (a, b, j) =>
      if (a % 10 == 0 && b % 10 != 0) Some((a, j))
      else if (b % 10 == 0 && a % 10 != 0) Some((b, j))
      else None
    }.groupBy(_._1).map { case (id, v) =>
      id -> ((v.length.toLong, v.map(_._2).max))
    }
    val q73near = Dedup.q73IncrementalDedup(spark, sfDir).collect()
      .filter(_.getLong(2) > 0)
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(q73near === crossSplit)
  }

  test("q79 containment matches an exact string-4-gram replay and is direction-aware") {
    // ground truth: string 4-gram sets, all ordered pairs
    val withNg = spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("ng", Dedup.shingles(4))
      .select(col("doc_id"), col("ng"))
    val truth = withNg.as("a").join(withNg.as("b"), col("a.doc_id") =!= col("b.doc_id"))
      .withColumn("inter", size(array_intersect(col("a.ng"), col("b.ng"))))
      .withColumn("c", col("inter").cast("double") / size(col("a.ng")))
      .filter(col("c") >= 0.5)
      .select(col("a.doc_id").as("src"), col("b.doc_id").as("tgt"), col("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val got = Dedup.q79Containment(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_src"), r.getAs[Long]("doc_tgt")) ->
        r.getAs[Double]("containment")).toMap
    assert(got === truth)
    assert(got.nonEmpty)
    // directionality: containment(a in b) uses |a|'s size, so a pair of
    // unequal-sized docs has different scores per direction when both appear
    val bothDirs = got.keySet.filter { case (a, b) => got.contains((b, a)) }
    assert(bothDirs.nonEmpty)
  }

  test("q83 dup spans match a string-gram islands replay and an LCS cross-check") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" "))
    // replay: positional string 4-grams -> shared (pair, delta, ia) -> islands
    val posts = docs.flatMap { case (id, ws) =>
      ws.sliding(4).zipWithIndex.collect {
        case (g, i) if g.length == 4 => (g.mkString(" "), id, i)
      }
    }.groupBy(_._1)
    val sharedCells = posts.values.iterator.flatMap { hits =>
      for {
        (_, da, ia) <- hits.iterator
        (_, db, ib) <- hits.iterator
        if da < db
      } yield ((da, db, ia - ib), ia)
    }.toSeq.distinct
    val expected = sharedCells.groupBy(_._1).toSeq.flatMap { case ((da, db, _), cells) =>
      val ias = cells.map(_._2).sorted
      // islands: consecutive ia runs
      val runs = ias.foldLeft(List.empty[List[Int]]) {
        case (acc, i) if acc.nonEmpty && acc.head.head == i - 1 =>
          (i :: acc.head) :: acc.tail
        case (acc, i) => List(i) :: acc
      }
      runs.map(r => (da, db) -> (r.length + 3))
    }.groupBy(_._1).map { case (pair, spans) =>
      pair -> ((spans.map(_._2).max.toLong, spans.size.toLong))
    }.filter(_._2._1 >= 10)
    val got = Dedup.q83DupSpan(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(got === expected)
    assert(got.nonEmpty)
    // independent cross-check: the top pair's span equals the true
    // longest common contiguous word run, by dynamic programming
    val ((ta, tb), (topSpan, _)) = got.maxBy(_._2._1)
    val (wa, wb) = (docs.toMap.apply(ta), docs.toMap.apply(tb))
    val dp = Array.ofDim[Int](wa.length + 1, wb.length + 1)
    var best = 0
    for (i <- 1 to wa.length; j <- 1 to wb.length) {
      if (wa(i - 1) == wb(j - 1)) {
        dp(i)(j) = dp(i - 1)(j - 1) + 1
        if (dp(i)(j) > best) best = dp(i)(j)
      }
    }
    assert(topSpan === best.toLong)
  }
}
