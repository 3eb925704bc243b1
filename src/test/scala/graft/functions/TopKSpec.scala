package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class TopKSpec extends AnyFunSuite {

  // score DESC, id ASC — the q25 payload shape
  private val ord: Ordering[(Double, Long)] = Ordering.by(t => (-t._1, t._2))

  test("TopKDistinctAgg: duplicate routes of one element occupy one slot") {
    val agg = new TopKDistinctAgg[(Double, Long)](3, ord)
    // neighbor 7 collides in 3 tables (3 identical rows); without the
    // distinct contract it would fill the whole top-3
    val rows = Seq((0.9, 7L), (0.9, 7L), (0.9, 7L), (0.8, 2L), (0.7, 5L), (0.6, 1L))
    val buf = rows.foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(buf) === Seq((0.9, 7L), (0.8, 2L), (0.7, 5L)))
  }

  test("TopKDistinctAgg: distinct ids with equal scores are NOT deduped") {
    val agg = new TopKDistinctAgg[(Double, Long)](3, ord)
    val rows = Seq((0.9, 7L), (0.9, 3L), (0.9, 7L), (0.9, 9L))
    val buf = rows.foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(buf) === Seq((0.9, 3L), (0.9, 7L), (0.9, 9L)))
  }

  test("TopKDistinctAgg: merge dedups across partial buffers and keeps order") {
    val agg = new TopKDistinctAgg[(Double, Long)](3, ord)
    val a = Seq((0.9, 7L), (0.7, 5L)).foldLeft(agg.zero)(agg.reduce)
    val b = Seq((0.9, 7L), (0.8, 2L), (0.6, 1L)).foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(agg.merge(a, b)) === Seq((0.9, 7L), (0.8, 2L), (0.7, 5L)))
    assert(agg.finish(agg.merge(b, a)) === Seq((0.9, 7L), (0.8, 2L), (0.7, 5L)))
  }

  test("TopKDistinctAgg: duplicate of the k-th element is rejected, better still enters") {
    val agg = new TopKDistinctAgg[(Double, Long)](2, ord)
    val buf = Seq((0.9, 7L), (0.7, 5L), (0.7, 5L)).foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(buf) === Seq((0.9, 7L), (0.7, 5L)))
    val buf2 = agg.reduce(buf, (0.8, 2L))
    assert(agg.finish(buf2) === Seq((0.9, 7L), (0.8, 2L)))
  }

  test("TopKDistinctAgg matches sort-distinct-take on random streams with duplicates") {
    val rnd = new scala.util.Random(20260816L)
    for (trial <- 1 to 50) {
      val k = 1 + rnd.nextInt(6)
      val agg = new TopKDistinctAgg[(Double, Long)](k, ord)
      // small value domains force both duplicate routes and score ties
      val rows = Vector.fill(1 + rnd.nextInt(60))(
        (rnd.nextInt(8) / 10.0, rnd.nextInt(10).toLong))
      val expected = rows.distinct.sorted(ord).take(k)
      // single-buffer fold
      assert(agg.finish(rows.foldLeft(agg.zero)(agg.reduce)) === expected,
        s"trial $trial fold")
      // random 3-way partition + merge (map-side combine shape)
      val parts = rows.groupBy(_ => rnd.nextInt(3)).values.toSeq
      val merged = parts.map(_.foldLeft(agg.zero)(agg.reduce))
        .reduce(agg.merge)
      assert(agg.finish(merged) === expected, s"trial $trial merge")
    }
  }
}
