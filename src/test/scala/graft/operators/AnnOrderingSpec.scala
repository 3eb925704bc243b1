package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture
import graft.functions.TopKDistinctAgg

/** Pins q25's candidate ordering (Ann.cosineDescIdAsc) against the
  * NaN/signed-zero regression class (ADVICE r11 / VERDICT r11 item 2):
  * a zero-norm embedding yields cosine = 0/0 = NaN, and Spark's `desc`
  * ranks NaN FIRST — so the aggregator's ordering must put NaN first
  * too, or the window-formulation oracle and the fused top-k diverge
  * exactly when the corpus grows a degenerate vector. The committed
  * corpora contain no zero-norm embeddings, so only this unit spec
  * catches a regression to the old negate-the-key form. */
class AnnOrderingSpec extends AnyFunSuite with SparkFixture {

  private val nan = Double.NaN
  // candidate stream: one NaN-scored candidate among finite ones,
  // duplicates arriving by "another LSH table" (identical payload)
  private val candidates = Seq(
    (0.9, 10L), (nan, 7L), (0.5, 2L), (0.9, 10L), (0.5, 1L),
    (nan, 7L), (-0.3, 4L), (0.5, 2L))

  private def aggTopK(xs: Seq[(Double, Long)], k: Int): Seq[(Double, Long)] = {
    val agg = new TopKDistinctAgg[(Double, Long)](k, Ann.cosineDescIdAsc)
    xs.foldLeft(agg.zero)(agg.reduce) match { case buf => agg.finish(buf) }
  }

  /** Scala `==` unboxes doubles, so NaN != NaN even inside tuples —
    * compare payloads by bit pattern instead. */
  private def bits(t: (Double, Long)): (Long, Long) =
    (java.lang.Double.doubleToLongBits(t._1), t._2)

  test("NaN cosine ranks first, where Spark's desc puts it") {
    val got = aggTopK(candidates, 5)
    assert(got.head._2 === 7L, "zero-norm candidate must rank first")
    assert(got.head._1.isNaN)
    // full order: NaN, 0.9, then the 0.5 tie broken by neighbor_id ASC
    assert(got.map(_._2) === Seq(7L, 10L, 1L, 2L, 4L))
  }

  test("aggregator order equals Spark (desc, asc) sort order") {
    val spark2 = spark
    import spark2.implicits._
    val sparkOrder = candidates.toDF("cosine", "neighbor_id")
      .distinct()
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
      .as[(Double, Long)].collect().toSeq
    assert(aggTopK(candidates, 5).map(bits) === sparkOrder.map(bits).toSeq,
      "TopKDistinctAgg with cosineDescIdAsc must reproduce Spark's" +
        " desc_nulls-style NaN-first descending order")
  }

  test("duplicate NaN routes dedupe like any other payload") {
    // two tables deliver the same (NaN, 7) pair: ord.equiv must treat
    // them as one element (TotalOrdering makes NaN == NaN), or a
    // degenerate vector would eat two of the k slots
    val got = aggTopK(Seq((nan, 7L), (nan, 7L), (0.9, 10L)), 2)
    assert(got.map(bits) === Seq((nan, 7L), (0.9, 10L)).map(bits))
    assert(got.count(_._1.isNaN) === 1)
  }

  test("merge path keeps NaN first across partial buffers") {
    val agg = new TopKDistinctAgg[(Double, Long)](3, Ann.cosineDescIdAsc)
    val a = Seq((0.9, 10L), (0.5, 2L)).foldLeft(agg.zero)(agg.reduce)
    val b = Seq((nan, 7L), (0.8, 3L)).foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(agg.merge(a, b)).map(_._2) === Seq(7L, 10L, 3L))
  }

  test("the old negate-the-key form misplaces NaN (discriminates)") {
    // the pre-r11 formulation: Ordering.by(t => (-t._1, t._2)). -NaN is
    // still NaN, and TotalOrdering (un-reversed) sorts NaN LAST — so
    // the zero-norm candidate silently drops out of the top k. This
    // assertion proves the suite distinguishes the two forms: were
    // cosineDescIdAsc regressed to the old shape, the first test fails.
    val oldOrd: Ordering[(Double, Long)] =
      Ordering.by[(Double, Long), (Double, Long)](t => (-t._1, t._2))(
        Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long))
    val agg = new TopKDistinctAgg[(Double, Long)](5, oldOrd)
    val got = agg.finish(candidates.foldLeft(agg.zero)(agg.reduce))
    assert(got.last._1.isNaN, "old form sorts NaN last — the bug")
    assert(got.head._2 === 10L)
  }
}
