package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Local ground truth for the Count-Min sketch: replay the d×w
  * counter matrix and every probe estimate from a collect of the
  * sf0.001 lineitem keys. */
class SketchesSpec extends AnyFunSuite with SparkFixture {

  private def mix32(v: Long): Long = {
    val mask = 4294967295L
    def mul(x: Long, m: Long): Long =
      (((x >> 16) * m % 4294967296L) * 65536 + (x & 65535) * m) & mask
    val a = mul(v & mask, 2654435761L)
    val b = a ^ (a >> 16)
    val d = mul(b, 2246822519L)
    d ^ (d >> 13)
  }

  private def bucket(key: Long, row: Int): (Int, Long) =
    (row, mix32(key + row.toLong * 1000003L) % Sketches.Width)

  test("q64: estimates equal a local sketch replay and never undercount") {
    val keys = graft.sources.Tables.lineitem(spark, sfDir)
      .select("l_partkey").collect().map(_.getLong(0))
    val cells = keys.flatMap(k => (0 until Sketches.Depth).map(bucket(k, _)))
      .groupBy(identity).map { case (c, v) => c -> v.length.toLong }
    val exact = keys.filter(_ < 25).groupBy(identity)
      .map { case (k, v) => k -> v.length.toLong }
    val got = Sketches.q64Countmin(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got.keySet === (0L until 25L).toSet)
    got.foreach { case (k, (ex, est, over)) =>
      val expectedEst = (0 until Sketches.Depth)
        .map(i => cells.getOrElse(bucket(k, i), 0L)).min
      assert(ex === exact.getOrElse(k, 0L), s"exact for $k")
      assert(est === expectedEst, s"estimate for $k")
      assert(est >= ex, s"CM must never undercount ($k)")
      assert(over === est - ex)
    }
  }

  test("q64: the sketch is mergeable — split-and-merge equals one pass") {
    val keys = graft.sources.Tables.lineitem(spark, sfDir)
      .select("l_partkey").collect().map(_.getLong(0))
    val (h1, h2) = keys.splitAt(keys.length / 2)
    def sketchOf(ks: Array[Long]) =
      ks.flatMap(k => (0 until Sketches.Depth).map(bucket(k, _)))
        .groupBy(identity).map { case (c, v) => c -> v.length.toLong }
    val merged = (sketchOf(h1).toSeq ++ sketchOf(h2).toSeq)
      .groupBy(_._1).map { case (c, v) => c -> v.map(_._2).sum }
    assert(merged === sketchOf(keys))
  }
}
