package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

class LearnSpec extends AnyFunSuite with SparkFixture {

  test("q99 batch perceptron matches a local single-threaded replay") {
    val stop = Set("join", "hash", "row")
    val feats = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text", "n_chars").collect()
      .map { r =>
        val w = r.getString(1).split(" ", -1)
        val x1 = w.length.toLong
        val x2 = r.getLong(2) / 100
        val x3 = w.count(stop.contains).toLong
        val x4 = (r.getLong(2) - x1 + 1) * 1000 / x1
        val y = if (x1 >= 40 && 5 * x3 <= x1) 1L else -1L
        (x1, x2, x3, x4, y)
      }
    var w = Array.fill(5)(0L)
    val expected = (1 to 5).map { epoch =>
      var mis = 0L
      val g = Array.fill(5)(0L)
      feats.foreach { case (x1, x2, x3, x4, y) =>
        val dot = w(0) + w(1) * x1 + w(2) * x2 + w(3) * x3 + w(4) * x4
        if (y * dot <= 0) {
          mis += 1
          g(0) += y; g(1) += y * x1; g(2) += y * x2; g(3) += y * x3; g(4) += y * x4
        }
      }
      w = Array.tabulate(5)(j => w(j) + g(j))
      (epoch.toLong, mis, w(0), w(1), w(2), w(3), w(4))
    }
    val got = Learn.q99Perceptron(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
      .sortBy(_._1).toSeq
    assert(got === expected)
    // the model must actually learn: epoch-1 updates on every doc
    // (w=0 misclassifies everything), later epochs on strictly fewer
    assert(expected.head._2 === feats.length.toLong)
    assert(expected.last._2 < feats.length.toLong,
      "training must reduce the misclassified set below 'all of them'")
  }
}
