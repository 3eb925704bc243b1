package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

class ClusteringSpec extends AnyFunSuite with SparkFixture {

  test("kmeans separates two obvious blobs") {
    import spark.implicits._
    // blob A near (10,10,...), blob B near (-10,-10,...); k=2
    def vec(base: Float, jitter: Float) = Array.fill(8)(base).zipWithIndex
      .map { case (v, i) => v + jitter * (i % 3) }
    val rows = (0L to 5L).map(i => (i, vec(10f, 0.1f * i))) ++
      (6L to 11L).map(i => (i, vec(-10f, 0.1f * i)))
    val df = rows.toDF("vec_id", "embedding")
    df.createOrReplaceTempView("___blobs")
    // run assignment with centroids from each blob
    val centroids = Array(Array.fill(8)(10.0), Array.fill(8)(-10.0))
    val out = Clustering.assign(df, centroids).collect()
    out.foreach { r =>
      val expected = if (r.getAs[Long]("vec_id") <= 5L) 0 else 1
      assert(r.getAs[Int]("cluster") === expected)
    }
  }

  test("q32 produces k clusters partitioning the corpus, with silhouette in [-1,1]") {
    val out = Clustering.q32Kmeans(spark, sfDir).collect()
    assert(out.length <= 10 && out.nonEmpty)
    val total = out.map(_.getAs[Long]("n")).sum
    assert(total === spark.read.parquet(s"$sfDir/embeddings.parquet").count())
    assert(out.forall(_.getAs[Double]("rms_dist") >= 0.0))
    out.foreach { r =>
      val s = r.getAs[Double]("silhouette")
      assert(!s.isNaN && s >= -1.0 && s <= 1.0, s"silhouette $s out of range")
    }
  }

  test("assignment silhouette term: clear blob points score near 1") {
    import spark.implicits._
    val rows = Seq((0L, Array.fill(8)(10f)), (1L, Array.fill(8)(-10f)))
    val df = rows.toDF("vec_id", "embedding")
    val centroids = Array(Array.fill(8)(10.0), Array.fill(8)(-10.0))
    val out = Clustering.assign(df, centroids).collect()
    out.foreach { r =>
      val a = math.sqrt(r.getAs[Double]("sq_dist"))
      val b = math.sqrt(r.getAs[Double]("sq_dist2"))
      assert(a === 0.0) // sits on its centroid
      assert(b > 0.0)
      assert((b - a) / math.max(a, b) === 1.0)
    }
  }

  test("kmeans is deterministic across runs") {
    val a = Clustering.q32Kmeans(spark, sfDir).orderBy("cluster").collect()
      .map(r => (r.getAs[Int]("cluster"), r.getAs[Long]("n")))
    val b = Clustering.q32Kmeans(spark, sfDir).orderBy("cluster").collect()
      .map(r => (r.getAs[Int]("cluster"), r.getAs[Long]("n")))
    assert(a.sameElements(b))
  }
}
