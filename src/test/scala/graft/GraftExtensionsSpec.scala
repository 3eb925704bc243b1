package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

class GraftExtensionsSpec extends AnyFunSuite with SparkFixture {

  test("registered SQL functions evaluate through the kernels") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT
           simhash64(transform(split('a b c a', ' '), x -> xxhash64(x))) AS sh,
           floatvec_cosine(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
                           array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS cos_same,
           floatvec_cosine(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
                           array(CAST(0.0 AS FLOAT), CAST(1.0 AS FLOAT))) AS cos_orth,
           size(minhash_band_hashes(array(1L, 2L, 3L), 128, 32)) AS n_bands,
           size(hyperplane_buckets(array(CAST(0.5 AS FLOAT), CAST(-0.5 AS FLOAT)), 8, 8)) AS n_tables,
           int_vec_sq_dist(array(3L, 0L), array(0L, 4L)) AS sqd
      """).collect()(0)
    assert(row.getAs[Double]("cos_same") === 1.0)
    assert(row.getAs[Double]("cos_orth") === 0.0)
    assert(row.getAs[Int]("n_bands") === 32)
    assert(row.getAs[Int]("n_tables") === 8)
    assert(row.getAs[Long]("sqd") === 25L)
    // simhash of identical token multiset is stable
    val row2 = spark.sql(
      "SELECT simhash64(transform(split('a b c a', ' '), x -> xxhash64(x))) AS sh").collect()(0)
    assert(row.getAs[Long]("sh") === row2.getAs[Long]("sh"))
  }

  test("minhash_band_hashes of identical inputs collide in every band") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT minhash_band_hashes(array(7L, 8L, 9L), 128, 32) AS a,
                minhash_band_hashes(array(9L, 7L, 8L), 128, 32) AS b""").collect()(0)
    // sets are order-insensitive
    assert(r.getAs[scala.collection.Seq[Long]]("a").toList ===
      r.getAs[scala.collection.Seq[Long]]("b").toList)
  }
}
