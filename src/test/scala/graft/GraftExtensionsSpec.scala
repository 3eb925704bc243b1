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

  test("text kernels evaluate through SQL and agree with built-ins") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT
           word_shingles('a b c d', 3) AS sh,
           ngram_hashes('a b c d', 3, true) AS ng,
           ngram_hashes('a b a b a b', 2, false) AS pos,
           word_rep_stats('x y x x z') AS st,
           fingerprint_min('a b', 2) AS fp,
           fingerprint_min('a b', 3) AS fp_null,
           xxhash64(xxhash64('a'), xxhash64('b'), xxhash64('c')) AS ref
      """).collect()(0)
    // one 2-word window: (1*131+97)*31 + (1*131+98) = 7297
    assert(r.getAs[Long]("fp") === (131L + 97L) * 31L + 131L + 98L)
    assert(r.isNullAt(r.fieldIndex("fp_null")))
    assert(r.getAs[scala.collection.Seq[String]]("sh").toList ===
      List("a b c", "b c d"))
    assert(r.getAs[scala.collection.Seq[Long]]("ng").head === r.getAs[Long]("ref"))
    assert(r.getAs[scala.collection.Seq[Long]]("pos").length === 5)
    val st = r.getAs[org.apache.spark.sql.Row]("st")
    assert((st.getInt(0), st.getInt(1), st.getInt(2)) === ((5, 3, 3)))
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
