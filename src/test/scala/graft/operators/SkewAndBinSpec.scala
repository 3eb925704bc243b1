package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

class SkewAndBinSpec extends AnyFunSuite with SparkFixture {

  test("salted join equals unsalted join on skewed data") {
    import spark.implicits._
    // 90% of rows share key 1 (the hot key)
    val large = ((1 to 900).map(i => (1L, i)) ++ (1 to 100).map(i => (i.toLong % 7 + 2, i)))
      .toDF("k", "v")
    val small = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (4L, "c"),
      (5L, "d"), (6L, "e"), (7L, "f"), (8L, "g")).toDF("k", "name")
    val expected = large.join(small, "k").groupBy("k", "name")
      .agg(count(lit(1)).as("n"), sum("v").as("sv"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val got = SkewJoin.saltedJoin(large, small, "k", salts = 8)
      .groupBy("k", "name")
      .agg(count(lit(1)).as("n"), sum("v").as("sv"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === expected)
  }

  test("signed and percent binning clamp and bucket correctly") {
    import spark.implicits._
    val df = Seq(-1000.0, -10.0, 0.0, 10.0, 55.0, 1000.0).toDF("v")
      .withColumn("sb", Analytics.signedBin(col("v"), width = 50.0, maxBin = 3))
    val sb = df.collect().map(r => r.getAs[Double]("v") -> r.getAs[Long]("sb")).toMap
    assert(sb(-1000.0) === -4) // clamped low
    assert(sb(-10.0) === -1)   // floor(-0.2) = -1
    assert(sb(0.0) === 0)
    assert(sb(55.0) === 1)
    assert(sb(1000.0) === 3)   // clamped high
    val pb = Seq(0.0, 0.05, 0.5, 0.99, 1.0).toDF("r")
      .withColumn("b", Analytics.percentBin(col("r"), 10))
      .collect().map(x => x.getAs[Double]("r") -> x.getAs[Long]("b")).toMap
    assert(pb(0.0) === 0 && pb(0.05) === 0 && pb(0.5) === 5)
    assert(pb(0.99) === 9 && pb(1.0) === 9) // top-inclusive
  }

  test("q33 json extraction buckets cover all events") {
    val df = SemiStructured.q33JsonExtract(spark, sfDir)
    val total = df.agg(sum("events")).collect()(0).getLong(0)
    assert(total === graft.sources.Tables.events(spark, sfDir).count())
  }

  test("q34 timezone shifts UTC days back for early-morning events") {
    // events start 2024-01-01 00:00 UTC = 2023-12-31 19:00 in New York
    val days = SemiStructured.q34Timezone(spark, sfDir)
      .select(col("ny_day").cast("string")).collect().map(_.getString(0))
    assert(days.contains("2023-12-31"))
  }
}
