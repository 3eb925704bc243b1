package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

class RelationalSpec extends AnyFunSuite with SparkFixture {

  test("q01 groups by returnflag/linestatus and counts all rows") {
    val df = Relational.q01AggFilter(spark, sfDir).cache()
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 6)
    val total = rows.map(_.getAs[Long]("count_order")).sum
    val expected = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .filter(col("l_shipdate") <= lit("1998-12-01").cast("timestamp")).count()
    assert(total === expected)
  }

  test("q03 returns top-10 orders by totalprice descending") {
    val rows = Relational.q03TopNOrders(spark, sfDir).collect()
    assert(rows.length === 10)
    val prices = rows.map(_.getAs[Double]("o_totalprice"))
    assert(prices.sameElements(prices.sortBy(-_)))
  }

  test("q04 emits at most 3 rows per brand, rank ordered") {
    val rows = Relational.q04WindowTopN(spark, sfDir).collect()
    val perBrand = rows.groupBy(_.getAs[String]("p_brand"))
    assert(perBrand.values.forall(_.length <= 3))
    perBrand.values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[Int]("rn"))
      val prices = sorted.map(_.getAs[Double]("p_retailprice"))
      assert(prices.sameElements(prices.sortBy(-_)))
    }
  }

  test("q04 partial-top-k aggregate is row-identical to the window formulation") {
    val win = Relational.q04WindowTopN(spark, sfDir).collect()
      .map(r => (r.getAs[String]("p_brand"), r.getAs[Long]("p_partkey"),
        r.getAs[String]("p_name"), r.getAs[Double]("p_retailprice"),
        r.getAs[Int]("rn"))).toSet
    val agg = Relational.q04TopNAgg(spark, sfDir).collect()
      .map(r => (r.getAs[String]("p_brand"), r.getAs[Long]("p_partkey"),
        r.getAs[String]("p_name"), r.getAs[Double]("p_retailprice"),
        r.getAs[Int]("rn"))).toSet
    assert(agg === win)
    assert(agg.nonEmpty)
  }

  test("q06 session counts are consistent with event totals") {
    val df = Relational.q06Sessionize(spark, sfDir).cache()
    val totalEvents = df.agg(sum("total_events")).collect()(0).getLong(0)
    val rawEvents = graft.sources.Tables.events(spark, sfDir).count()
    assert(totalEvents === rawEvents)
    // bounces are single-hit sessions, so bounces <= sessions
    assert(df.filter(col("bounces") > col("sessions")).count() === 0)
  }

  test("sessionization splits on a >30min gap (synthetic)") {
    import spark.implicits._
    // user 1: events at t=0, 10min, 50min -> 2 sessions (gap 40min)
    val ts = Seq(0L, 600L, 3000L).map(s => new java.sql.Timestamp(s * 1000))
    val ev = ts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, 1L, "view", 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    ev.createOrReplaceTempView("___sess_ev")
    // re-express the operator inline over the synthetic frame
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val out = ev
      .withColumn("prev_ms", lag(unix_millis(col("ts")), 1).over(byUser))
      .withColumn("is_new", when(col("prev_ms").isNull ||
        unix_millis(col("ts")) - col("prev_ms") > 30L * 60 * 1000, 1).otherwise(0))
      .agg(sum("is_new")).collect()(0).getLong(0)
    assert(out === 2)
  }

  test("skew-safe sessionizer equals the per-user sessionizer on real events") {
    val ev = graft.sources.Tables.events(spark, sfDir)
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("sessions"), r.getAs[Long]("total_events"),
          r.getAs[Long]("total_duration_ms"), r.getAs[Long]("bounces")))).toMap
    assert(canon(Relational.sessionizeEventsScalable(ev)) ===
      canon(Relational.sessionizeEvents(ev)))
  }

  test("skew-safe sessionizer stitches a session crossing midnight") {
    import spark.implicits._
    // three events 10 min apart straddling a day boundary = ONE session
    val ev = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-03-01 23:50:00"), 7L),
      (2L, java.sql.Timestamp.valueOf("2024-03-02 00:00:00"), 7L),
      (3L, java.sql.Timestamp.valueOf("2024-03-02 00:10:00"), 7L),
      // plus a separate afternoon bounce
      (4L, java.sql.Timestamp.valueOf("2024-03-02 15:00:00"), 7L))
      .toDF("event_id", "ts", "user_id")
    val out = Relational.sessionizeEventsScalable(ev).collect()
    assert(out.length === 1)
    val r = out(0)
    assert(r.getAs[Long]("sessions") === 2L)
    assert(r.getAs[Long]("total_events") === 4L)
    assert(r.getAs[Long]("total_duration_ms") === 20L * 60 * 1000)
    assert(r.getAs[Long]("bounces") === 1L)
  }

  test("q07 trending computes delta columns") {
    val rows = Relational.q07Trending(spark, sfDir).collect()
    rows.foreach { r =>
      val users = r.getAs[Long]("users")
      val bench = r.getAs[Double]("users_benchmark")
      assert(r.getAs[Double]("users_vs_benchmark") === users - bench)
    }
  }
}
