package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture
import java.sql.Timestamp

class OlapSpec extends AnyFunSuite with SparkFixture {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asof join picks the latest order at or before each event") {
    import spark.implicits._
    val events = Seq(
      (1L, 10L, ts("2024-01-10 12:00:00"), "view"),
      (1L, 11L, ts("2024-01-20 12:00:00"), "click"),
      (2L, 12L, ts("2024-01-05 00:00:00"), "view"), // before any order
      (3L, 13L, ts("2024-01-15 00:00:00"), "view")) // exact-date match
      .toDF("user_id", "event_id", "ts", "event_type")
    val orders = Seq(
      (1L, 101L, ts("2024-01-08 00:00:00"), 10.0),
      (1L, 102L, ts("2024-01-15 00:00:00"), 20.0),
      (2L, 201L, ts("2024-02-01 00:00:00"), 30.0), // after the event
      (3L, 301L, ts("2024-01-15 00:00:00"), 40.0),
      (3L, 302L, ts("2024-01-15 00:00:00"), 50.0)) // same-date tie
      .toDF("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
    val out = Olap.asofJoin(events, orders).collect()
      .map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Long]("asof_orderkey")).map(_.toLong)).toMap
    assert(out(10L) === Some(101L)) // only order 101 is <= Jan 10
    assert(out(11L) === Some(102L)) // 102 supersedes 101 by Jan 20
    assert(out(12L) === None)       // no order yet -> null
    assert(out(13L) === Some(302L)) // inclusive same-instant; tie -> max orderkey
  }

  test("skew-safe asof join equals the per-key asof join on real tables") {
    val ev = graft.sources.Tables.events(spark, sfDir)
    val ord = graft.sources.Tables.orders(spark, sfDir)
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getAs[Long]("event_id") ->
        ((Option(r.getAs[java.lang.Long]("asof_orderkey")),
          Option(r.getAs[java.lang.Double]("asof_totalprice"))))).toMap
    val a = canon(Olap.asofJoin(ev, ord))
    val b = canon(Olap.asofJoinScalable(ev, ord))
    assert(a.size === b.size)
    assert(a === b)
  }

  test("range join counts clicks strictly inside the hour before each purchase") {
    import spark.implicits._
    val events = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "click"),    // 30 min before: in
      (1L, 2L, ts("2024-01-01 10:29:59"), "click"),    // 1 s before: in
      (1L, 3L, ts("2024-01-01 09:30:00"), "click"),    // exactly 1h before: in (>= bound)
      (1L, 4L, ts("2024-01-01 09:29:59"), "click"),    // 1h+1s before: out
      (1L, 5L, ts("2024-01-01 10:30:00"), "click"),    // same instant: out (< bound)
      (1L, 6L, ts("2024-01-01 10:30:00"), "purchase"),
      (2L, 7L, ts("2024-01-01 12:00:00"), "purchase")) // no clicks at all
      .toDF("user_id", "event_id", "ts", "event_type")
    val out = Olap.rangeJoinClicksBefore(events, 3600L * 1000).collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("clicks_before")).toMap
    assert(out(6L) === 3)
    assert(out(7L) === 0)
  }

  test("rollup emits detail, nation subtotal and grand total levels") {
    val rows = Olap.q36Rollup(spark, sfDir).collect()
    val gids = rows.map(_.getAs[Long]("gid")).toSet
    assert(gids === Set(0L, 1L, 3L))
    val grand = rows.filter(_.getAs[Long]("gid") == 3L)
    assert(grand.length === 1)
    val detailSum = rows.filter(_.getAs[Long]("gid") == 0L).map(_.getAs[Long]("suppliers")).sum
    assert(grand(0).getAs[Long]("suppliers") === detailSum)
  }

  test("q77: merged incremental rollup equals the full recompute; split is real") {
    import org.apache.spark.sql.functions._
    val o = graft.sources.Tables.orders(spark, sfDir)
    // the prior/delta split must both carry rows, or the merge proves nothing
    val cutoff = o.agg(date_sub(max(to_date(col("o_orderdate"))), 7))
      .collect()(0).getDate(0)
    val prior = o.filter(to_date(col("o_orderdate")) < lit(cutoff)).count()
    val delta = o.filter(to_date(col("o_orderdate")) >= lit(cutoff)).count()
    assert(prior > 0 && delta > 0, "both merge sides must be non-empty")
    val merged = Olap.q77IncrementalRollup(spark, sfDir).collect().map { r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDate(3).toString, r.getDate(4).toString, r.getLong(5)))
    }.toMap
    val full = o.groupBy(col("o_orderpriority"))
      .agg(sum(floor(col("o_totalprice") * 100).cast("bigint")).as("s"),
        count(lit(1)).as("n"),
        min(to_date(col("o_orderdate"))).as("d0"),
        max(to_date(col("o_orderdate"))).as("d1"))
      .collect().map { r =>
        val (s, n) = (r.getLong(1), r.getLong(2))
        r.getString(0) -> ((s, n, r.getDate(3).toString,
          r.getDate(4).toString, s / n))
      }.toMap
    assert(merged === full)
  }

  test("running window is monotone and ma7 bounded by window extremes") {
    val rows = Olap.q37RunningWindow(spark, sfDir).collect()
      .groupBy(_.getAs[String]("event_type"))
    rows.values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[java.sql.Date]("day").toString)
      val running = sorted.map(_.getAs[Long]("events_running"))
      assert(running.zip(running.tail).forall { case (a, b) => b >= a })
      assert(running.last === sorted.map(_.getAs[Long]("events")).sum)
    }
  }
}
