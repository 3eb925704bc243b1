package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture
import graft.functions.AnchorCalendar
import java.time.LocalDate

class AnalyticsSpec extends AnyFunSuite with SparkFixture {

  test("autoNumFormat formats magnitudes with half-up rounding") {
    import spark.implicits._
    val df = Seq(0.0, 999.0, 1000.0, 1234.0, 750.0, 999999.0, 1250000.0,
      2500000000.0, 3750000000000.0)
      .toDF("v")
      .select(col("v"), Analytics.autoNumFormat(col("v")).as("fmt"))
    val out = df.collect().map(r => r.getAs[Double]("v") -> r.getAs[String]("fmt")).toMap
    assert(out(0.0) === "0.0")
    assert(out(999.0) === "999.0")
    assert(out(1000.0) === "1.0K")
    assert(out(1234.0) === "1.2K")
    assert(out(750.0) === "750.0")
    assert(out(999999.0) === "1000.0K") // stays in K band by threshold
    assert(out(1250000.0) === "1.3M")   // half-up: 1.25 -> 1.3
    assert(out(2500000000.0) === "2.5B")
    assert(out(3750000000000.0) === "3.8T")
  }

  test("AnchorCalendar derives complete month and comparison anchors") {
    val cal = AnchorCalendar(LocalDate.parse("2001-08-15"))
    assert(cal.latestCompleteMonthStart === LocalDate.parse("2001-07-01"))
    assert(cal.latestCompleteMonthEnd === LocalDate.parse("2001-08-01"))
    assert(cal.momMonthStart === LocalDate.parse("2001-06-01"))
    assert(cal.yoyMonthStart === LocalDate.parse("2000-07-01"))
  }

  test("AnchorCalendar on a month's first day treats previous month as complete") {
    val cal = AnchorCalendar(LocalDate.parse("2024-03-01"))
    assert(cal.latestCompleteMonthStart === LocalDate.parse("2024-02-01"))
    assert(cal.momMonthStart === LocalDate.parse("2024-01-01"))
  }

  test("AnchorCalendar ISO week anchors land on Mondays") {
    // 2024-01-10 is a Wednesday; this week's Monday is 01-08, latest
    // complete week started 01-01 (also a Monday).
    val cal = AnchorCalendar(LocalDate.parse("2024-01-10"))
    assert(cal.latestCompleteWeekStart === LocalDate.parse("2024-01-01"))
    assert(cal.wowWeekStart === LocalDate.parse("2023-12-25"))
    val onMonday = AnchorCalendar(LocalDate.parse("2024-01-08"))
    assert(onMonday.latestCompleteWeekStart === LocalDate.parse("2024-01-01"))
  }

  test("q13 date spine fills gaps with zeros and covers the full range") {
    val rows = Analytics.q13DateIntervals(spark, sfDir).collect()
    assert(rows.length === 31)
    val byDay = rows.map(r => r.getAs[java.sql.Date]("day").toString -> r.getAs[Long]("events")).toMap
    assert(byDay("2024-01-31") === 0) // events end on the 30th
    assert(byDay("2024-01-15") > 0)
  }

  test("dateIntervals generates inclusive week/month interval bounds") {
    val weeks = Analytics.dateIntervals(spark, "2024-01-01", "2024-01-31", "week")
      .collect().map(r => (r.getAs[java.sql.Date]("interval_start").toString,
        r.getAs[java.sql.Date]("interval_end").toString))
    assert(weeks.head === ("2024-01-01", "2024-01-07"))
    assert(weeks.last._2 === "2024-01-31") // clamped to range end
    assert(weeks.length === 5)
    val months = Analytics.dateIntervals(spark, "2024-01-15", "2024-04-10", "month")
      .collect()
    assert(months.length === 3)
    assert(months(0).getAs[java.sql.Date]("interval_end").toString === "2024-02-14")
  }

  test("q15 bins partition all orders exactly once") {
    val df = Analytics.q15BinHistogram(spark, sfDir).cache()
    val total = df.agg(sum("orders")).collect()(0).getLong(0)
    assert(total === spark.read.parquet(s"$sfDir/orders.parquet").count())
    val bins = df.select("bin").collect().map(_.getLong(0))
    assert(bins.forall(b => b >= 0 && b <= 9))
  }

  test("q42 HLL approximate distinct stays within its error bound") {
    val rows = Analytics.q42ApproxDistinct(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // rsd=0.01 → relative error reliably under ~5%
    assert(rows.forall(_.getAs[Double]("rel_error") < 0.05))
  }

  test("q48 Misra-Gries heavy hitters honor the deterministic MG guarantees") {
    val exact = graft.sources.Tables.events(spark, sfDir)
      .groupBy(col("event_type"), col("user_id")).count().collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("user_id")) ->
        r.getAs[Long]("count")).toMap
    val rows = Analytics.q48HeavyHitters(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val k = 16
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (et, rs) =>
      assert(rs.length <= k)
      val n = rs.head.getAs[Long]("events")
      val bound = n / (k + 1) // MG: undercount <= N/(k+1), survives merges
      rs.foreach { r =>
        val est = r.getAs[Long]("est_count")
        val truth = exact((et, r.getAs[Long]("user_id")))
        assert(est <= truth, s"MG must never over-count ($et)")
        assert(truth - est <= bound, s"undercount ${truth - est} > $bound ($et)")
      }
      // completeness: every key heavier than the bound must be present
      val present = rs.map(_.getAs[Long]("user_id")).toSet
      exact.collect { case ((e, u), c) if e == et && c > bound => u }
        .foreach(u => assert(present.contains(u), s"heavy key $u missing ($et)"))
    }
  }

  test("q12 calendar window computes MoM/YoY pct from the three anchor months") {
    val r = Analytics.q12CalendarWindow(spark, sfDir).collect()(0)
    val rev = r.getAs[Double]("revenue")
    val mom = r.getAs[Double]("mom_revenue")
    assert(math.abs(r.getAs[Double]("mom_pct") - (rev / mom - 1.0)) < 1e-12)
  }

  test("q55 funnel matches a local ordered-step computation") {
    val events = graft.sources.Tables.events(spark, sfDir)
      .select("user_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2).getTime))
    val byUser = events.groupBy(_._1)
    def reach: Map[Long, (Option[Long], Option[Long], Option[Long])] =
      byUser.map { case (u, evs) =>
        val t1 = evs.collect { case (_, "view", t) => t }.minOption
        val t2 = t1.flatMap(a =>
          evs.collect { case (_, "click", t) if t > a => t }.minOption)
        val t3 = t2.flatMap(b =>
          evs.collect { case (_, "purchase", t) if t > b => t }.minOption)
        u -> ((t1, t2, t3))
      }
    val r = reach
    val exp = Map(
      "1_view" -> r.values.count(_._1.isDefined).toLong,
      "2_view_click" -> r.values.count(_._2.isDefined).toLong,
      "3_view_click_purchase" -> r.values.count(_._3.isDefined).toLong)
    val got = Analytics.q55Funnel(spark, sfDir).collect()
      .map(x => x.getAs[String]("step") ->
        (x.getAs[Long]("users"), x.getAs[Double]("conversion"))).toMap
    assert(got.keySet === exp.keySet)
    exp.foreach { case (step, users) =>
      assert(got(step)._1 === users, step)
      assert(got(step)._2 === users.toDouble / exp("1_view"), step)
    }
    // funnel monotonicity
    assert(exp("1_view") >= exp("2_view_click"))
    assert(exp("2_view_click") >= exp("3_view_click_purchase"))
  }

  test("q56 retention: day-0 is total, rates bounded, offsets in range") {
    val rows = Analytics.q56Retention(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val off = r.getAs[Int]("offset")
      assert(off >= 0 && off <= 7)
      assert(r.getAs[Long]("active_users") <= r.getAs[Long]("cohort_users"))
      val ret = r.getAs[Double]("retention")
      assert(ret > 0.0 && ret <= 1.0)
      if (off == 0) // every cohort member is active on its cohort day
        assert(r.getAs[Long]("active_users") === r.getAs[Long]("cohort_users"))
    }
  }

  test("q78 session funnel matches a local sessionize-and-step replay") {
    val events = graft.sources.Tables.events(spark, sfDir)
      .selectExpr("user_id", "event_id", "event_type", "unix_micros(ts) AS us")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val gapUs = 30L * 60 * 1000 * 1000
    val perSession = events.groupBy(_._1).values.flatMap { rows =>
      val sorted = rows.sortBy(e => (e._4, e._2))
      val sessions = scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.ArrayBuffer(sorted.head))
      sorted.sliding(2).foreach { pair =>
        if (pair.length == 2) {
          val (a, b) = (pair(0), pair(1))
          if (b._4 - a._4 > gapUs)
            sessions += scala.collection.mutable.ArrayBuffer(b)
          else sessions.last += b
        }
      }
      sessions.map { s =>
        val v = s.collect { case e if e._3 == "view" => e._4 }
          .minOption
        val c = v.flatMap(vt => s.collect {
          case e if e._3 == "click" && e._4 >= vt => e._4 }.minOption)
        val p = c.flatMap(ct => s.collect {
          case e if e._3 == "purchase" && e._4 >= ct => e._4 }.minOption)
        (v, c, p)
      }
    }.toSeq
    val r = Analytics.q78SessionFunnel(spark, sfDir).collect()(0)
    assert(r.getLong(0) === perSession.length.toLong)
    assert(r.getLong(1) === perSession.count(_._1.nonEmpty).toLong)
    assert(r.getLong(2) === perSession.count(_._2.nonEmpty).toLong)
    assert(r.getLong(3) === perSession.count(_._3.nonEmpty).toLong)
    assert(r.getLong(1) > 0, "the corpus must reach the funnel's first step")
  }
}
