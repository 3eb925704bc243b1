package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Local ground truth for the behavior operators (entry paths, RFM)
  * and the gap-fill series — each re-derived from a collect of the
  * sf0.001 inputs. */
class BehaviorSpec extends AnyFunSuite with SparkFixture {

  test("q65: path histogram matches a local first-3 replay; shares sum to 1") {
    def us(t: java.sql.Timestamp): Long =
      t.getTime * 1000 + (t.getNanos / 1000) % 1000
    val events = graft.sources.Tables.events(spark, sfDir)
      .select("user_id", "event_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), us(r.getTimestamp(3))))
    val expected = events.groupBy(_._1).toSeq
      .map { case (_, rows) =>
        rows.sortBy(e => (e._4, e._2)).take(3).map(_._3).mkString(">")
      }
      .groupBy(identity).map { case (p, v) => p -> v.length.toLong }
    val got = Behavior.q65SessionPaths(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.map(r => r._1 -> r._3).toMap === expected)
    got.foreach(r => assert(r._2 === r._1.split(">").length.toLong, "depth"))
    val totalUsers = events.map(_._1).distinct.length
    assert(math.abs(got.map(_._4).sum - 1.0) < 1e-9, "shares sum to 1")
    assert(got.map(_._3).sum === totalUsers.toLong)
  }

  test("q66: series is dense per priority; gaps carry the last observation") {
    val rows = TimeSeries.q66GapFill(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getLong(2),
        r.getLong(3), r.getBoolean(4),
        if (r.isNullAt(5)) None else Some(r.getLong(5)),
        if (r.isNullAt(6)) None else Some(r.getLong(6))))
    val days = rows.map(_._2).distinct
    val (d0, d1) = (days.min(Ordering.by((_: java.time.LocalDate).toEpochDay)),
      days.max(Ordering.by((_: java.time.LocalDate).toEpochDay)))
    val spanDays = d1.toEpochDay - d0.toEpochDay + 1
    rows.groupBy(_._1).foreach { case (prio, series) =>
      assert(series.length.toLong === spanDays, s"dense calendar for $prio")
      val sorted = series.sortBy(_._2.toEpochDay)
      var lastRev: Option[Long] = None
      var lastDay: Option[Long] = None
      sorted.foreach { r =>
        if (r._5) { // gap: zero-filled, carries forward
          assert(r._3 === 0L && r._4 === 0L)
          assert(r._6 === lastRev, s"carried for $prio ${r._2}")
          assert(r._7 === lastDay.map(r._2.toEpochDay - _))
        } else {
          assert(r._6 === Some(r._3), "non-gap carries its own revenue")
          assert(r._7 === Some(0L))
          lastRev = Some(r._3); lastDay = Some(r._2.toEpochDay)
        }
      }
    }
  }

  test("q71: segment matrix matches a local interpolated-quintile replay") {
    val orders = graft.sources.Tables.orders(spark, sfDir)
      .selectExpr("o_custkey", "CAST(o_orderdate AS DATE) AS d", "o_totalprice")
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate.toEpochDay,
        math.floor(r.getDouble(2) * 100).toLong))
    val anchor = orders.map(_._2).max
    val perCust = orders.groupBy(_._1).map { case (c, rows) =>
      (c, anchor - rows.map(_._2).max, rows.length.toLong, rows.map(_._3).sum)
    }.toSeq
    // Spark/DuckDB interpolated percentile: idx = p*(n-1), linear blend
    def quantiles(xs: Seq[Long]): Seq[Double] = {
      val s = xs.sorted
      Seq(0.2, 0.4, 0.6, 0.8).map { p =>
        val idx = p * (s.length - 1)
        val lo = math.floor(idx).toInt
        val hi = math.ceil(idx).toInt
        s(lo) + (idx - lo) * (s(hi) - s(lo))
      }
    }
    val rq = quantiles(perCust.map(_._2))
    val fq = quantiles(perCust.map(_._3))
    val mq = quantiles(perCust.map(_._4))
    def up(v: Long, b: Seq[Double]) = 1L + b.count(v.toDouble > _)
    def down(v: Long, b: Seq[Double]) = 1L + b.count(v.toDouble < _)
    val expected = perCust
      .map(c => ((down(c._2, rq), up(c._3, fq), up(c._4, mq)), c._4))
      .groupBy(_._1)
      .map { case (k, v) => k -> (v.length.toLong, v.map(_._2).sum) }
    val got = Behavior.q71Rfm(spark, sfDir).collect()
      .map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)),
        (r.getLong(3), r.getLong(4), r.getString(5))))
    assert(got.map(r => r._1 -> (r._2._1, r._2._2)).toMap === expected)
    got.foreach { case ((r, f, m), (_, _, seg)) =>
      assert(r >= 1 && r <= 5 && f >= 1 && f <= 5 && m >= 1 && m <= 5)
      val want =
        if (r >= 4 && f >= 4 && m >= 4) "champion"
        else if (r <= 2 && f >= 4) "at_risk"
        else if (f >= 3) "loyal"
        else "casual"
      assert(seg === want)
    }
    assert(got.map(_._2._1).sum === perCust.length.toLong)
  }
}
