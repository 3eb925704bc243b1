package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Local ground truth for the operational-monitoring operators:
  * both re-derived from a collect of the sf0.001 tables, independent
  * of the Spark plan and the DuckDB oracle. */
class MonitorSpec extends AnyFunSuite with SparkFixture {

  private def mix32(v: Long): Long = {
    val mask = 4294967295L
    def mul(x: Long, m: Long): Long =
      (((x >> 16) * m % 4294967296L) * 65536 + (x & 65535) * m) & mask
    val a = mul(v & mask, 2654435761L)
    val b = a ^ (a >> 16)
    val d = mul(b, 2246822519L)
    d ^ (d >> 13)
  }

  test("q69: pacing readout matches a local integer replay") {
    val orders = graft.sources.Tables.orders(spark, sfDir)
      .selectExpr("o_orderpriority", "CAST(o_orderdate AS DATE) AS day",
        "CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents")
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getLong(2)))
    val anchor = orders.map(_._2).max
    val curM = anchor.withDayOfMonth(1)
    val prevM = curM.minusMonths(1)
    val daysElapsed = anchor.getDayOfMonth.toLong
    val daysInMonth = anchor.lengthOfMonth.toLong
    val expected = orders.groupBy(_._1).map { case (p, rows) =>
      val prev = rows.filter(r => !r._2.isBefore(prevM) && r._2.isBefore(curM))
        .map(_._3).sum
      val mtd = rows.filter(r => !r._2.isBefore(curM)).map(_._3).sum
      val forecast = prev * 11 / 10
      val projected = mtd * daysInMonth / daysElapsed
      val att = if (forecast > 0) Some(mtd * 10000 / forecast) else None
      val pace = if (forecast > 0) Some(projected * 10000 / forecast) else None
      val status =
        if (forecast <= 0) "no_forecast"
        else if (pace.get >= 10000) "on_track"
        else "behind"
      p -> (prev, mtd, forecast, projected, att, pace, status)
    }
    val got = Monitor.q69Pacing(spark, sfDir).collect().map { r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(5),
        r.getLong(6),
        if (r.isNullAt(7)) None else Some(r.getLong(7)),
        if (r.isNullAt(8)) None else Some(r.getLong(8)),
        r.getString(9))
    }.toMap
    assert(got.keySet === expected.keySet)
    got.foreach { case (p, v) => assert(v === expected(p), s"priority $p") }
    // the synthetic span ends mid-history: both months must carry revenue
    assert(got.values.exists(_._1 > 0) && got.values.exists(_._2 > 0))
  }

  test("q70: refresh selection matches a local replay of every rule") {
    val events = graft.sources.Tables.events(spark, sfDir)
      .selectExpr("user_id", "unix_micros(ts) AS ts_us",
        "CAST(FLOOR(value * 100) AS BIGINT) AS cents")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val cust = graft.sources.Tables.customer(spark, sfDir)
      .selectExpr("c_custkey", "c_mktsegment", "c_acctbal >= 0")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
    val anchorUs = events.map(_._2).max
    val dayUs = 86400L * 1000000L
    val expected = events.filter(_._2 >= anchorUs - 30 * dayUs)
      .groupBy(_._1).flatMap { case (uid, rows) =>
        val n = rows.length.toLong
        val lastSeen = rows.map(_._2).max
        val meta = cust.find(_._1 == uid)
        val monetized = meta.exists(_._3)
        val ignored = mix32(uid) % 20 == 0
        if (n >= 5 && !ignored && !monetized)
          Some(uid -> (n, rows.map(_._3).sum, meta.map(_._2), lastSeen,
            meta.isEmpty || lastSeen <= anchorUs - 6 * dayUs))
        else None
      }
    val got = Monitor.q70RefreshSelect(spark, sfDir).collect().map { r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getString(3)),
        r.getLong(4), r.getBoolean(5))
    }.toMap
    assert(got.keySet === expected.keySet)
    got.foreach { case (u, v) => assert(v === expected(u), s"user $u") }
    assert(got.nonEmpty, "selection must be non-empty on the test corpus")
  }
}
