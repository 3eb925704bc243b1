package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

class ProfilingSpec extends AnyFunSuite with SparkFixture {

  test("q91 skew profile matches a local count-map replay per key") {
    def localProfile(rows: Array[Long], label: String): (String, Long, Long, Long, Long, Long) = {
      val counts = rows.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
      val nRows = rows.length.toLong
      val nKeys = counts.size.toLong
      val maxCnt = counts.values.max
      // deterministic argmax: highest count, then lowest key
      val topKey = counts.toSeq.minBy { case (k, c) => (-c, k) }._1
      (label, nRows, nKeys, topKey, maxCnt, maxCnt * nKeys * 100 / nRows)
    }
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_partkey", "l_suppkey").collect()
    val expected = Seq(
      localProfile(li.map(_.getLong(0)), "lineitem.l_partkey"),
      localProfile(li.map(_.getLong(1)), "lineitem.l_suppkey"),
      localProfile(spark.read.parquet(s"$sfDir/orders.parquet")
        .select("o_custkey").collect().map(_.getLong(0)), "orders.o_custkey"),
      localProfile(graft.sources.Tables.events(spark, sfDir)
        .select("user_id").collect().map(_.getLong(0)), "events.user_id"))
    val got = Profiling.q91SkewProfile(spark, sfDir).collect()
      .map(r => (r.getAs[String]("key_name"), r.getAs[Long]("n_rows"),
        r.getAs[Long]("n_keys"), r.getAs[Long]("top_key"),
        r.getAs[Long]("max_cnt"), r.getAs[Long]("skew_pct")))
      .sortBy(_._1)
    assert(got === expected.sortBy(_._1))
  }

  test("q93 watermark audit matches a local running-max replay; counts are monotone") {
    val ev = graft.sources.Tables.events(spark, sfDir)
      .selectExpr("user_id", "event_id", "unix_millis(ts) AS ts_ms",
        "CAST(to_date(ts) AS STRING) AS day").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val late = ev.groupBy(_._1).values.flatMap { rows =>
      var hwm = Long.MinValue
      rows.sortBy(_._2).map { case (_, _, ts, day) =>
        hwm = math.max(hwm, ts)
        (day, hwm - ts)
      }
    }.toSeq
    val expected = late.groupBy(_._1).map { case (day, ls) =>
      day -> (ls.size.toLong,
        ls.count(_._2 > 1000).toLong, ls.count(_._2 > 10000).toLong,
        ls.count(_._2 > 60000).toLong, ls.map(_._2).max)
    }
    val got = Profiling.q93WatermarkAudit(spark, sfDir).collect()
    assert(got.length === expected.size)
    got.foreach { r =>
      val e = expected(r.getAs[java.sql.Date]("day").toString)
      assert((r.getAs[Long]("n_events"), r.getAs[Long]("drop_1s"),
        r.getAs[Long]("drop_10s"), r.getAs[Long]("drop_60s"),
        r.getAs[Long]("max_late_ms")) === ((e._1, e._2, e._3, e._4, e._5)))
      // a larger watermark can only drop fewer events
      assert(r.getAs[Long]("drop_1s") >= r.getAs[Long]("drop_10s"))
      assert(r.getAs[Long]("drop_10s") >= r.getAs[Long]("drop_60s"))
    }
  }
}
