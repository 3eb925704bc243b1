package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

/** Ground-truth oracles for the round-5 operators: CDC merge, SCD2
  * history, event transitions, rolling z-score anomaly, and the Bloom
  * semi-join reduction. Each is re-derived locally from a collect of
  * the (sf0.001) inputs — independent of both the operator's plan and
  * the DuckDB oracle. */
class CdcSpec extends AnyFunSuite with SparkFixture {

  private lazy val events = graft.sources.Tables.events(spark, sfDir)
    .select("event_id", "user_id", "event_type", "value", "ts").collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3),
      r.getTimestamp(4)))

  test("q58: merge keeps exactly the latest non-delete row per key") {
    val byKey = events.groupBy(_._2)
    val expected = byKey.flatMap { case (key, rows) =>
      val last = rows.maxBy(_._1)
      if (last._3 == "purchase") None // delete marker
      else Some(key -> (last._1, rows.length.toLong, last._4))
    }
    val got = Cdc.q58CdcMerge(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got === expected)
  }

  test("q59: SCD2 intervals tile each key's timeline exactly") {
    val rows = Cdc.q59Scd2(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) Long.MaxValue else r.getLong(3),
        r.getBoolean(4)))
    rows.groupBy(_._1).foreach { case (key, ivs) =>
      val sorted = ivs.sortBy(_._3)
      // contiguous: each interval ends where the next begins
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4 === b._3, s"gap/overlap in key $key")
          assert(a._2 !== b._2, s"consecutive duplicate attr in key $key")
        case _ =>
      }
      assert(sorted.count(_._5) === 1, s"exactly one current row for $key")
      assert(sorted.last._4 === Long.MaxValue, "current row is the open one")
      // first interval opens at the key's first event
      val first = events.filter(_._2 == key)
        .minBy(e => (e._5.getTime, e._1))
      assert(sorted.head._3 === first._5.getTime * 1000
        + (first._5.getNanos / 1000) % 1000)
    }
  }

  test("q60: transition counts match a local path replay; probabilities normalize") {
    def us(t: java.sql.Timestamp): Long =
      t.getTime * 1000 + (t.getNanos / 1000) % 1000
    val expected = events.groupBy(_._2).toSeq.flatMap { case (_, rows) =>
      rows.sortBy(e => (us(e._5), e._1)).toSeq.sliding(2).collect {
        case Seq(a, b) if us(b._5) - us(a._5) <= 1800L * 1000000 =>
          (a._3, b._3)
      }
    }.groupBy(p => p).map { case (k, v) => k -> v.size.toLong }
    val got = Analytics.q60Transitions(spark, sfDir).collect()
    assert(got.map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap === expected)
    // probabilities sum to 1 per from_type (counts are exact ints)
    got.groupBy(_.getString(0)).foreach { case (_, rs) =>
      assert(math.abs(rs.map(_.getDouble(4)).sum - 1.0) < 1e-9)
      val total = rs.head.getLong(3)
      assert(rs.map(_.getLong(2)).sum === total)
    }
  }

  test("q61: integer z-flag equals the algebraic |x-mean| > 3*stddev test") {
    val rows = Analytics.q61Anomaly(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val daily = spark.read.parquet(s"$sfDir/orders.parquet")
      .groupBy(col("o_orderpriority").as("p"),
        to_date(col("o_orderdate")).as("d"))
      .agg(sum(floor(col("o_totalprice") * 100)).as("c"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    val series = daily.groupBy(_._1).map { case (p, v) =>
      p -> v.sortBy(_._2)
    }
    val flags = rows.map(r => (r.getString(0), r.getDate(1).toString)
      -> r.getBoolean(6)).toMap
    var checked = 0
    series.foreach { case (p, days) =>
      days.indices.foreach { i =>
        val trail = days.slice(math.max(0, i - 7), i).map(_._3)
        if (trail.length >= 4) {
          val n = BigInt(trail.length)
          val x = BigInt(days(i)._3)
          val sx = trail.map(BigInt(_)).sum
          val sx2 = trail.map(v => BigInt(v) * BigInt(v)).sum
          val lhs = (n * x - sx).pow(2)
          val rhs = 9 * n * (n * sx2 - sx * sx)
          assert(flags((p, days(i)._2)) === (lhs > rhs),
            s"flag mismatch at ($p, ${days(i)._2})")
          checked += 1
        }
      }
    }
    assert(checked === rows.length)
  }

  test("q62: bloom has zero false negatives and the report identity holds") {
    val rows = BloomJoin.q62BloomPrune(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (total, bloom, flagged, fp) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(bloom === flagged + fp, "bloom passes = true hits + FPs")
      assert(bloom <= total)
    }
  }

  test("q62: prunedSemiJoin returns exactly the plain semi-join rows") {
    val ev = graft.sources.Tables.events(spark, sfDir)
    val flagged = ev
      .filter(col("event_type") === "purchase" && col("value") > 190)
      .select(col("user_id")).distinct()
    val pruned = BloomJoin.prunedSemiJoin(ev, flagged, "user_id")
      .select("event_id").collect().map(_.getLong(0)).sorted
    val plain = ev.join(flagged, Seq("user_id"), "left_semi")
      .select("event_id").collect().map(_.getLong(0)).sorted
    assert(pruned === plain)
    assert(pruned.nonEmpty)
  }

  test("q58: plan is a single aggregate — no window, no sort") {
    val p = Cdc.q58CdcMerge(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!p.matches("(?s).*\\bWindow\\b.*"),
      "CDC merge must not sort the changelog through a window")
    assert(p.contains("partial_max_by") || p.contains("max_by"),
      "merge runs on the max_by partial-aggregate path")
  }

  test("q62: bloom test is a scan-side filter (no join before the prune)") {
    val ev = graft.sources.Tables.events(spark, sfDir)
    val flagged = ev
      .filter(col("event_type") === "purchase" && col("value") > 190)
      .select(col("user_id")).distinct()
    val words = BloomJoin.bloomWords(flagged, "user_id")
    val prunePlan = ev.filter(BloomJoin.bloomTest(words, col("user_id")))
      .queryExecution.executedPlan.toString
    assert(!prunePlan.contains("Join"), "the bloom prune itself is join-free")
    assert(!prunePlan.contains("Exchange"), "the bloom prune is shuffle-free")
  }

  test("q85: snapshot diff matches a local two-version replay") {
    def mix32(v: Long): Long = {
      val mask = 4294967295L
      def mul(x: Long, m: Long): Long =
        (((x >> 16) * m % 4294967296L) * 65536 + (x & 65535) * m) & mask
      val a = mul(v & mask, 2654435761L)
      val b = a ^ (a >> 16)
      val d = mul(b, 2246822519L)
      d ^ (d >> 13)
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val expected = docs.map { case (id, src, text) =>
      val m = mix32(id)
      val inOld = m % 10 != 0
      val inNew = m % 11 != 5
      val changed = m % 7 == 0 // old text differs when present
      val status =
        if (!inOld && inNew) "added"
        else if (inOld && !inNew) "removed"
        else if (inOld && inNew && changed) "changed"
        else if (inOld && inNew) "unchanged"
        else "absent"
      (src, status)
    }.filter(_._2 != "absent")
      .groupBy(_._1).map { case (src, v) =>
        val c = v.groupBy(_._2).map { case (s, x) => s -> x.length.toLong }
        val add = c.getOrElse("added", 0L); val rem = c.getOrElse("removed", 0L)
        val chg = c.getOrElse("changed", 0L); val unc = c.getOrElse("unchanged", 0L)
        src -> ((add, rem, chg, unc, (add + rem + chg) * 10000 / (add + rem + chg + unc)))
      }
    val got = Cdc.q85SnapshotDiff(spark, sfDir).collect().map { r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)))
    }.toMap
    assert(got === expected)
    // every diff class occurs somewhere in the corpus
    assert(got.values.exists(_._1 > 0) && got.values.exists(_._2 > 0) &&
      got.values.exists(_._3 > 0) && got.values.exists(_._4 > 0))
  }
}
