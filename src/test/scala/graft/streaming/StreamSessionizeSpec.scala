package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkFixture
import StreamSessionize._
import java.sql.Timestamp

class StreamSessionizeSpec extends AnyFunSuite with SparkFixture {

  // offset all event times well past epoch 0: rows at exactly the
  // initial watermark (0) are dropped by the late-data filter
  private val Base = 1000000L
  private def ts(sec: Long) = new Timestamp((Base + sec) * 1000)

  test("streaming sessionizer closes a session when a gap arrives") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = sessionize(input.toDS())
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").start()
    try {
      // session 1: two events 10 min apart
      input.addData(Event(1L, 1L, ts(0)), Event(1L, 2L, ts(600)))
      query.processAllAvailable()
      // a >30min gap starts session 2 and closes session 1
      input.addData(Event(1L, 3L, ts(600 + 1801)))
      query.processAllAvailable()
      val out = spark.sql("SELECT * FROM sessions_out").as[SessionOut].collect()
      assert(out.length === 1)
      assert(out(0).user_id === 1L)
      assert(out(0).duration_ms === 600000L)
      assert(out(0).hit_depth === 2L)
      assert(!out(0).bounce)
    } finally query.stop()
  }

  test("single-event session closed by event-time timeout is a bounce") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = sessionize(input.toDS())
      .writeStream.format("memory").queryName("sessions_timeout")
      .outputMode("append").start()
    try {
      input.addData(Event(7L, 1L, ts(0)))
      query.processAllAvailable()
      // another user's much later event advances the watermark past
      // user 7's last+gap, firing the timeout
      input.addData(Event(8L, 2L, ts(10000)))
      query.processAllAvailable()
      input.addData(Event(8L, 3L, ts(20000)))
      query.processAllAvailable()
      val out = spark.sql("SELECT * FROM sessions_timeout").as[SessionOut].collect()
      val u7 = out.filter(_.user_id == 7L)
      assert(u7.length === 1)
      assert(u7(0).hit_depth === 1L)
      assert(u7(0).bounce)
    } finally query.stop()
  }

  test("batch update function handles out-of-order events within a batch") {
    val events = Iterator(Event(1L, 2L, ts(100)), Event(1L, 1L, ts(50)))
    val state = new TestGroupState[SessionState]
    val out = updateSessions(1L, events, state).toList
    assert(out.isEmpty) // session still open
    assert(state.value.get.hits === 2)
    assert(state.value.get.start === (Base + 50) * 1000)
    assert(state.value.get.last === (Base + 100) * 1000)
  }

  test("windowed counts plan is streaming-compatible") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val df = windowedCounts(input.toDS()
      .withColumnRenamed("user_id", "uid")
      .selectExpr("uid AS user_id", "ts", "'view' AS event_type"))
    val query = df.writeStream.format("memory").queryName("win_out")
      .outputMode("append").start()
    try {
      input.addData(Event(1L, 1L, ts(0)), Event(2L, 2L, ts(60)))
      query.processAllAvailable()
      // watermark (1h) hasn't passed, append emits nothing yet — the
      // point is the plan runs incrementally without error
      input.addData(Event(3L, 3L, ts(7200)))
      query.processAllAvailable()
      assert(spark.sql("SELECT * FROM win_out").count() >= 0)
    } finally query.stop()
  }

  test("a micro-batch spanning hours of event time closes old sessions immediately") {
    // Regression: one batch whose max event time puts the watermark
    // past an in-batch session's close point used to park that session
    // via setTimeoutTimestamp(past) — which THROWS by the GroupState
    // contract (surfaced by the sf1 file feed, where AvailableNow
    // batches span days of event time). The session must be emitted in
    // the same batch instead.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val query = sessionize(input.toDS())
      .writeStream.format("memory").queryName("sessions_span")
      .outputMode("append").start()
    try {
      // batch 1 establishes a watermark near ts(0)
      input.addData(Event(1L, 1L, ts(0)))
      query.processAllAvailable()
      // batch 2 spans 6 h: user 9's session sits 5.5 h before the
      // batch max, so the new watermark (max - 10 min) is far past
      // its last+gap when state is updated at batch end
      input.addData(
        Event(9L, 2L, ts(600)), Event(9L, 3L, ts(900)),
        Event(2L, 4L, ts(6 * 3600)))
      query.processAllAvailable()
      val out = spark.sql("SELECT * FROM sessions_span").as[SessionOut].collect()
      val u9 = out.filter(_.user_id == 9L)
      assert(u9.length === 1, s"user 9 session must close in-batch, got ${out.toSeq}")
      assert(u9(0).duration_ms === 300000L)
      assert(u9(0).hit_depth === 2L)
    } finally query.stop()
  }
}

/** Minimal GroupState stub for unit-testing the update function. */
class TestGroupState[S] extends org.apache.spark.sql.streaming.GroupState[S] {
  var value: Option[S] = None
  private var removed = false
  override def exists: Boolean = value.isDefined
  override def get: S = value.get
  override def getOption: Option[S] = value
  override def update(newValue: S): Unit = { value = Some(newValue); removed = false }
  override def remove(): Unit = { value = None; removed = true }
  override def hasTimedOut: Boolean = false
  override def setTimeoutDuration(durationMs: Long): Unit = ()
  override def setTimeoutDuration(duration: String): Unit = ()
  override def setTimeoutTimestamp(timestampMs: Long): Unit = ()
  override def setTimeoutTimestamp(timestampMs: Long, additionalDuration: String): Unit = ()
  override def setTimeoutTimestamp(timestamp: java.sql.Date, additionalDuration: String): Unit = ()
  override def setTimeoutTimestamp(timestamp: java.sql.Date): Unit = ()
  override def getCurrentWatermarkMs(): Long = 0L
  override def getCurrentProcessingTimeMs(): Long = 0L
}
