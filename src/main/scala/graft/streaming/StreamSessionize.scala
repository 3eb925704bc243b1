package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Structured Streaming re-expression of the reference's scheduled
  * incremental refresh (Celery beat tasks re-running TransformTrendingWikis'
  * sessionization, tasks.py:1984-2038). Instead of a cron re-scan,
  * events stream in and sessions close incrementally via keyed state
  * with an event-time timeout — the same session semantics as the
  * batch operator (Relational.q06Sessionize): a session ends after 30
  * minutes of inactivity; duration = max-min event time; hit_depth =
  * events; bounce = single-hit session.
  *
  * State is per-user and O(1) (no event buffering — only the running
  * aggregate), so 1000 executors hold the keyed state map partitioned
  * by user with no skew beyond the key distribution itself.
  */
object StreamSessionize {

  case class Event(user_id: Long, event_id: Long, ts: Timestamp)
  case class SessionState(start: Long, last: Long, hits: Long)
  case class SessionOut(user_id: Long, session_start: Timestamp,
      duration_ms: Long, hit_depth: Long, bounce: Boolean)

  val GapMs: Long = 30L * 60 * 1000

  /** Session update function: fold new events into open state; emit
    * closed sessions on gap or state timeout. */
  def updateSessions(
      userId: Long,
      events: Iterator[Event],
      state: GroupState[SessionState]): Iterator[SessionOut] = {
    var out = List.empty[SessionOut]
    var cur = state.getOption
    // events within a micro-batch are not ordered; sort this batch.
    val sorted = events.toSeq.sortBy(e => (e.ts.getTime, e.event_id))

    if (state.hasTimedOut) {
      cur.foreach { s =>
        out ::= SessionOut(userId, new Timestamp(s.start), s.last - s.start,
          s.hits, s.hits == 1)
      }
      state.remove()
      cur = None
    }

    sorted.foreach { e =>
      val t = e.ts.getTime
      cur match {
        case Some(s) if t - s.last <= GapMs =>
          cur = Some(SessionState(s.start, math.max(s.last, t), s.hits + 1))
        case Some(s) => // gap: close previous, open new
          out ::= SessionOut(userId, new Timestamp(s.start), s.last - s.start,
            s.hits, s.hits == 1)
          cur = Some(SessionState(t, t, 1))
        case None =>
          cur = Some(SessionState(t, t, 1))
      }
    }

    cur.foreach { s =>
      if (s.last + GapMs <= state.getCurrentWatermarkMs()) {
        // A single micro-batch can span hours of EVENT time (backfill,
        // catch-up, a bursty file feed), so the batch-end watermark may
        // already be past this session's close point — and setting a
        // timeout earlier than the watermark throws by contract. The
        // session is closed by definition; emit it now instead of
        // parking it one more batch.
        out ::= SessionOut(userId, new Timestamp(s.start), s.last - s.start,
          s.hits, s.hits == 1)
        state.remove()
      } else {
        state.update(s)
        // close the session once the event-time watermark passes last+gap
        state.setTimeoutTimestamp(s.last + GapMs)
      }
    }
    out.reverseIterator
  }

  /** Streaming sessionizer. Output = closed sessions (append mode). */
  def sessionize(events: Dataset[Event]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        updateSessions)
  }

  /** Watermarked sliding-window event counts — the streaming
    * re-expression of the reference's periodic rollup refresh. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("events"), approx_count_distinct(col("user_id")).as("approx_users"))
}
