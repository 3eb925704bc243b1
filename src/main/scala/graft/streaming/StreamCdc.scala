package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CDC upsert — the ingest-time face of the batch changelog
  * compaction (operators/Cdc.q58): instead of re-merging the whole
  * log on a schedule, the snapshot is MAINTAINED as changes arrive,
  * emitting per-key deltas each micro-batch.
  *
  * Spark-first: `mapGroupsWithState` holds exactly one snapshot row
  * per key (O(keys) state — the snapshot itself, nothing historical),
  * merges each batch's changes by highest sequence number, and emits
  * the updated snapshot rows for keys touched in the batch (the
  * update-mode delta a downstream sink applies idempotently).
  * Out-of-order protection is by CONSTRUCTION: a late change with a
  * lower seq than the state's never overwrites — replays and
  * at-least-once sources are safe. Delete markers stay in state as
  * tombstones (op = "D") so later out-of-order updates below the
  * delete's seq cannot resurrect the row; consumers filter them.
  */
object StreamCdc {

  case class Change(key: Long, seq: Long, op: String, value: Double)

  /** The maintained row: latest change per key + a change counter
    * (n_changes counts every change ever seen for the key, like
    * q58's). */
  case class Snapshot(key: Long, last_seq: Long, op: String,
      value: Double, n_changes: Long)

  private def mergeGroup(key: Long, rows: Iterator[Change],
      state: GroupState[Snapshot]): Snapshot = {
    var best = state.getOption
    var n = best.map(_.n_changes).getOrElse(0L)
    rows.foreach { c =>
      n += 1
      if (best.forall(_.last_seq < c.seq))
        best = Some(Snapshot(key, c.seq, c.op, c.value, n))
    }
    val snap = best.get.copy(n_changes = n)
    state.update(snap)
    snap
  }

  /** Upsert view over a streaming change frame with columns
    * (key, seq, op, value). Run in update output mode. */
  def upsertStream(changes: DataFrame): Dataset[Snapshot] = {
    import changes.sparkSession.implicits._
    changes.selectExpr("key", "seq", "op", "value").as[Change]
      .groupByKey(_.key)
      .mapGroupsWithState[Snapshot, Snapshot](
        GroupStateTimeout.NoTimeout)(mergeGroup)
  }

  /** The output mode this operator requires (mapGroupsWithState
    * emits per-key deltas, not closed windows). */
  val RequiredOutputMode: OutputMode = OutputMode.Update()
}
