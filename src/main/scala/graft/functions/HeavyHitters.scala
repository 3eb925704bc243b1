package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitters sketch as a Spark `Aggregator` — the
  * typed custom-aggregation path (beside the custom Expressions used
  * for scalar kernels). Tracks at most `k` candidate keys with
  * lower-bound counts; summaries MERGE (Agarwal et al., "Mergeable
  * Summaries"), which is exactly what a distributed aggregate needs:
  * each partition builds a summary, partials combine associatively,
  * and the guarantee survives every merge:
  *
  *  - est(x) <= true(x)                      (never over-counts)
  *  - true(x) - est(x) <= N / (k + 1)        (bounded undercount)
  *  - any x with true(x) > N/(k+1) appears   (no heavy key missed)
  *
  * This replaces exact groupBy-count top-N when the key cardinality
  * explodes: state is O(k) per group instead of O(distinct), the
  * reduction stays map-side combinable, and the error is a hard bound,
  * not a probability. Deterministic bound; which LIGHT keys ride along
  * depends on merge order (asserted properties are order-independent).
  */
class MisraGriesAgg(k: Int) extends Aggregator[Long, Map[Long, Long], Map[Long, Long]] {
  require(k >= 1, "need at least one tracked key")

  override def zero: Map[Long, Long] = Map.empty

  override def reduce(buf: Map[Long, Long], x: Long): Map[Long, Long] =
    buf.get(x) match {
      case Some(c) => buf.updated(x, c + 1)
      case None if buf.size < k => buf.updated(x, 1L)
      case None => decrement(buf, 1L) // one decrement absorbs the arrival
    }

  /** Merge = add counts, then shrink back to k by subtracting the
    * (k+1)-th largest count from everything (the mergeable-summaries
    * construction; equivalent to that many simultaneous decrements). */
  override def merge(a: Map[Long, Long], b: Map[Long, Long]): Map[Long, Long] = {
    val combined = b.foldLeft(a) { case (acc, (x, c)) =>
      acc.updated(x, acc.getOrElse(x, 0L) + c)
    }
    if (combined.size <= k) combined
    else {
      val cut = combined.values.toSeq.sorted(Ordering[Long].reverse)(k)
      combined.collect { case (x, c) if c > cut => x -> (c - cut) }
    }
  }

  private def decrement(buf: Map[Long, Long], by: Long): Map[Long, Long] =
    buf.collect { case (x, c) if c > by => x -> (c - by) }

  override def finish(buf: Map[Long, Long]): Map[Long, Long] = buf

  // real MapType encoders (not kryo binary): the output column stays
  // explodable / SQL-visible
  override def bufferEncoder: Encoder[Map[Long, Long]] =
    ExpressionEncoder[Map[Long, Long]]()
  override def outputEncoder: Encoder[Map[Long, Long]] =
    ExpressionEncoder[Map[Long, Long]]()
}
