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
  *
  * Buffer = one primitive Array[Long] laid out as
  * [keys(0..k-1) | counts(k..2k-1)], slot i occupied iff counts > 0.
  * The per-row reduce is an allocation-free linear probe (k is small —
  * the summary IS the point), encoded as a primitive-array column, no
  * kryo; merge (once per partial pair, not per row) may allocate
  * scratch. Mutating the buffer in place is the typed-Aggregator
  * contract Spark's own collect_list relies on: buffers live as
  * objects inside ObjectHashAggregate and serialize only at the
  * shuffle boundary.
  */
class MisraGriesAgg(k: Int) extends Aggregator[Long, Array[Long], Map[Long, Long]] {
  require(k >= 1, "need at least one tracked key")

  override def zero: Array[Long] = new Array[Long](2 * k)

  override def reduce(buf: Array[Long], x: Long): Array[Long] = {
    var empty = -1
    var i = 0
    while (i < k) {
      if (buf(k + i) > 0) {
        if (buf(i) == x) { buf(k + i) += 1; return buf }
      } else if (empty < 0) empty = i
      i += 1
    }
    if (empty >= 0) { buf(empty) = x; buf(k + empty) = 1 }
    else {
      // full and x untracked: one global decrement absorbs the
      // arrival; counts hitting 0 free their slots automatically
      var j = 0
      while (j < k) { buf(k + j) -= 1; j += 1 }
    }
    buf
  }

  /** Merge = add counts, then shrink back to k by subtracting the
    * (k+1)-th largest count from everything (the mergeable-summaries
    * construction; equivalent to that many simultaneous decrements). */
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    // combined key space is at most 2k entries — scratch arrays
    val ks = new Array[Long](2 * k)
    val cs = new Array[Long](2 * k)
    var n = 0
    def add(key: Long, c: Long): Unit = {
      var i = 0
      while (i < n) {
        if (ks(i) == key) { cs(i) += c; return }
        i += 1
      }
      ks(n) = key; cs(n) = c; n += 1
    }
    var i = 0
    while (i < k) {
      if (a(k + i) > 0) add(a(i), a(k + i))
      if (b(k + i) > 0) add(b(i), b(k + i))
      i += 1
    }
    val cut =
      if (n <= k) 0L
      else {
        val sorted = java.util.Arrays.copyOfRange(cs, 0, n)
        java.util.Arrays.sort(sorted) // ascending; (k+1)-th largest = sorted(n-1-k)
        sorted(n - 1 - k)
      }
    java.util.Arrays.fill(a, 0L)
    var out = 0
    i = 0
    while (i < n) {
      if (cs(i) > cut) { a(out) = ks(i); a(k + out) = cs(i) - cut; out += 1 }
      i += 1
    }
    a
  }

  override def finish(buf: Array[Long]): Map[Long, Long] = {
    val b = Map.newBuilder[Long, Long]
    var i = 0
    while (i < k) {
      if (buf(k + i) > 0) b += buf(i) -> buf(k + i)
      i += 1
    }
    b.result()
  }

  // buffer: primitive long array — flat, allocation-free updates;
  // output: a real MapType column (not kryo binary), so the result
  // stays explodable / SQL-visible
  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Map[Long, Long]] =
    ExpressionEncoder[Map[Long, Long]]()
}
