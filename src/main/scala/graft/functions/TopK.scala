package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import scala.reflect.runtime.universe.TypeTag

/** Mergeable top-k as a typed `Aggregator` — the scale shape of
  * "top N per group". The ubiquitous window formulation
  * (`row_number() OVER (PARTITION BY g ORDER BY ...) <= k`) shuffles
  * EVERY row to sort whole groups; this aggregator keeps an O(k)
  * sorted buffer with map-side combine, so the exchange carries at
  * most k rows per group per partition — on a 100 TB fact table the
  * difference between shuffling everything and shuffling k*|groups|.
  *
  * Per-row cost: one comparison against the current k-th element
  * (the common reject path — allocation-free); only qualifying rows
  * pay a binary-search insert. Output = the k best in order, so
  * `posexplode` reproduces row_number exactly when `ord` carries a
  * total tiebreak.
  */
class TopKAgg[T: TypeTag](k: Int, ord: Ordering[T])
    extends Aggregator[T, Vector[T], Seq[T]] {
  require(k >= 1, "k must be positive")

  override def zero: Vector[T] = Vector.empty

  private def insert(buf: Vector[T], x: T): Vector[T] = {
    val i = buf.search(x)(ord).insertionPoint
    buf.patch(i, Seq(x), 0)
  }

  override def reduce(buf: Vector[T], x: T): Vector[T] =
    if (buf.length < k) insert(buf, x)
    else if (ord.lt(x, buf.last)) insert(buf, x).take(k)
    else buf // common case: not in the top k — no allocation

  override def merge(a: Vector[T], b: Vector[T]): Vector[T] =
    (a ++ b).sorted(ord).take(k)

  override def finish(buf: Vector[T]): Seq[T] = buf

  override def bufferEncoder: Encoder[Vector[T]] = ExpressionEncoder[Vector[T]]()
  override def outputEncoder: Encoder[Seq[T]] = ExpressionEncoder[Seq[T]]()
}

/** TopKAgg for candidate streams that may contain DUPLICATES of the
  * same logical element arriving by multiple routes — e.g. a
  * multi-table LSH where one (probe, neighbor) pair collides in
  * several tables and every collision row carries the identical
  * (score, id) payload. Keeps the k best DISTINCT elements, where
  * distinct means ord-equivalent (`ord.compare == 0`) — so `ord` must
  * totally order the payload (carry a unique tiebreak field), making
  * equivalence the same thing as "duplicate route of one element".
  *
  * Same scale shape as TopKAgg: O(k) sorted buffer, map-side combine,
  * the exchange carries ≤ k rows per group per partition. The dedup
  * happens INSIDE the partial aggregate, which is what lets a
  * quadratically-exploding candidate join stream straight into the
  * aggregation without ever materializing to a dedup shuffle or a
  * window sort (the r8 sf100 q22 lesson, applied to the aggregation
  * side). Duplicates hit the same allocation-free reject path as
  * below-k elements. */
class TopKDistinctAgg[T: TypeTag](k: Int, ord: Ordering[T])
    extends Aggregator[T, Vector[T], Seq[T]] {
  require(k >= 1, "k must be positive")

  override def zero: Vector[T] = Vector.empty

  override def reduce(buf: Vector[T], x: T): Vector[T] =
    // ord.equiv(x, buf.last) ⇒ duplicate of the k-th element: also
    // rejected by gteq, which is exactly right
    if (buf.length >= k && ord.gteq(x, buf.last)) buf
    else buf.search(x)(ord) match {
      case scala.collection.Searching.Found(_) => buf // duplicate route
      case scala.collection.Searching.InsertionPoint(i) =>
        val ins = buf.patch(i, Seq(x), 0)
        if (ins.length > k) ins.take(k) else ins
    }

  override def merge(a: Vector[T], b: Vector[T]): Vector[T] = {
    val s = (a ++ b).sorted(ord)
    var out = Vector.empty[T]
    val it = s.iterator
    while (it.hasNext && out.length < k) {
      val x = it.next()
      if (out.isEmpty || !ord.equiv(out.last, x)) out = out :+ x
    }
    out
  }

  override def finish(buf: Vector[T]): Seq[T] = buf

  override def bufferEncoder: Encoder[Vector[T]] = ExpressionEncoder[Vector[T]]()
  override def outputEncoder: Encoder[Seq[T]] = ExpressionEncoder[Seq[T]]()
}
