package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** K-Minimum-Values distinct-count sketch as a typed Aggregator: keep
  * the k smallest DISTINCT hash values seen; estimate
  * |distinct| ≈ (k-1) / U(k) where U(k) is the k-th minimum
  * normalized to (0,1] (Bar-Yossef et al.; the KMV/bottom-k sketch).
  * Mergeable: union the sorted sets, keep the k smallest — guarantees
  * survive any merge tree, map-side combinable like every summary
  * here.
  *
  * Why next to HLL++ (q42): HLL's register layout is engine-internal,
  * so its ESTIMATE can't be cross-checked outside Spark. KMV over an
  * engine-neutral hash (Exprs.mix32) is deterministic end to end —
  * the same inputs give the same estimate on ANY engine, which makes
  * an approximate algorithm oracle-EXACT (q51) and, at 100 TB, makes
  * dashboard metrics reproducible across engine migrations instead of
  * "approximately similar".
  *
  * The sketch (sorted distinct hashes, size <= k) is the output;
  * derive nh = size, kth = element k, estimate = (k-1)*2^32/kth (or
  * nh exactly when nh < k — the sketch IS the distinct set then).
  */
class KmvAgg(k: Int) extends Aggregator[Long, Vector[Long], Seq[Long]] {
  require(k >= 2, "need at least two minimum values")

  override def zero: Vector[Long] = Vector.empty

  override def reduce(buf: Vector[Long], x: Long): Vector[Long] = {
    val i = buf.search(x).insertionPoint
    if (i < buf.length && buf(i) == x) buf // already tracked
    else if (buf.length < k) buf.patch(i, Seq(x), 0)
    else if (x < buf.last) buf.patch(i, Seq(x), 0).take(k)
    else buf // common case at high cardinality: allocation-free reject
  }

  override def merge(a: Vector[Long], b: Vector[Long]): Vector[Long] =
    (a ++ b).distinct.sorted.take(k)

  override def finish(buf: Vector[Long]): Seq[Long] = buf

  override def bufferEncoder: Encoder[Vector[Long]] = ExpressionEncoder[Vector[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}
