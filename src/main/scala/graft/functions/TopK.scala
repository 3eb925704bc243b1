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
