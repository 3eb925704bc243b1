package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder

import org.apache.spark.sql.expressions.Aggregator

/** Fused outer-product triangle: one corpus pass reduces quantized
  * vectors to the exact upper-triangle sums Σ xᵢ·xⱼ (i ≤ j, or i < j
  * with `strict`) — the sufficient statistic behind q84's dimension
  * correlations and q96's Gram matrix.
  *
  * This is the scale shape the explode/join formulations can't reach:
  * per input row the aggregate does dim²/2 multiply-adds into a
  * partition-local long[] and emits NOTHING — no dim²/2 generated
  * rows (the committed generate ran interpreted: higher-order
  * transform lambdas never enter codegen), no positional self-join
  * (the committed join shuffled the exploded positions and sort-merge
  * joined 40M rows at sf1). The exchange carries exactly one buffer
  * per partition: ~2 k cells.
  *
  * Exactness: a product of 2^24-quantized components is ≤ 2^48, so a
  * long cell overflows only past 2^15 rows; every `flushEvery` rows
  * (8192, headroom 2×) the long partials drain into arbitrary-
  * precision decimal strings, so the final sums are exact at ANY
  * corpus size — the same values decimal(38,0) SUM produces, without
  * pinning decimal arithmetic into the per-row hot path. Addition is
  * commutative/associative here, so the result is partition-order
  * free (the repo-wide integer-reduce discipline). */
class GramTriangleAgg(dim: Int, strict: Boolean,
    flushEvery: Int = 8192)
    extends Aggregator[Seq[Long], GramTriangleAgg.Buf, Seq[GramTriangleAgg.Cell]] {
  require(dim >= 2, "dim must be >= 2")
  private val cells =
    if (strict) dim * (dim - 1) / 2 else dim * (dim + 1) / 2
  // per-component bound that makes a long cell provably safe between
  // flushes: flushEvery products of maxAbs² stay under 2^62. The
  // default admits 2^24-quantized components (the corpus-wide
  // quantization scale) with 2x headroom.
  private val maxAbs: Long =
    math.sqrt(((1L << 62) / flushEvery).toDouble).toLong

  override def zero: GramTriangleAgg.Buf =
    GramTriangleAgg.Buf(new Array[Long](cells),
      Array.fill(cells)("0"), 0)

  private def flushed(b: GramTriangleAgg.Buf): GramTriangleAgg.Buf = {
    if (b.pending == 0) return b
    val big = Array.tabulate(cells) { c =>
      if (b.acc(c) == 0L) b.big(c)
      else (BigInt(b.big(c)) + BigInt(b.acc(c))).toString
    }
    GramTriangleAgg.Buf(new Array[Long](cells), big, 0)
  }

  override def reduce(b: GramTriangleAgg.Buf,
      qv: Seq[Long]): GramTriangleAgg.Buf = {
    require(qv.length == dim, s"expected $dim dims, got ${qv.length}")
    val q = qv.toArray
    var k = 0
    while (k < dim) {
      require(math.abs(q(k)) <= maxAbs,
        s"component ${q(k)} exceeds the $maxAbs overflow-safety bound " +
          s"for flushEvery=$flushEvery")
      k += 1
    }
    val acc = b.acc
    var c = 0
    var i = 0
    while (i < dim) {
      val xi = q(i)
      var j = if (strict) i + 1 else i
      while (j < dim) {
        acc(c) += xi * q(j)
        c += 1
        j += 1
      }
      i += 1
    }
    val n = b.pending + 1
    if (n >= flushEvery) flushed(GramTriangleAgg.Buf(acc, b.big, n))
    else GramTriangleAgg.Buf(acc, b.big, n)
  }

  override def merge(a: GramTriangleAgg.Buf,
      b: GramTriangleAgg.Buf): GramTriangleAgg.Buf = {
    val fa = flushed(a)
    val fb = flushed(b)
    GramTriangleAgg.Buf(new Array[Long](cells),
      Array.tabulate(cells) { c =>
        (BigInt(fa.big(c)) + BigInt(fb.big(c))).toString
      }, 0)
  }

  override def finish(b: GramTriangleAgg.Buf): Seq[GramTriangleAgg.Cell] = {
    val f = flushed(b)
    val out = Vector.newBuilder[GramTriangleAgg.Cell]
    var c = 0
    var i = 0
    while (i < dim) {
      var j = if (strict) i + 1 else i
      while (j < dim) {
        out += GramTriangleAgg.Cell(i, j, f.big(c))
        c += 1
        j += 1
      }
      i += 1
    }
    out.result()
  }

  override def bufferEncoder: Encoder[GramTriangleAgg.Buf] =
    ExpressionEncoder[GramTriangleAgg.Buf]()
  override def outputEncoder: Encoder[Seq[GramTriangleAgg.Cell]] =
    ExpressionEncoder[Seq[GramTriangleAgg.Cell]]()
}

object GramTriangleAgg {
  /** Partition-local state: long partials + exact decimal-string
    * carries (strings, not DecimalType, so a shuffle-boundary encode
    * can never truncate a carry past decimal(38,18)'s 20 integer
    * digits). */
  case class Buf(acc: Array[Long], big: Array[String], pending: Int)

  /** One triangle cell; `s` is the exact integer sum as a decimal
    * string — cast to decimal(38,0) (q84) or bigint (q96) downstream. */
  case class Cell(i: Int, j: Int, s: String)
}
