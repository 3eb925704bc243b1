package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Primitive kernels for dense float-vector math (ANN operators).
  * Same design as SketchKernels: interpreted eval and codegen both
  * call these static methods — tight primitive loops, no boxing.
  *
  * Numeric contract: accumulation is a left-to-right double fold from
  * 0.0, identical to the SQL `aggregate(zip_with(..))` formulation and
  * to the DuckDB oracle's list_reduce — results are bit-identical
  * across engines.
  */
object VectorKernels {

  /** cosine = dot(a,b) / (|a| * |b|), all left-fold double sums. */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Random-hyperplane LSH bucket per table: bit j of table t is the
    * sign of the projection onto a pseudo-hyperplane whose component i
    * has sign xxhash64(((t*bitsPerTable + j) << 32) | i) & 1 — the
    * (table, bit) pair in the high word and the dimension in the low
    * word, so seeds are collision-free for any bitsPerTable and any
    * dim < 2^32 (a flat stride like t*512+j*64+i silently reuses
    * hyperplanes once bits>8 or dim>64, correlating the LSH tables).
    * Deterministic, no stored model. One bucket code per table. */
  def hyperplaneBuckets(v: ArrayData, nTables: Int, bitsPerTable: Int): ArrayData = {
    val dim = v.numElements()
    val out = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var bucket = 0L
      var j = 0
      while (j < bitsPerTable) {
        val planeSeed = (t.toLong * bitsPerTable + j) << 32
        var s = 0.0
        var i = 0
        while (i < dim) {
          val sign = if ((XXH64.hashLong(planeSeed | i, 42L) & 1L) == 1L) 1.0 else -1.0
          s += v.getFloat(i).toDouble * sign
          i += 1
        }
        if (s >= 0.0) bucket |= (1L << j)
        j += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }
}

/** Exact cosine similarity of two float vectors (codegen kernel). */
case class FloatVecCosine(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VectorKernels.cosine($a, $b);")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecCosine =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "floatvec_cosine"
}

/** Random-hyperplane LSH bucket codes, one per table (codegen kernel). */
case class HyperplaneBuckets(child: Expression, nTables: Int, bitsPerTable: Int)
    extends UnaryExpression {
  require(bitsPerTable <= 63, "bucket code must fit a long")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    VectorKernels.hyperplaneBuckets(input.asInstanceOf[ArrayData], nTables, bitsPerTable)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VectorKernels.hyperplaneBuckets($c, $nTables, $bitsPerTable);")
  override protected def withNewChildInternal(newChild: Expression): HyperplaneBuckets =
    copy(child = newChild)
  override def prettyName: String = "hyperplane_buckets"
}
