package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

object ClusterKernels {
  /** Nearest centroid by squared euclidean distance; ties go to the
    * lower cluster id. Returns (cluster, sqDist). */
  def nearest(v: ArrayData, centroids: Array[Array[Double]]): InternalRow = {
    val dim = v.numElements()
    var best = -1
    var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      var d = 0.0
      var i = 0
      while (i < dim) {
        val diff = v.getFloat(i).toDouble - cent(i)
        d += diff * diff
        i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    new GenericInternalRow(Array[Any](best, bestD))
  }
}

/** Assign a float vector to its nearest centroid — the per-row half of
  * a Lloyd's iteration. The centroid matrix rides along as a
  * broadcast-style reference object in both eval and generated code. */
case class NearestCentroid(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("cluster", IntegerType, nullable = false),
    StructField("sq_dist", DoubleType, nullable = false)))
  override def nullSafeEval(input: Any): Any =
    ClusterKernels.nearest(input.asInstanceOf[ArrayData], centroids)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centroids, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ClusterKernels.nearest($c, $ref);")
  }
  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
  override def prettyName: String = "nearest_centroid"
}
