package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

object ClusterKernels {
  /** Nearest centroid by squared euclidean distance; ties go to the
    * lower cluster id. Returns (cluster, sqDist, sqDist2) where
    * sqDist2 is the distance to the SECOND-nearest centroid — the
    * `b` term of the simplified silhouette (distance-to-own vs
    * nearest-other-centroid), which replaces sklearn's O(N^2)
    * silhouette_score with an O(N*k) quantity a cluster can compute
    * (the same substitution Spark ML's ClusteringEvaluator makes).
    * For k == 1 sqDist2 is NaN (silhouette undefined). */
  def nearest(v: ArrayData, centroids: Array[Array[Double]]): InternalRow = {
    val dim = v.numElements()
    var best = -1
    var bestD = Double.MaxValue
    var secondD = Double.MaxValue
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
      if (d < bestD) { secondD = bestD; bestD = d; best = c }
      else if (d < secondD) { secondD = d }
      c += 1
    }
    if (centroids.length < 2) secondD = Double.NaN
    new GenericInternalRow(Array[Any](best, bestD, secondD))
  }

  /** Integer twin of `nearest` for QUANTIZED vectors (array<long>):
    * every distance is exact 64-bit integer arithmetic, so the argmin
    * is bit-reproducible across engines and partition orders — the
    * property that lets a whole Lloyd's iteration be oracle-checked
    * (doubles lose exactness past 2^53; quantized coords ~2^24 keep
    * per-row distances under ~2^56). Ties go to the lower cluster id;
    * for k == 1, sqDist2 = Long.MaxValue (no second centroid). */
  def nearestInt(v: ArrayData, centroids: Array[Array[Long]]): InternalRow = {
    val dim = v.numElements()
    var best = -1
    var bestD = Long.MaxValue
    var secondD = Long.MaxValue
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      var d = 0L
      var i = 0
      while (i < dim) {
        val diff = v.getLong(i) - cent(i)
        d += diff * diff
        i += 1
      }
      if (d < bestD) { secondD = bestD; bestD = d; best = c }
      else if (d < secondD) { secondD = d }
      c += 1
    }
    new GenericInternalRow(Array[Any](best, bestD, secondD))
  }

  /** Integer twin of `nearestCells` for QUANTIZED vectors: exact
    * int64 distances make the cell ranking engine-reproducible (the
    * IVF oracle's ORDER BY d, cluster), like nearestInt for nearest. */
  def nearestCellsInt(v: ArrayData, centroids: Array[Array[Long]], p: Int): ArrayData = {
    val dim = v.numElements()
    val k = centroids.length
    val dists = new Array[Long](k)
    var c = 0
    while (c < k) {
      val cent = centroids(c)
      var d = 0L
      var i = 0
      while (i < dim) {
        val diff = v.getLong(i) - cent(i)
        d += diff * diff
        i += 1
      }
      dists(c) = d
      c += 1
    }
    val n = math.min(p, k)
    val out = new Array[Int](n)
    val taken = new Array[Boolean](k)
    var j = 0
    while (j < n) {
      var best = -1
      var bestD = Long.MaxValue
      var c2 = 0
      while (c2 < k) {
        if (!taken(c2) && dists(c2) < bestD) { bestD = dists(c2); best = c2 }
        c2 += 1
      }
      taken(best) = true
      out(j) = best
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** The `p` nearest centroid ids, ascending by squared euclidean
    * distance (ties → lower id) — the multi-probe cell list of an IVF
    * index. Selection sort over k entries: k is tens-to-thousands, so
    * O(k*p) per row beats building a heap. */
  def nearestCells(v: ArrayData, centroids: Array[Array[Double]], p: Int): ArrayData = {
    val dim = v.numElements()
    val k = centroids.length
    val dists = new Array[Double](k)
    var c = 0
    while (c < k) {
      val cent = centroids(c)
      var d = 0.0
      var i = 0
      while (i < dim) {
        val diff = v.getFloat(i).toDouble - cent(i)
        d += diff * diff
        i += 1
      }
      dists(c) = d
      c += 1
    }
    val n = math.min(p, k)
    val out = new Array[Int](n)
    val taken = new Array[Boolean](k)
    var j = 0
    while (j < n) {
      var best = -1
      var bestD = Double.MaxValue
      var c2 = 0
      while (c2 < k) {
        if (!taken(c2) && dists(c2) < bestD) { bestD = dists(c2); best = c2 }
        c2 += 1
      }
      taken(best) = true
      out(j) = best
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Product-quantization ENCODE: for each of the m subspaces, the
    * nearest code (exact int64 distance on the quantized subvector,
    * ties → lower code id). codebooks is m × k × (dim/m). One pass
    * per row — the whole corpus compresses to m small ints per
    * vector. */
  def pqCodes(v: ArrayData, codebooks: Array[Array[Array[Long]]]): ArrayData = {
    val m = codebooks.length
    val dsub = v.numElements() / m
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      val codes = codebooks(s)
      val base = s * dsub
      var best = -1
      var bestD = Long.MaxValue
      var c = 0
      while (c < codes.length) {
        val cent = codes(c)
        var d = 0L
        var i = 0
        while (i < dsub) {
          val diff = v.getLong(base + i) - cent(i)
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(s) = best
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Intersection of two SORTED long arrays by primitive two-pointer
    * merge — allocation-light versus the generic hash-set
    * array_intersect; the per-edge unit of triangle counting.
    * Duplicate-free inputs assumed (both sides are adjacency sets). */
  def sortedLongIntersect(a: ArrayData, b: ArrayData): ArrayData = {
    val na = a.numElements()
    val nb = b.numElements()
    val buf = new Array[Long](math.min(na, nb))
    var i = 0; var j = 0; var k = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { buf(k) = x; k += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(buf, k))
  }

  /** Int variant of sortedLongIntersect, for the narrow-id adjacency
    * encoding (q87): when every node id fits in 32 bits the adjacency
    * arrays — the dominant shuffle/broadcast volume of the triangle
    * join, sum-of-squared-higher-degrees entries in total — carry half
    * the bytes, and the merge compares ints. */
  def sortedIntIntersect(a: ArrayData, b: ArrayData): ArrayData = {
    val na = a.numElements()
    val nb = b.numElements()
    val buf = new Array[Int](math.min(na, nb))
    var i = 0; var j = 0; var k = 0
    while (i < na && j < nb) {
      val x = a.getInt(i); val y = b.getInt(j)
      if (x == y) { buf(k) = x; k += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(buf, k))
  }

  /** Nearest SUB-centroid index within one super-cell's codebook — the
    * per-row half of the grouped (two-level) Lloyd's iteration: every
    * vector only scores the sub-centroids of ITS super-cell, so one
    * assignment pass over the corpus costs n * (n_c/tgt) * dim instead
    * of the flat quantizer's n * k * dim. Same exact-integer distances
    * and lower-index tie-break as nearestInt, so the grouped argmin is
    * engine-reproducible. A vector can only reach a super-cell the
    * final level-1 assignment populated; an empty codebook here means
    * the caller paired the vector with a model trained on different
    * data — fail fast rather than emit a colliding cell id. */
  def nearestSubInt(v: ArrayData, superId: Int,
      subCents: Array[Array[Array[Long]]]): Int = {
    val cents = subCents(superId)
    if (cents.length == 0)
      throw new IllegalStateException(
        s"two-level quantizer: super-cell $superId has no sub-centroids " +
          "(vector assigned outside the trained model's population)")
    val dim = v.numElements()
    var best = -1
    var bestD = Long.MaxValue
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      var d = 0L
      var i = 0
      while (i < dim) {
        val diff = v.getLong(i) - cent(i)
        d += diff * diff
        i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Exact int64 squared distance between two quantized vectors —
    * the PQ rerank unit (and the ground truth ADC approximates). */
  def intSqDist(a: ArrayData, b: ArrayData): Long = {
    val dim = a.numElements()
    var d = 0L
    var i = 0
    while (i < dim) {
      val t = a.getLong(i) - b.getLong(i)
      d += t * t
      i += 1
    }
    d
  }

  /** Product-quantization ADC distance table for one probe: entry
    * s*k + c = exact int64 squared distance between the probe's s-th
    * quantized subvector and code c of subspace s. Computed ONCE per
    * probe; scoring a candidate is then m table lookups + m-1 adds —
    * the asymmetric-distance trick that makes PQ scans cheap. */
  def pqDistTable(v: ArrayData, codebooks: Array[Array[Array[Long]]]): ArrayData = {
    val m = codebooks.length
    val k = codebooks(0).length
    val dsub = v.numElements() / m
    val out = new Array[Long](m * k)
    var s = 0
    while (s < m) {
      val codes = codebooks(s)
      val base = s * dsub
      var c = 0
      while (c < k) {
        val cent = codes(c)
        var d = 0L
        var i = 0
        while (i < dsub) {
          val diff = v.getLong(base + i) - cent(i)
          d += diff * diff
          i += 1
        }
        out(s * k + c) = d
        c += 1
      }
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Assign a float vector to its nearest centroid — the per-row half of
  * a Lloyd's iteration. The centroid matrix rides along as a
  * broadcast-style reference object in both eval and generated code. */
case class NearestCentroid(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("cluster", IntegerType, nullable = false),
    StructField("sq_dist", DoubleType, nullable = false),
    StructField("sq_dist2", DoubleType, nullable = false)))
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

/** Assign a QUANTIZED (array<long>) vector to its nearest centroid
  * with exact integer distances — see ClusterKernels.nearestInt. */
case class NearestCentroidInt(child: Expression, centroids: Array[Array[Long]])
    extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("cluster", IntegerType, nullable = false),
    StructField("sq_dist", LongType, nullable = false),
    StructField("sq_dist2", LongType, nullable = false)))
  override def nullSafeEval(input: Any): Any =
    ClusterKernels.nearestInt(input.asInstanceOf[ArrayData], centroids)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centroids, "long[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ClusterKernels.nearestInt($c, $ref);")
  }
  override protected def withNewChildInternal(newChild: Expression): NearestCentroidInt =
    copy(child = newChild)
  override def prettyName: String = "nearest_centroid_int"
}

/** The p nearest centroid ids for a QUANTIZED vector (exact integer
  * distances) — the engine-reproducible IVF cell probes. */
case class NearestCellsInt(child: Expression, centroids: Array[Array[Long]], p: Int)
    extends UnaryExpression {
  require(p >= 1, "need at least one probe cell")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    ClusterKernels.nearestCellsInt(input.asInstanceOf[ArrayData], centroids, p)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centroids, "long[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ClusterKernels.nearestCellsInt($c, $ref, $p);")
  }
  override protected def withNewChildInternal(newChild: Expression): NearestCellsInt =
    copy(child = newChild)
  override def prettyName: String = "nearest_cells_int"
}

/** Product-quantization codes of a QUANTIZED (array<long>) vector —
  * one small int per subspace; see ClusterKernels.pqCodes. */
case class PqCodesInt(child: Expression, codebooks: Array[Array[Array[Long]]])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    ClusterKernels.pqCodes(input.asInstanceOf[ArrayData], codebooks)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("codebooks", codebooks, "long[][][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ClusterKernels.pqCodes($c, $ref);")
  }
  override protected def withNewChildInternal(newChild: Expression): PqCodesInt =
    copy(child = newChild)
  override def prettyName: String = "pq_codes_int"
}

/** Per-probe PQ ADC distance table (m*k exact int64 entries) — see
  * ClusterKernels.pqDistTable. */
case class PqDistTableInt(child: Expression, codebooks: Array[Array[Array[Long]]])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    ClusterKernels.pqDistTable(input.asInstanceOf[ArrayData], codebooks)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("codebooks", codebooks, "long[][][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ClusterKernels.pqDistTable($c, $ref);")
  }
  override protected def withNewChildInternal(newChild: Expression): PqDistTableInt =
    copy(child = newChild)
  override def prettyName: String = "pq_dist_table_int"
}

/** Intersection of two sorted long arrays (primitive merge). */
case class SortedLongIntersect(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(a: Any, b: Any): Any =
    ClusterKernels.sortedLongIntersect(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ClusterKernels.sortedLongIntersect($a, $b);")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLongIntersect =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "sorted_long_intersect"
}

/** Intersection of two sorted int arrays — the narrow-id twin of
  * SortedLongIntersect (half the bytes per adjacency entry; see
  * ClusterKernels.sortedIntIntersect). */
case class SortedIntIntersect(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(a: Any, b: Any): Any =
    ClusterKernels.sortedIntIntersect(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ClusterKernels.sortedIntIntersect($a, $b);")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntIntersect =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "sorted_int_intersect"
}

/** Exact int64 squared distance between two quantized vectors. */
case class IntVecSqDist(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    ClusterKernels.intSqDist(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ClusterKernels.intSqDist($a, $b);")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntVecSqDist =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "int_vec_sq_dist"
}

/** The p nearest centroid ids for a float vector — IVF cell probes. */
case class NearestCells(child: Expression, centroids: Array[Array[Double]], p: Int)
    extends UnaryExpression {
  require(p >= 1, "need at least one probe cell")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    ClusterKernels.nearestCells(input.asInstanceOf[ArrayData], centroids, p)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centroids, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ClusterKernels.nearestCells($c, $ref, $p);")
  }
  override protected def withNewChildInternal(newChild: Expression): NearestCells =
    copy(child = newChild)
  override def prettyName: String = "nearest_cells"
}

/** Nearest sub-centroid index within the row's super-cell (two-level
  * coarse quantizer assignment) — see ClusterKernels.nearestSubInt.
  * The per-super codebooks ride along as one broadcast-style reference
  * object; the row only scores its own super-cell's entries. */
case class NearestSubCentroidInt(left: Expression, right: Expression,
    subCents: Array[Array[Array[Long]]])
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(v: Any, superId: Any): Any =
    ClusterKernels.nearestSubInt(
      v.asInstanceOf[ArrayData], superId.asInstanceOf[Int], subCents)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("subCents", subCents, "long[][][]")
    nullSafeCodeGen(ctx, ev, (v, s) =>
      s"${ev.value} = graft.functions.ClusterKernels.nearestSubInt($v, $s, $ref);")
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestSubCentroidInt =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "nearest_sub_centroid_int"
}
