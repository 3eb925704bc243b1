package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Primitive kernels for sketch signatures. Shared by interpreted eval
  * and codegen (the generated code calls straight into these static
  * methods — tight while-loops over long[], no boxing, no per-element
  * lambda dispatch; ~100x over interpreted higher-order functions).
  */
object SketchKernels {
  final val Prime = 4294967291L // largest prime < 2^32
  final val Mask = 4294967295L

  /** MinHash banded signature: Carter-Wegman permutations
    * perm_k(t) = (h1(t) + k*h2(t)) mod P over the element hashes,
    * folded into nBands band hashes (band = chained xxhash64 of its
    * rows). Returns one long per band. */
  /** Raw nPerm-long minhash signature (exposed for estimation and
    * property tests). */
  def minhashSig(tri: Array[Long], nPerm: Int): Array[Long] = {
    val sig = new Array[Long](nPerm)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var i = 0
    while (i < tri.length) {
      val h1 = XXH64.hashLong(tri(i), 42L) & Mask
      val h2 = XXH64.hashLong(tri(i), 7L) & Mask
      var k = 0
      while (k < nPerm) {
        val v = (h1 + k * h2) % Prime
        if (v < sig(k)) sig(k) = v
        k += 1
      }
      i += 1
    }
    sig
  }

  def minhashBands(tri: ArrayData, nPerm: Int, nBands: Int): ArrayData = {
    val r = nPerm / nBands
    val sig = minhashSig(tri.toLongArray(), nPerm)
    val bands = new Array[Long](nBands)
    var b = 0
    while (b < nBands) {
      var h = 42L
      var j = 0
      while (j < r) { h = XXH64.hashLong(sig(b * r + j), h); j += 1 }
      bands(b) = h
      b += 1
    }
    new GenericArrayData(bands)
  }

  /** 64-bit SimHash over an array of element hashes (weight = array
    * multiplicity). Bit j is set when the signed count of j-bits is
    * non-negative. */
  def simhash64(hashes: ArrayData): Long = {
    val n = hashes.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      bitVote(counts, h)
      i += 1
    }
    collapse(counts)
  }

  private def bitVote(counts: Array[Int], h: Long): Unit = {
    var j = 0
    while (j < 64) {
      if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
      j += 1
    }
  }

  private def collapse(counts: Array[Int]): Long = {
    var sim = 0L
    var j = 0
    while (j < 64) { if (counts(j) >= 0) sim |= (1L << j); j += 1 }
    sim
  }

  /** Engine-neutral 64-bit word hash: polynomial code-point hash mod
    * 2^32 (h = h*31 + cp, masked each step), widened to 64 bits by two
    * Knuth multiplicative mixes (hi32 || lo32). Every step is integer
    * arithmetic mod 2^32 that any engine reproduces exactly — the
    * DuckDB oracle recomputes it bit-for-bit with HUGEINT
    * intermediates, which is what lets simhash output be
    * oracle-checked rather than rows-only (xxhash64 is
    * Spark-specific). */
  def wordHash64(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h = (h * 31 + cp) & Mask
      i += Character.charCount(cp)
    }
    // products wrap mod 2^64 in Java; & Mask leaves the product mod
    // 2^32, identical to the oracle's HUGEINT `% 4294967296`
    val hi = (h * 2654435761L) & Mask
    val lo = (h * 2246822519L) & Mask
    (hi << 32) | lo
  }

  /** 64-bit SimHash over a word array using the engine-neutral
    * wordHash64 token hash (weight = word multiplicity). */
  def simhashWords(words: ArrayData): Long = {
    val n = words.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      bitVote(counts, wordHash64(words.getUTF8String(i)))
      i += 1
    }
    collapse(counts)
  }
}

/** Catalyst expression: array<long> of element hashes → array<long> of
  * LSH band hashes (length nBands) from an nPerm MinHash signature.
  * Codegen calls the primitive kernel directly — this is the custom-
  * Expression escape hatch for the one hot loop the built-in
  * higher-order functions evaluate interpreted (SURVEY.md §5). */
case class MinhashBandHashes(child: Expression, nPerm: Int, nBands: Int)
    extends UnaryExpression {
  require(nPerm % nBands == 0, "nPerm must divide into nBands")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    SketchKernels.minhashBands(input.asInstanceOf[ArrayData], nPerm, nBands)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SketchKernels.minhashBands($c, $nPerm, $nBands);")
  override protected def withNewChildInternal(newChild: Expression): MinhashBandHashes =
    copy(child = newChild)
  override def prettyName: String = "minhash_band_hashes"
}

/** Catalyst expression: array<long> of element hashes → 64-bit simhash. */
case class Simhash64(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    SketchKernels.simhash64(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SketchKernels.simhash64($c);")
  override protected def withNewChildInternal(newChild: Expression): Simhash64 =
    copy(child = newChild)
  override def prettyName: String = "simhash64"
}

/** Catalyst expression: array<string> of words → 64-bit simhash via
  * the engine-neutral wordHash64 token hash (poly-31 code points mod
  * 2^32, Knuth-mixed to 64 bits). One codegen'd kernel call per row —
  * the whole signature pass stays inside whole-stage codegen. */
case class SimhashWords(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    SketchKernels.simhashWords(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SketchKernels.simhashWords($c);")
  override protected def withNewChildInternal(newChild: Expression): SimhashWords =
    copy(child = newChild)
  override def prettyName: String = "simhash_words"
}
