package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Primitive kernels for word n-gram production — the per-row unit of
  * the whole dedup/text family (q21/q22/q23/q29/q41/q44/q47/q63/q73/
  * q79/q83/q95, streaming near-dup). The previous formulation was
  * built-in higher-order functions (`transform(sequence(...))` over
  * `split`), which Catalyst evaluates INTERPRETED — a tree-walk plus
  * boxing per array element per row. These kernels run the same
  * computation as tight JVM loops behind thin codegen expressions
  * (the VectorKernels/SketchKernels design), with bit-identical
  * results:
  *
  *  - tokenization is UTF8String.split(" ", -1) — the exact call
  *    `split(text, ' ')` lowers to (StringSplit.nullSafeEval);
  *  - word hashes are XXH64.hashUTF8String(w, 42) — the exact
  *    single-argument `xxhash64(w)` computation;
  *  - n-gram hashes fold XXH64.hashLong over the window from seed 42 —
  *    the exact multi-argument `xxhash64(hw[i], .., hw[i+n-1])` chain;
  *  - string shingles join words with a single space (concatWs ==
  *    array_join byte-for-byte on non-null inputs);
  *  - `distinct` keeps FIRST-OCCURRENCE order, same as array_distinct.
  *
  * Bit-identity to the legacy formulations is pinned by
  * TextKernelsSpec, which evaluates both on the test corpus plus
  * adversarial inputs (consecutive/leading/trailing spaces, empty
  * text, sub-n docs, unicode).
  *
  * One deliberate difference: on NULL text the legacy CASE-over-
  * transform forms returned an EMPTY ARRAY (size(null) is null under
  * ANSI, so the CASE fell through to ELSE); these expressions are
  * null-propagating like every other scalar. The documents tables
  * have non-null text by construction (Tables.documents), so no
  * caller observes the difference; null-in → null-out is the less
  * surprising contract to keep.
  */
object TextKernels {

  private val SPACE = UTF8String.fromString(" ")

  /** Open-addressed primitive long set (first-occurrence dedup without
    * boxing). Capacity is always a power of two >= 2*n. */
  private final class LongSet(expected: Int) {
    private val cap = {
      var c = 4
      while (c < expected * 2) c <<= 1
      c
    }
    private val mask = cap - 1
    private val keys = new Array[Long](cap)
    private val used = new Array[Boolean](cap)
    /** true iff x was not present (and is now added). */
    def add(x: Long): Boolean = {
      var i = (java.lang.Long.hashCode(x) * 0x9e3779b9) & mask
      while (used(i)) {
        if (keys(i) == x) return false
        i = (i + 1) & mask
      }
      used(i) = true; keys(i) = x
      true
    }
  }

  private def splitWords(text: UTF8String): Array[UTF8String] =
    text.split(SPACE, -1)

  /** Hash every word exactly as xxhash64(word) does. */
  private def wordHashes(words: Array[UTF8String]): Array[Long] = {
    val hw = new Array[Long](words.length)
    var i = 0
    while (i < words.length) {
      hw(i) = XXH64.hashUTF8String(words(i), 42L)
      i += 1
    }
    hw
  }

  /** 64-bit hashes of word n-grams; optionally first-occurrence
    * distinct. Empty array when the doc has fewer than n words. */
  def ngramHashes(text: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    val words = splitWords(text)
    val len = words.length
    if (len < n) return new GenericArrayData(Array.emptyLongArray)
    val hw = wordHashes(words)
    val m = len - n + 1
    val out = new Array[Long](m)
    var cnt = 0
    val seen = if (distinct) new LongSet(m) else null
    var i = 0
    while (i < m) {
      var h = 42L
      var k = 0
      while (k < n) { h = XXH64.hashLong(hw(i + k), h); k += 1 }
      if (seen == null || seen.add(h)) { out(cnt) = h; cnt += 1 }
      i += 1
    }
    new GenericArrayData(
      if (cnt == m) out else java.util.Arrays.copyOf(out, cnt))
  }

  /** Distinct word n-gram STRINGS (space-joined), first-occurrence
    * order — the exact-string shingle unit (q47/q95). */
  def wordShingles(text: UTF8String, n: Int): ArrayData = {
    val words = splitWords(text)
    val len = words.length
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val m = len - n + 1
    val seen = new java.util.LinkedHashSet[UTF8String](m * 2)
    val window = new Array[UTF8String](n)
    var i = 0
    while (i < m) {
      System.arraycopy(words, i, window, 0, n)
      seen.add(UTF8String.concatWs(SPACE, window: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
  }

  /** Min polynomial rolling hash over every n-word window (the q29
    * winnowing fingerprint). Per word the engine-neutral value is
    * numChars*131 + first-codepoint (0 for the empty word) — exactly
    * `length(w)*131 + ascii(w)`, Ascii's contract being the first
    * CODEPOINT (substring(0,1).codePointAt, 0 on empty); the window
    * hash folds acc*31 + v in wrapping Long math and the fingerprint
    * is the Long-ordered minimum, matching array_min over the
    * transform(aggregate(...)) form bit-for-bit (TextKernelsSpec).
    * NULL when the doc has fewer than n words (no window exists),
    * matching the legacy `when(size(w) >= n, ...)` guard. */
  def fingerprintMin(text: UTF8String, n: Int): Any = {
    val words = splitWords(text)
    val len = words.length
    if (len < n) return null
    val v = new Array[Long](len)
    var i = 0
    while (i < len) {
      val w = words(i)
      val first = w.substring(0, 1)
      val cp = if (first.numChars > 0) first.toString.codePointAt(0) else 0
      v(i) = w.numChars.toLong * 131L + cp
      i += 1
    }
    val m = len - n + 1
    var min = 0L
    var any = false
    i = 0
    while (i < m) {
      var h = 0L
      var k = 0
      while (k < n) { h = h * 31L + v(i + k); k += 1 }
      if (!any || h < min) { min = h; any = true }
      i += 1
    }
    java.lang.Long.valueOf(min)
  }

  /** One-pass word repetition stats (the q47 unit): word count,
    * distinct-word count, and the top word's occurrence count. The
    * top count equals the legacy sorted-run-length aggregate by
    * definition (max multiset multiplicity — order of grouping is
    * irrelevant), and distinct equals size(array_distinct). */
  def wordRepStats(text: UTF8String): InternalRow = {
    val words = splitWords(text)
    val counts = new java.util.HashMap[UTF8String, Integer](words.length * 2)
    var top = 0
    var i = 0
    while (i < words.length) {
      val c: Int = counts.merge(words(i), 1,
        (a: Integer, b: Integer) => Integer.valueOf(a + b))
      if (c > top) top = c
      i += 1
    }
    InternalRow(words.length, counts.size(), top)
  }
}

/** Hashed word n-grams of a text column (see TextKernels.ngramHashes). */
case class NgramHashes(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {
  require(n >= 1, "n-gram length must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextKernels.ngramHashes(input.asInstanceOf[UTF8String], n, distinct)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernels.ngramHashes($c, $n, $distinct);")
  override protected def withNewChildInternal(newChild: Expression): NgramHashes =
    copy(child = newChild)
  override def prettyName: String = "ngram_hashes"
}

/** Distinct word n-gram strings (see TextKernels.wordShingles). */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle length must be positive")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextKernels.wordShingles(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernels.wordShingles($c, $n);")
  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
  override def prettyName: String = "word_shingles"
}

/** Min n-word-window rolling-hash fingerprint (see
  * TextKernels.fingerprintMin). Null for docs with fewer than n words. */
case class FingerprintMin(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "window length must be positive")
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    TextKernels.fingerprintMin(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val obj = ctx.freshName("fpObj")
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         Object $obj = graft.functions.TextKernels.fingerprintMin($c, $n);
         if ($obj == null) { ${ev.isNull} = true; }
         else { ${ev.value} = ((Long) $obj).longValue(); }
       """)
  }
  override protected def withNewChildInternal(newChild: Expression): FingerprintMin =
    copy(child = newChild)
  override def prettyName: String = "fingerprint_min"
}

/** Per-doc word repetition stats (see TextKernels.wordRepStats). */
case class WordRepStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_words", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("top_count", IntegerType, nullable = false)))
  override def nullSafeEval(input: Any): Any =
    TextKernels.wordRepStats(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextKernels.wordRepStats($c);")
  override protected def withNewChildInternal(newChild: Expression): WordRepStats =
    copy(child = newChild)
  override def prettyName: String = "word_rep_stats"
}
