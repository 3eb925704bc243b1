package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared expression helpers used across operators.
  *
  * Numeric policy (see SURVEY.md §4): sums over double columns
  * accumulate as exact decimals and only cast to double at the end, so
  * results are identical regardless of partitioning / accumulation
  * order — a property that must survive a 1000-executor shuffle.
  */
object Exprs {
  /** Exact sum of a (castable-to-)double column: decimal-accumulate,
    * emit double. */
  def dsum(c: Column): Column = sum(c.cast("decimal(18,2)")).cast("double")

  /** Exact sum at one decimal place (confidence-style values). */
  def dsum1(c: Column): Column = sum(c.cast("decimal(18,1)")).cast("double")

  /** Revenue expression: extendedprice * (1 - discount), decimal-exact. */
  def revenue(price: Column, discount: Column): Column =
    sum(price.cast("decimal(18,2)") *
      (lit(1).cast("decimal(18,2)") - discount.cast("decimal(18,2)"))).cast("double")

  /** (c mod 2^32) * m mod 2^32 via 16-bit limbs — no intermediate
    * exceeds ~2^48, so it is ANSI-safe for any long input where the
    * naive product overflows (Pipeline.knuth32 delegates here). */
  def mulMod32(c: Column, m: Long): Column = {
    val c32 = c.bitwiseAND(lit(4294967295L))
    val lo = c32.bitwiseAND(lit(65535L))
    val hi = shiftright(c32, 16)
    ((hi * lit(m)).bitwiseAND(lit(4294967295L)) * lit(65536L) + lo * lit(m))
      .bitwiseAND(lit(4294967295L))
  }

  /** Engine-neutral 32-bit integer mix (multiply-xorshift rounds, the
    * murmur finalizer shape): uniform enough for sketching, and every
    * step is masked integer arithmetic any engine replays exactly —
    * the hash under the KMV sketch's cross-engine determinism. */
  def mix32(c: Column): Column = {
    val a = mulMod32(c, 2654435761L)
    val b = a.bitwiseXOR(shiftright(a, 16))
    val d = mulMod32(b, 2246822519L)
    d.bitwiseXOR(shiftright(d, 13))
  }

  /** Morton (Z-order) value of two non-negative integer columns: the
    * low `bits` bits of x and y interleaved (x even positions, y odd)
    * — the space-filling-curve key behind multi-dimensional data
    * clustering. Sorting/range-partitioning a table by this value
    * keeps BOTH dimensions locally dense per file, so min/max file
    * stats prune scans on either column — the layout step that turns
    * "filter on a second column" from a full scan into a few files at
    * 100 TB (a single-column sort only prunes its own column). Built
    * as a static 2*bits-term expression tree: fully codegen'd, no
    * higher-order functions, and exact integer math any engine
    * reproduces. */
  def zValue2(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "bits out of range")
    (0 until bits).map { j =>
      shiftleft(shiftright(x, j).bitwiseAND(lit(1L)), 2 * j) +
        shiftleft(shiftright(y, j).bitwiseAND(lit(1L)), 2 * j + 1)
    }.reduce(_ + _)
  }

  /** Quoted SQL IN-list from a DataFrame column — the reference's
    * col_to_string (biutils.py:222-229), used to push a small id set
    * into a remote engine's WHERE clause (pairs with sources/Jdbc
    * readQuery). Null/'undefined'/'nan' rows are skipped like the
    * reference; embedded quotes are doubled (SQL escaping). The
    * collect is caller-asserted metadata-sized — for large sets use a
    * join, not an IN-list. */
  def colToInList(df: org.apache.spark.sql.DataFrame, column: String,
      separator: String = ","): String =
    df.select(col(column).cast("string")).collect()
      .iterator
      .map(_.getString(0))
      .filter(v => v != null && v != "undefined" && v != "nan")
      .map(v => "'" + v.replace("'", "''") + "'")
      .mkString(separator)
}
