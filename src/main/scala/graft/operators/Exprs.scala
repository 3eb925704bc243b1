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
