package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys. AQE's skew-join split handles
  * most skew at runtime; explicit salting remains the tool when one
  * key dominates so heavily that even split partitions hot-spot (the
  * classic "null key / megacity" problem at 100 TB).
  *
  * The large side gets a per-row salt in [0, salts); the small side is
  * replicated across every salt value, so each (key, salt) partition
  * carries ~1/salts of the hot key's rows. Result is row-identical to
  * the unsalted join.
  */
object SkewJoin {

  def saltedJoin(large: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0)
    val salted = large.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts.toLong)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
