package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** CSV ingest + normalization — graft's re-expression of the
  * reference's tabular-sheet-range → normalized-DataFrame → CSV-sink
  * pipeline (ForecastTracker, tasks.py:1602-1718; S3 CSV get/put,
  * connectors.py:86-146).
  *
  * Explicit schemas only: schema inference is a full extra pass over
  * the data — never acceptable at scale, and nondeterministic under
  * dirty input. Normalization is pure column expressions (codegen'd).
  */
object CsvIngest {

  /** Read CSV with an explicit schema; malformed rows are kept as
    * nulls in a `_corrupt_record` column rather than silently dropped
    * (auditability at scale beats convenience). */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .schema(schema)
      .csv(path)

  /** Normalize string-typed columns: trim, collapse internal
    * whitespace, empty-to-null, lowercase the given key columns. */
  def normalize(df: DataFrame, lowerCols: Seq[String] = Nil): DataFrame = {
    val cleaned = df.schema.fields.foldLeft(df) { (acc, f) =>
      if (f.dataType.typeName == "string") {
        val base = regexp_replace(trim(col(f.name)), "\\s+", " ")
        val v = if (lowerCols.contains(f.name)) lower(base) else base
        acc.withColumn(f.name, when(v === "", lit(null)).otherwise(v))
      } else acc
    }
    cleaned
  }

  /** Sink: single-header CSV out (coalesced only when small — the
    * `parts` knob keeps large exports parallel). */
  def writeCsv(df: DataFrame, path: String, parts: Int = 1): Unit =
    df.coalesce(parts).write.mode("overwrite").option("header", "true").csv(path)
}
