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

  /** Headered 2-D string grid → DataFrame: first row is the header,
    * remaining rows are data; short rows pad with nulls (spreadsheet
    * ranges are ragged). This is the reference's read_sheet values →
    * pd.DataFrame step (tasks.py:1636-1652) without the Sheets
    * client: fetch the grid with sources/Rest, land it here, type it
    * with normalize + casts. Grids are UI-sized by contract — the
    * driver-side materialization is the point, not a limitation. */
  def fromGrid(spark: SparkSession, grid: Seq[Seq[String]]): DataFrame = {
    require(grid.nonEmpty, "grid needs a header row")
    val header = grid.head.map(h => if (h == null || h.isEmpty) "_c" else h)
    // disambiguate duplicate header cells like pandas (name, name_1,
    // ...), but keep bumping the suffix until the candidate is unique:
    // a literal "a_1" cell in the header must not collide with the
    // rename of a later duplicate "a"
    val names = header.foldLeft(Vector.empty[String]) { (acc, h) =>
      var candidate = h
      var i = 1
      while (acc.contains(candidate)) { candidate = s"${h}_$i"; i += 1 }
      acc :+ candidate
    }
    val width = names.length
    val rows = grid.tail.map { r =>
      org.apache.spark.sql.Row.fromSeq(
        r.take(width).padTo(width, null))
    }
    val schema = StructType(names.map(n =>
      org.apache.spark.sql.types.StructField(n, org.apache.spark.sql.types.StringType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toList), schema)
  }
}
