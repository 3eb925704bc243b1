package graft
import org.apache.spark.sql.SparkSession

/** Dump selected queries' results to parquet — dev tool for diffing a
  * single query against its DuckDB oracle without running all of
  * Verify. Usage: runMain graft.VerifyOne <sfDir> <outDir> <name>... */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = Sessions.local(cpus)
    names.foreach { name =>
      // repartition, not coalesce: see Verify — coalesce(1) would run
      // shuffle-free queries' whole scan on one thread.
      SparkEntry.queries(name)(spark, sfDir).repartition(1)
        .write.mode("overwrite").parquet(s"$outDir/$name")
      SparkEntry.oracleSql.get(name).foreach(sql =>
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/$name.sql"), sql))
      println(s"[verifyone] wrote $outDir/$name")
    }
    spark.stop()
  }
}
