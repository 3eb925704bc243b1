package graft
import org.apache.spark.sql.SparkSession

/** Plan audit: prints the formatted physical plan for the named
  * queries so scan pushdown / join strategy / codegen coverage can be
  * inspected. Run: sbt "runMain graft.ExplainAudit q01_agg_filter ..." */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = Sessions.builder("4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      println(s"\n========== $name ==========")
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
