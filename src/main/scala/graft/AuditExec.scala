package graft
import org.apache.spark.sql.SparkSession

/** Executes named queries and prints the POST-execution adaptive plan
  * (ReusedExchange only appears there). */
object AuditExec {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = Sessions.builder("8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      println(s"\n========== $name ==========")
      println("ReusedExchange count: " + "ReusedExchange".r.findAllIn(p).length)
      println("Exchange count: " + "Exchange".r.findAllIn(p).length)
      println("Scan parquet count: " + "Scan parquet".r.findAllIn(p).length)
      println(p.linesIterator.filter(l => l.contains("Scan parquet") || l.contains("ReusedExchange")).take(20).mkString("\n"))
    }
    spark.stop()
  }
}
