package graft

import org.apache.spark.sql.SparkSession

/** One SparkSession shared across every suite — session startup is ~5s
  * and specs are plan-construction-heavy, so per-suite sessions would
  * dominate test wall-clock. */
object SharedSpark {
  lazy val spark: SparkSession = {
    val s = Sessions.builder("4").appName("graft-test").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    Sessions.quietBoundedWindowWarnings()
    s
  }
}

trait SparkFixture {
  lazy val spark: SparkSession = SharedSpark.spark
  val sfDir = "/root/testdata/sf0.001"
}
