package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkFixture
import java.nio.file.Files

class InfraSpec extends AnyFunSuite with SparkFixture {

  test("query cache computes once, then serves reads; refresh recomputes") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-cache").toString
    var builds = 0
    def build = { builds += 1; Seq((1, "a"), (2, "b")).toDF("id", "v") }
    val cfg = """{"dims":["id"],"metrics":["count"]}"""

    val first = QueryCache.cached(spark, dir, cfg)(build)
    assert(first.count() === 2 && builds === 1)
    val second = QueryCache.cached(spark, dir, cfg)(build)
    assert(second.count() === 2 && builds === 1) // served from cache
    val refreshed = QueryCache.refresh(spark, dir, cfg)(build)
    assert(refreshed.count() === 2 && builds === 2)
    // distinct config -> distinct key -> rebuild
    QueryCache.cached(spark, dir, cfg + "x")(build)
    assert(builds === 3)
  }

  test("query cache TTL: hit within ttl, recompute after expiry") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-ttl").toString
    var builds = 0
    def build = { builds += 1; Seq(1, 2, 3).toDF("x") }
    val cfg = """{"q":"ttl"}"""
    QueryCache.cached(spark, dir, cfg)(build)
    assert(builds === 1)
    QueryCache.cached(spark, dir, cfg, ttlMillis = 60000)(build)
    assert(builds === 1) // young entry: served
    Thread.sleep(25)
    QueryCache.cached(spark, dir, cfg, ttlMillis = 10)(build)
    assert(builds === 2) // expired: recomputed + republished
    QueryCache.cached(spark, dir, cfg, ttlMillis = 60000)(build)
    assert(builds === 2) // the republished version is fresh again
  }

  test("query cache treats a damaged current version as a miss, not an error") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-dmg").toString
    var builds = 0
    def build = { builds += 1; Seq(1).toDF("x") }
    val cfg = "dmg"
    QueryCache.cached(spark, dir, cfg)(build)
    assert(builds === 1)
    // simulate a crashed writer: the live version loses its _SUCCESS
    val entry = java.nio.file.Paths.get(dir, QueryCache.cacheKey(cfg))
    val current = new String(Files.readAllBytes(entry.resolve("CURRENT")), "UTF-8").trim
    Files.delete(entry.resolve(current).resolve("_SUCCESS"))
    val back = QueryCache.cached(spark, dir, cfg)(build)
    assert(builds === 2 && back.count() === 1)
  }

  test("cache key is deterministic and config-sensitive") {
    assert(QueryCache.cacheKey("abc") === QueryCache.cacheKey("abc"))
    assert(QueryCache.cacheKey("abc") !== QueryCache.cacheKey("abd"))
    assert(QueryCache.cacheKey("abc").length === 32)
  }

  test("partitioned parquet sink prunes partitions on a date predicate") {
    val dir = Files.createTempDirectory("graft-part").toString
    val events = Tables.events(spark, sfDir)
    Tables.writePartitionedByDay(events, "ts", s"$dir/events_by_day")
    val back = spark.read.parquet(s"$dir/events_by_day")
      .filter(col("p_day") === "2024-01-15")
    // partition pruning shows up as PartitionFilters in the scan plan
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("p_day"))
    val expected = events.filter(to_date(col("ts")) === "2024-01-15").count()
    assert(back.count() === expected)
  }

  test("csv ingest round-trips with explicit schema and normalization") {
    val dir = Files.createTempDirectory("graft-csv").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/in.csv"),
      "name,qty,region\n  Widget  A ,5, EAST \nGadget,7,west\n,3,\n")
    val schema = StructType(Seq(
      StructField("name", StringType), StructField("qty", IntegerType),
      StructField("region", StringType)))
    val df = CsvIngest.normalize(
      CsvIngest.readCsv(spark, s"$dir/in.csv", schema), lowerCols = Seq("region"))
    val rows = df.orderBy(col("qty")).collect()
    assert(rows.length === 3)
    assert(rows(1).getAs[String]("name") === "Widget A") // trimmed + collapsed
    assert(rows(1).getAs[String]("region") === "east")   // lowercased
    assert(rows(0).getAs[String]("name") === null)       // empty -> null
    assert(rows(2).getAs[Int]("qty") === 7)
    // sink round-trip
    CsvIngest.writeCsv(df, s"$dir/out")
    val back = CsvIngest.readCsv(spark, s"$dir/out", schema)
    assert(back.count() === 3)
  }
}
