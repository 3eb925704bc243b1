package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

class PipelineSpec extends AnyFunSuite with SparkFixture {

  test("hash split is deterministic, total, and roughly 80/10/10") {
    val df = Pipeline.q40HashSplit(spark, sfDir).cache()
    val total = df.agg(sum("docs")).collect()(0).getLong(0)
    assert(total === spark.read.parquet(s"$sfDir/documents.parquet").count())
    val bySplit = df.groupBy("split").agg(sum("docs").as("n")).collect()
      .map(r => r.getAs[String]("split") -> r.getAs[Long]("n")).toMap
    assert(bySplit.keySet === Set("train", "validation", "test"))
    assert(bySplit("train").toDouble / total > 0.7)
    assert(bySplit("test").toDouble / total < 0.2)
  }

  test("dedup pipeline: representatives are cluster minima; kept = distinct reps") {
    val labels = Pipeline.dedupCorpus(spark, sfDir).cache()
    // every rep is itself kept, and rep <= doc_id
    assert(labels.filter(col("rep") > col("doc_id")).count() === 0)
    val reps = labels.filter(col("kept")).select("doc_id").collect().map(_.getLong(0)).toSet
    val usedReps = labels.select("rep").distinct().collect().map(_.getLong(0)).toSet
    assert(usedReps.subsetOf(reps))
    // near-dup pairs always share a representative
    val pairs = Dedup.q21DedupMinhash(spark, sfDir).collect()
    val repOf = labels.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("rep")).toMap
    pairs.foreach { p =>
      assert(repOf(p.getAs[Long]("doc_a")) === repOf(p.getAs[Long]("doc_b")))
    }
  }
}
