package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import graft.SparkFixture
import java.nio.file.Files

/** Streaming minhash near-dup over a file source with a checkpoint:
  * band claims made in an earlier run flag near-duplicate content
  * arriving in a LATER run via state recovered from the checkpoint —
  * the ingest-time face of the batch q21 LSH candidates. */
class StreamNearDedupSpec extends AnyFunSuite with SparkFixture {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("ts", TimestampType)))

  private def runOnce(in: String, out: String, cp: String): Unit = {
    val docs = spark.readStream.schema(schema).json(in)
    val q = StreamDedup.nearDedupStream(docs, horizon = "30 minutes")
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", cp)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  test("stream near-dup flags band collisions across checkpointed runs") {
    val root = Files.createTempDirectory("graft-sneardup").toString
    val in = s"$root/in"; val out = s"$root/out"; val cp = s"$root/cp"
    Files.createDirectories(java.nio.file.Paths.get(in))

    val base = (1 to 20).map(i => s"w$i").mkString(" ")
    val variant = (1 to 19).map(i => s"w$i").mkString(" ") + " zz" // J = 16/20
    val other = (1 to 20).map(i => s"x$i").mkString(" ")
    val late = (1 to 20).map(i => s"y$i").mkString(" ")

    // run 1: two unrelated docs claim their bands
    Files.writeString(java.nio.file.Paths.get(s"$in/b1.json"),
      s"""{"doc_id":1,"text":"$base","ts":"2024-01-01T10:00:00.000Z"}
         |{"doc_id":2,"text":"$other","ts":"2024-01-01T10:00:05.000Z"}
         |""".stripMargin)
    runOnce(in, out, cp)

    // run 2 (fresh run, same checkpoint): an exact copy and a one-word
    // variant of doc 1 must flag via band state recovered from cp; a
    // genuinely new doc must not. The far-future sentinel only pushes
    // the watermark so all earlier 1-minute windows close and emit.
    Files.writeString(java.nio.file.Paths.get(s"$in/b2.json"),
      s"""{"doc_id":3,"text":"$base","ts":"2024-01-01T10:10:00.000Z"}
         |{"doc_id":4,"text":"$late","ts":"2024-01-01T10:10:05.000Z"}
         |{"doc_id":5,"text":"$variant","ts":"2024-01-01T10:10:10.000Z"}
         |{"doc_id":99,"text":"flush flush flush flush","ts":"2024-01-01T11:30:00.000Z"}
         |""".stripMargin)
    runOnce(in, out, cp)

    val rows = spark.read.parquet(out).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("fresh_bands"), r.getAs[Boolean]("is_near_dup")))).toMap
    assert(rows.keySet === Set(1L, 2L, 3L, 4L, 5L),
      "sentinel window is still open; all data windows emitted")
    assert(rows(1L) === ((32L, false)), "first claimer keeps all bands")
    assert(rows(2L) === ((32L, false)))
    assert(rows(3L) === ((0L, true)), "exact copy loses every band")
    assert(rows(4L) === ((32L, false)))
    assert(rows(5L)._2 === true, "J=0.8 variant collides in some band")
    assert(rows(5L)._1 < 32L)
  }
}
