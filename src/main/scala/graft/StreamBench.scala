package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.sources.Tables
import graft.streaming.{StreamDedup, StreamSessionize}

/** Streaming throughput bench: sustained rows/s and state-store size
  * for the stateful streaming operators (StreamDedup exact + near,
  * StreamSessionize, windowed counts) against a file-source feed built
  * from the batch tables at SPARK_GRAFT_SF_DIR.
  *
  * Protocol:
  *  - The feed is the corpus ORDERED BY EVENT TIME and split into
  *    multiple files; the file source lists files in path order, so
  *    micro-batches arrive roughly time-ordered like a real ingest
  *    feed and the watermark advances without mass late-drops (late
  *    drops would silently understate per-row state work).
  *  - maxFilesPerTrigger bounds each micro-batch, so the run exercises
  *    multi-batch state handoff (checkpoint write + watermark
  *    advance), not one giant batch.
  *  - Sink is noop: operator + state cost is what's measured, not
  *    parquet encoding.
  *  - Reported per op: input rows, wall seconds, rows/s, and the LAST
  *    progress's state rows + state bytes (the state high-water mark
  *    at end of feed — the number that must stay bounded for a
  *    firehose; horizons bound it by construction).
  *
  * One JSON line to stdout+stderr and STREAMBENCH.json (or
  * $SPARK_GRAFT_STREAMBENCH_OUT), the Bench.scala convention. */
object StreamBench {

  private def fmt(v: Double): String =
    "%.3f".formatLocal(java.util.Locale.ROOT, v)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "testdata/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val outFile = sys.env.getOrElse("SPARK_GRAFT_STREAMBENCH_OUT", "STREAMBENCH.json")
    val filesPerTrigger = sys.env.getOrElse("SPARK_GRAFT_STREAM_FPT", "2").toInt
    // LOAD SENTINEL (the Bench.scala discipline, r11): streaming rates
    // are single-pass walls, so a loaded machine understates them with
    // nothing flagging it. Bracket the run with loadavg + the fixed
    // calibration loop; check_records.py holds committed records to
    // the same calibration_ref thresholds as the batch benches.
    val loadBefore = LoadSentinel.loadAvg
    val calibBefore = LoadSentinel.calib3
    val spark = Sessions.local(cpus)
    import spark.implicits._

    val root = new java.io.File("target/streambench")
    org.apache.commons.io.FileUtils.deleteQuietly(root)

    // -- feeds: time-ordered multi-file parquet ------------------------
    val evIn = s"$root/in-events"
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .orderBy(col("ts")).write.mode("overwrite").parquet(evIn)
    val evRows = spark.read.parquet(evIn).count()

    val docIn = s"$root/in-docs"
    // synthesize an arrival time from the corpus order: one doc per
    // 100 ms — a 50 k-doc corpus arrives over ~83 min, so the 1 h
    // dedup horizon actually reclaims state inside the run
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"),
        timestamp_micros(lit(1704067200000000L) + col("doc_id") * 100000L)
          .as("ts"))
      .orderBy(col("ts")).write.mode("overwrite").parquet(docIn)
    val docRows = spark.read.parquet(docIn).count()

    def stream(path: String): DataFrame = {
      val schema = spark.read.parquet(path).schema
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", filesPerTrigger).parquet(path)
    }

    case class Res(name: String, rows: Long, wallSec: Double,
      stateRows: Long, stateBytes: Long)

    def run(name: String, rows: Long)(build: DataFrame => DataFrame,
        in: String): Res = {
      val q = build(stream(in))
        .writeStream.format("noop")
        .option("checkpointLocation", s"$root/cp-$name")
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      val t0 = System.nanoTime()
      q.awaitTermination()
      val wall = (System.nanoTime() - t0) / 1e9
      val st = Option(q.lastProgress).toSeq.flatMap(_.stateOperators.toSeq)
      Res(name, rows, wall, st.map(_.numRowsTotal).sum,
        st.map(_.memoryUsedBytes).sum)
    }

    val results = Seq(
      run("dedup_exact", docRows)(
        df => StreamDedup.dedupStream(df), docIn),
      run("dedup_near", docRows)(
        df => StreamDedup.nearDedupStream(df), docIn),
      run("sessionize", evRows)(
        df => StreamSessionize.sessionize(
          df.select(col("user_id"), col("event_id"), col("ts"))
            .as[StreamSessionize.Event]).toDF(), evIn),
      run("windowed_counts", evRows)(
        df => StreamSessionize.windowedCounts(df), evIn))

    val js = results.map { r =>
      s""""${r.name}":{"rows":${r.rows},"wall_sec":${fmt(r.wallSec)},""" +
        s""""rows_per_sec":${fmt(r.rows / r.wallSec)},""" +
        s""""state_rows":${r.stateRows},"state_bytes":${r.stateBytes}}"""
    }.mkString("{", ",", "}")
    val loadAfter = LoadSentinel.loadAvg
    val calibAfter = LoadSentinel.calib3
    def fmtSeq(v: Seq[Double]): String = v.map(fmt).mkString("[", ",", "]")
    val line =
      s"""{"metric":"stream_rows_per_sec","sf":"$sfDir","files_per_trigger":$filesPerTrigger,"ops":$js,"loadavg_before":${fmtSeq(loadBefore)},"loadavg_after":${fmtSeq(loadAfter)},"calib_ms_before":${fmt(calibBefore)},"calib_ms_after":${fmt(calibAfter)}}"""
    println(line)
    System.err.println(line)
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (line + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
