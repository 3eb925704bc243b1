package graft
import org.apache.spark.sql.SparkSession

/** Time a single named query — dev tool for hotspot isolation. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.local(cpus)
    try { // absorb JVM/codegen/session warmup before timing
      SparkEntry.queries("q01_agg_filter")(spark, sfDir).count()
      SparkEntry.queries("q04_window_topn")(spark, sfDir).count()
    } catch { case _: Throwable => }
    // 3 reps like Bench: rep 1 carries codegen/JIT compile cost that
    // the full benchmark has already amortized by this query's turn
    val times = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    val n = times.head._2
    println(f"[benchone] $name rows=$n reps=${times.map(t => f"${t._1}%.2f").mkString(",")} median=${times.map(_._1).sorted.apply(1)}%.2f")
    spark.stop()
  }
}
