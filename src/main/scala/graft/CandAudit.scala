package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge.{column => exprCol, expression}
import graft.functions.{FloatVecCosine, HyperplaneBuckets}
import graft.sources.Tables

/** One-off measurement main for the q30 LSH candidate economics
  * (VERDICT r6 #6): for a given (nTables, bitsPerTable) print, per
  * scale factor, n, the raw collision-stream size, distinct candidate
  * pairs, true output pairs (cosine >= threshold), and the recall of
  * the candidate set against the exact all-pairs answer — the numbers
  * the q30 scaladoc's parameter-regime note cites.
  *
  * Usage: tools/run_main.sh graft.CandAudit <sfDir> [nTables] [bits] [threshold]
  */
object CandAudit {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val nTables = if (args.length > 1) args(1).toInt else 32
    val bits = if (args.length > 2) args(2).toInt else 4
    val threshold = if (args.length > 3) args(3).toDouble else 0.3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = Sessions.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val vecs = Tables.parallelized(Tables.embeddings(spark, dir), col("vec_id"))
      .select(col("vec_id"), col("embedding"))
    val n = vecs.count()

    val banded = vecs
      .select(col("vec_id"),
        posexplode(exprCol(HyperplaneBuckets(
          expression(col("embedding")), nTables, bits))).as(Seq("tbl", "bucket")))
      .repartition(col("tbl"), col("bucket"))
    val cand = banded.as("a")
      .join(banded.as("b"),
        col("a.tbl") === col("b.tbl") && col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
    val stream = cand.count()
    val distinct = cand.dropDuplicates("vec_a", "vec_b").count()

    // exact all-pairs truth via block self-join on a coarse block key
    // (measurement-only; fine at audit scale)
    val a = vecs.select(col("vec_id").as("vec_a"), col("embedding").as("emb_a"))
    val b = vecs.select(col("vec_id").as("vec_b"), col("embedding").as("emb_b"))
    val truth = a.join(b, col("vec_a") < col("vec_b"))
      .withColumn("cosine",
        exprCol(FloatVecCosine(expression(col("emb_a")), expression(col("emb_b")))))
      .filter(col("cosine") >= threshold)
      .select("vec_a", "vec_b")
    val truthN = truth.count()
    val hit = truth.join(cand.dropDuplicates("vec_a", "vec_b"),
      Seq("vec_a", "vec_b"), "left_semi").count()

    val allPairs = n * (n - 1) / 2
    println(s"== CandAudit dir=$dir L=$nTables b=$bits t=$threshold ==")
    println(f"n=$n%d allPairs=$allPairs%d")
    println(f"collisionStream=$stream%d (${stream.toDouble / allPairs}%.4f of allPairs)")
    println(f"distinctCand=$distinct%d (${distinct.toDouble / allPairs}%.4f of allPairs)")
    println(f"outputPairs=$truthN%d (${truthN.toDouble / allPairs}%.4f of allPairs)")
    println(f"candRecall=${if (truthN == 0) 1.0 else hit.toDouble / truthN}%.6f ($hit%d/$truthN%d)")
    println(f"candPerOutput=${if (truthN == 0) 0.0 else stream.toDouble / truthN}%.1f")
    spark.stop()
  }
}
