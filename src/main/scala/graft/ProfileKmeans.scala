package graft

import org.apache.spark.sql.functions._
import graft.operators.Clustering

/** Dev tool: within-one-JVM A/B of the kmeans centroid-update pass —
  * the r13 fused per-dimension-sum HashAggregate vs the pre-r13
  * posexplode + groupBy(cluster, pos) formulation — alternated so VM
  * stall windows (the documented drifting class) hit both arms alike.
  * Run: sbt "runMain graft.ProfileKmeans [sfDir] [reps]" */
object ProfileKmeans {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 5
    // replication factor: union the corpus onto itself to stress the
    // UPDATE pass at a size where it dominates the shared assignment
    val mult = if (args.length > 2) args(2).toInt else 1
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import org.apache.spark.sql.graftbridge.Bridge.{column => exprCol, expression => exprE}
    val base = Clustering.quantizedVecs(spark, sfDir)
    val vecs = (1 until mult).foldLeft(base)((d, _) => d.union(base)).persist()
    vecs.count()
    val cents = vecs.orderBy(col("vec_id")).limit(10).collect()
      .map(_.getAs[scala.collection.Seq[Long]]("q").toArray)
    val dim = cents.head.length
    val assigned = vecs.withColumn("asg",
        exprCol(graft.functions.NearestCentroidInt(exprE(col("q")), cents)))
      .select(col("asg.cluster").as("cluster"), col("q"))
    def timeS(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val aggCols = (0 until dim).map(d =>
      sum(element_at(col("q"), d + 1)).as(s"s$d")) :+ count(lit(1)).as("n")
    def fused(): Unit = {
      assigned.groupBy(col("cluster")).agg(aggCols.head, aggCols.tail: _*)
        .collect(); ()
    }
    def exploded(): Unit = {
      assigned.select(col("cluster"), posexplode(col("q")).as(Seq("pos", "x")))
        .groupBy(col("cluster"), col("pos"))
        .agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
        .collect(); ()
    }
    // one untimed warmup each (codegen/JIT), then alternate
    fused(); exploded()
    val f = collection.mutable.ArrayBuffer[Double]()
    val e = collection.mutable.ArrayBuffer[Double]()
    for (_ <- 1 to reps) { f += timeS(fused()); e += timeS(exploded()) }
    def stats(v: Seq[Double]) =
      f"med=${v.sorted.apply(v.length / 2)}%.3f min=${v.min}%.3f max=${v.max}%.3f"
    println(s"[profile-kmeans] n=${vecs.count()} dim=$dim reps=$reps")
    println(s"[profile-kmeans] fused    ${stats(f.toSeq)}  (${f.map(x => f"$x%.2f").mkString(",")})")
    println(s"[profile-kmeans] exploded ${stats(e.toSeq)}  (${e.map(x => f"$x%.2f").mkString(",")})")
    spark.stop()
  }
}
