package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge.{column => exprCol, expression}
import graft.functions.NearestCentroid
import graft.sources.Tables

/** KMeans clustering over the embedding column — the reference runs
  * sklearn KMeans on its taxonomy feature matrix (tasks.py:472-478),
  * single-node. Here: Lloyd's iterations as DataFrame jobs — the
  * assignment step is a codegen'd NearestCentroid expression over one
  * corpus scan; the update step reduces per-dimension sums to the
  * driver (k*dim doubles — metadata-sized, the same reduction shape
  * MLlib uses). Deterministic: first-k init, lower-id tie-breaks,
  * fixed iteration count.
  */
object Clustering {

  /** One Lloyd's assignment pass against the given centroids. */
  def assign(vecs: DataFrame, centroids: Array[Array[Double]]): DataFrame =
    vecs.withColumn("asg",
      exprCol(NearestCentroid(expression(col("embedding")), centroids)))
      .select(col("vec_id"), col("embedding"),
        col("asg.cluster").as("cluster"), col("asg.sq_dist").as("sq_dist"))

  /** Full KMeans: returns the final assignment frame. */
  def kmeans(spark: SparkSession, dir: String, k: Int, iters: Int): DataFrame = {
    val vecs = Tables.embeddings(spark, dir)
      .repartition(col("vec_id")) // parallelize off the single-split scan
      .select(col("vec_id"), col("embedding"))
    // deterministic init: the k lowest vec_ids
    var centroids: Array[Array[Double]] = vecs
      .orderBy(col("vec_id")).limit(k).collect()
      .map(_.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toArray)
    var it = 0
    while (it < iters) {
      val assigned = assign(vecs, centroids)
      // update step: per-(cluster, dim) mean via one shuffle, k*dim
      // rows back to the driver
      val sums = assigned
        .select(col("cluster"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy(col("cluster"), col("pos"))
        .agg(sum(col("x").cast("double")).as("s"), count(lit(1)).as("n"))
        .collect()
      val next = centroids.map(_.clone())
      sums.foreach { r =>
        next(r.getAs[Int]("cluster"))(r.getAs[Int]("pos")) =
          r.getAs[Double]("s") / r.getAs[Long]("n")
      }
      centroids = next
      it += 1
    }
    assign(vecs, centroids)
  }

  /** Cluster summary — sizes and mean within-cluster distance. */
  def q32Kmeans(spark: SparkSession, dir: String): DataFrame =
    kmeans(spark, dir, k = 10, iters = 5)
      .groupBy(col("cluster"))
      .agg(
        count(lit(1)).as("n"),
        sqrt(avg(col("sq_dist"))).as("rms_dist"))
}
