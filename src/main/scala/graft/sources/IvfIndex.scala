package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge.{column => exprCol, expression}
import graft.functions.{FloatVecCosine, NearestCellsInt}
import graft.operators.Clustering

/** Persisted IVF index — the production shape of ANN at 100 TB: train
  * the coarse quantizer ONCE, write the corpus partitioned by cell,
  * then serve probe queries against the artifact without touching the
  * training path again (q45 trains in-query because the test corpus
  * has no lifecycle; this is the same index with a lifecycle).
  *
  * Layout: `<path>/centroids` = k×dim integer centroid rows
  * (broadcast-sized, engine-reproducible — the deterministic q32/q45
  * quantizer), `<path>/corpus` = (vec_id, embedding) parquet
  * PARTITIONED BY cell, so a probe that fans out to `probeCells`
  * cells reads exactly those directories: partition pruning does the
  * candidate pruning at the FILESYSTEM level, which is the entire
  * point of IVF on object storage.
  */
object IvfIndex {

  /** Train the quantizer and write both artifacts. */
  def build(spark: SparkSession, dir: String, path: String,
      k: Int, iters: Int): Unit = {
    import spark.implicits._
    val cents = Clustering.centroidsQuantized(spark, dir, k, iters)
    cents.zipWithIndex
      .map { case (cq, cell) => (cell, cq.toSeq) }.toSeq
      .toDF("cell", "cq")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/centroids")
    Tables.embeddings(spark, dir)
      .repartition(col("vec_id"))
      .select(col("vec_id"), col("embedding"))
      .withColumn("cell",
        exprCol(NearestCellsInt(
          expression(Clustering.quantizedCol), cents, 1))(0))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$path/corpus")
  }

  /** The stored quantizer, cell-ordered. */
  def readCentroids(spark: SparkSession, path: String): Array[Array[Long]] =
    spark.read.parquet(s"$path/centroids").orderBy(col("cell")).collect()
      .map(_.getAs[scala.collection.Seq[Long]]("cq").toArray)

  /** Serve top-k for a probe frame (vec_id, embedding) against the
    * stored index. The probe side assigns its own cells from the tiny
    * stored quantizer; the corpus scan is joined on the PARTITION
    * column, so only probed cells' files are read (dynamic partition
    * pruning; probeCells literal cells prune statically — see
    * probeCells() below). */
  def probe(spark: SparkSession, path: String, probes: DataFrame,
      nProbeCells: Int, topK: Int): DataFrame = {
    val cents = readCentroids(spark, path)
    val p = probes
      .select(col("vec_id").as("probe_id"), col("embedding").as("p_emb"),
        explode(exprCol(NearestCellsInt(
          expression(Clustering.quantizedCol), cents,
          nProbeCells))).as("cell"))
    val corpus = spark.read.parquet(s"$path/corpus")
      .select(col("vec_id").as("neighbor_id"), col("embedding"), col("cell"))
    val scored = p.join(corpus, "cell")
      .filter(col("probe_id") =!= col("neighbor_id"))
      .withColumn("cosine",
        exprCol(FloatVecCosine(expression(col("p_emb")),
          expression(col("embedding")))))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("probe_id"), col("neighbor_id"), col("rank"), col("cosine"))
  }

  /** Read only the named cells — literal partition pruning (the scan
    * lists exactly these directories; PartitionFilters asserted in
    * InfraSpec). */
  def readCells(spark: SparkSession, path: String, cells: Seq[Int]): DataFrame =
    spark.read.parquet(s"$path/corpus")
      .filter(col("cell").isin(cells: _*))
}
