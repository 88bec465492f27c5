package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** IVF (inverted-file) approximate nearest neighbor: a k-means coarse
  * quantizer assigns every vector to one of nLists cells; a query
  * scans only its nProbe nearest cells. The index is a plain
  * DataFrame (vec_id, cell) partitionable by cell — at 100 TB the
  * cells are the partition key and a probe touches nProbe/nLists of
  * the data. Recall vs brute force is pinned in IvfIndexSpec (the
  * quantizer is seeded, so results are deterministic).
  */
object IvfIndex {

  /** Assign every embedding to a cell; returns (vec_id, embedding, cell)
    * plus the centroid table through the model. */
  def build(spark: SparkSession, embeddings: DataFrame, nLists: Int,
      seed: Long = 42L): (DataFrame, Array[Vector]) = {
    val withVec = embeddings
      .withColumn("features", array_to_vector(col("embedding")))
    val model = new KMeans()
      .setK(nLists).setSeed(seed).setMaxIter(20)
      .fit(withVec)
    val assigned = model.transform(withVec)
      .select(col("vec_id"), col("embedding"),
        col("prediction").as("cell"))
    (assigned, model.clusterCenters)
  }

  /** Top-k cosine neighbors for the query vectors, scanning only the
    * nProbe cells nearest each query (by centroid cosine).
    * excludeSelf drops hits where c_id == q_id — only correct when the
    * queries are drawn from the indexed vectors (same id space); leave
    * it false for external query sets or colliding ids silently lose a
    * neighbor. */
  def search(spark: SparkSession, index: DataFrame, centers: Array[Vector],
      queries: DataFrame, k: Int, nProbe: Int,
      excludeSelf: Boolean = false): DataFrame = {
    GraftFunctions.registerAll(spark)
    import spark.implicits._
    val centersDf = centers.zipWithIndex.toSeq
      .map { case (c, i) => (i, c.toArray.map(_.toFloat)) }
      .toDF("cell", "centroid")
    // nearest nProbe cells per query
    val probed = queries.crossJoin(broadcast(centersDf))
      .withColumn("c_cos", GraftFunctions.cosineSim(col("q_emb"), col("centroid")))
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("q_id")).orderBy(col("c_cos").desc, col("cell"))))
      .filter(col("rnk") <= nProbe)
      .select(col("q_id"), col("q_emb"), col("cell"))
    // scan only the probed cells
    probed.join(index, "cell")
      .filter(if (excludeSelf) col("q_id") =!= col("vec_id") else lit(true))
      .withColumn("cos", GraftFunctions.cosineSim(col("q_emb"), col("embedding")))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("vec_id").as("c_id"), col("rank"), col("cos"))
      .orderBy(col("q_id"), col("rank"))
  }
}
