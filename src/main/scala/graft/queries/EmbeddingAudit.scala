package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Label-geometry audit over the embeddings table: per-label centroid
  * margins. For every vector, the squared L2 distance to its OWN
  * label centroid vs the nearest OTHER label's centroid; the margin
  * (other − own) is the linear-separability signal that catches
  * mislabeled or boundary examples before they poison a classifier
  * head — the embedding-space twin of the label-noise audits a
  * training-data pipeline runs on text labels.
  *
  * All arithmetic on the ×1e6 integer grid (the same snap
  * emb_dim_variance uses): centroids are integer averages (DIV),
  * distances exact integer sums of squares, so the audit
  * hash-matches DuckDB bit-for-bit.
  *
  * Scale shape: one posexplode O(n·d) feeding a (label, dim)
  * hash-agg; the centroid table is labels×dims rows (640 here) and
  * BROADCAST; the distance join fans each (vec, dim) value out to
  * the |labels| centroids of that dim and re-aggregates keyed on
  * (vec_id, label) — O(n·d·L) with map-side combine, linear in
  * vector count for fixed d, L. Never a vector×vector pair. */
object EmbeddingAudit {

  def centroidMargin(s: SparkSession, d: String): DataFrame = {
    val x = embeddings(s, d)
      .select(col("vec_id"), col("label"),
        posexplode(col("embedding")).as(Seq("dim", "xv")))
      .select(col("vec_id"), col("label"), col("dim"),
        floor(col("xv").cast("double") * 1e6 + 0.5).cast("long").as("xe6"))
    val centroids = x.groupBy(col("label").as("c_label"), col("dim"))
      .agg(expr("SUM(xe6) DIV COUNT(1)").as("ce6"))
    val dists = x.join(broadcast(centroids), Seq("dim"))
      .groupBy(col("vec_id"), col("label"), col("c_label"))
      .agg(sum((col("xe6") - col("ce6")) * (col("xe6") - col("ce6")))
        .as("d2_e12"))
    val perVec = dists.groupBy(col("vec_id"), col("label"))
      .agg(
        max(when(col("c_label") === col("label"), col("d2_e12"))).as("own_d2"),
        min(when(col("c_label") =!= col("label"), col("d2_e12"))).as("other_d2"))
      .withColumn("margin_e12", col("other_d2") - col("own_d2"))
    perVec.groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(when(col("margin_e12") < 0, 1L).otherwise(0L)).as("n_boundary"),
        expr("SUM(own_d2) DIV COUNT(1)").as("mean_own_d2_e12"),
        expr("SUM(margin_e12) DIV COUNT(1)").as("mean_margin_e12"))
      .orderBy(col("label"))
  }

  val centroidMarginSql: String =
    """WITH x AS (
      |  SELECT vec_id, label, CAST(i - 1 AS INT) AS dim,
      |    CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1e6 + 0.5) AS BIGINT)
      |      AS xe6
      |  FROM embeddings, UNNEST(range(1, len(embedding) + 1)) t(i)),
      |cent AS (
      |  SELECT label AS c_label, dim,
      |    CAST(SUM(xe6) // COUNT(*) AS BIGINT) AS ce6
      |  FROM x GROUP BY 1, 2),
      |dists AS (
      |  SELECT x.vec_id, x.label, c.c_label,
      |    CAST(SUM((x.xe6 - c.ce6) * (x.xe6 - c.ce6)) AS BIGINT) AS d2_e12
      |  FROM x JOIN cent c USING (dim)
      |  GROUP BY 1, 2, 3),
      |per_vec AS (
      |  SELECT vec_id, label,
      |    MAX(CASE WHEN c_label = label THEN d2_e12 END) AS own_d2,
      |    MIN(CASE WHEN c_label <> label THEN d2_e12 END) AS other_d2
      |  FROM dists GROUP BY 1, 2)
      |SELECT label, COUNT(*) AS n_vecs,
      |  CAST(SUM(CASE WHEN other_d2 - own_d2 < 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_boundary,
      |  CAST(SUM(own_d2) // COUNT(*) AS BIGINT) AS mean_own_d2_e12,
      |  CAST(SUM(other_d2 - own_d2) // COUNT(*) AS BIGINT) AS mean_margin_e12
      |FROM per_vec GROUP BY label ORDER BY label""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "emb_centroid_margin" -> centroidMargin)

  val oracle: Map[String, String] = Map(
    "emb_centroid_margin" -> centroidMarginSql)
}
