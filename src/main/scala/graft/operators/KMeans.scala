package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means over an embedding column — the
  * semantic-bucketing step a training pipeline uses to stratify a
  * corpus by content cluster (and the exact computation behind a
  * k-means IVF coarse quantizer).
  *
  * Scale shape: k is a small constant, so `assign` is a broadcast
  * cross join of n×k rows (linear in n — the IVF-centers pattern, see
  * IvfIndex) reduced by a per-point min; `update` is one hash-agg
  * keyed on (cluster, dim) after a posexplode — both shuffle-light,
  * no driver-side state beyond the k×dim centers table itself.
  *
  * Determinism: squared-L2 distances are computed as a fixed
  * left-to-right double fold over float→double casts — no
  * transcendentals — so distances are bit-identical on any
  * IEEE-conformant engine and ties break on the lower center id.
  * Centroid UPDATES average floats and are therefore shuffle-order
  * dependent in the last ulp; callers needing cross-engine-exact
  * output should emit assignments (integers), not raw centroids —
  * see Embeddings.kmeansAssign.
  */
object KMeans {

  /** Σ (a_i − b_i)² in index order, bit-deterministic. Routed through
    * the native codegen'd [[graft.functions.SqDistF]] (identical
    * left-to-right double fold): the previous zip_with+aggregate
    * composition was a codegen-fallback higher-order function paying
    * a per-element lambda dispatch on every pair of the cell-family
    * hot loops. Requires the graft extensions on the session (both
    * Session.build and the test session inject them). */
  def sqDist(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.sqDistF(a, b)

  /** The original composed form, kept as the differential twin the
    * native expression is tested against (SqDistSpec). */
  private[graft] def sqDistComposed(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) =>
        (x.cast("double") - y.cast("double")) *
          (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, v) => acc + v)

  /** Shared nearest-center pipeline, keeping the point vector on the
    * row so [[update]] (and within-cluster consumers like
    * SemDeDup-style pruning) never re-join the full points table.
    * Output: (id, vec, cid, d2). */
  def assignWithVec(points: DataFrame, centers: DataFrame): DataFrame =
    assignFull(points, centers)

  private def assignFull(points: DataFrame, centers: DataFrame): DataFrame = {
    val p = points.toDF("id", "vec")
    val c = centers.toDF("cid", "cvec")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("d2"), col("cid"))
    p.crossJoin(broadcast(c))
      .withColumn("d2", sqDist(col("vec"), col("cvec")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("id"), col("vec"), col("cid"), col("d2"))
  }

  /** Nearest-center assignment: one row per point with its center id
    * and squared distance. `points`: (id, vec); `centers`: (cid, cvec),
    * k rows — always broadcast. */
  def assign(points: DataFrame, centers: DataFrame): DataFrame =
    assignFull(points, centers).select(col("id"), col("cid"), col("d2"))

  /** One Lloyd update: per-cluster per-dimension mean of the assigned
    * points. Empty clusters keep their previous center (standard
    * Lloyd's — no resampling, stays deterministic). */
  def update(points: DataFrame, centers: DataFrame): DataFrame = {
    val assigned = assignFull(points, centers)
    val means = assigned
      .select(col("cid"), posexplode(col("vec")).as(Seq("dim", "v")))
      .groupBy(col("cid"), col("dim"))
      .agg(avg(col("v")).as("m"))
      .groupBy(col("cid"))
      .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("ds"))
      .select(col("cid"), transform(col("ds"), _.getField("m")).as("cvec"))
    centers.toDF("cid", "cvec0")
      .join(means, Seq("cid"), "left")
      .select(col("cid"),
        coalesce(col("cvec"),
          transform(col("cvec0"), _.cast("double"))).as("cvec"))
  }

  /** Total within-cluster squared error under the given centers —
    * Lloyd's guarantees this is non-increasing across [[update]]s
    * (the property KMeansSpec pins). */
  def sse(points: DataFrame, centers: DataFrame): Double =
    assign(points, centers)
      .agg(coalesce(sum(col("d2")), lit(0.0))) // empty input → 0, not NULL
      .head().getDouble(0)
}
