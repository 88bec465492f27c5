package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Pins the kNN label vote on planted 2-D geometry: two clean label
  * clusters vote for themselves; a deliberately mislabeled vector
  * planted inside the other cluster is the ONLY wrong vote. */
class KnnLabelEvalSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("knn label eval: clean clusters score 1000 permille; a planted " +
      "mislabel is the single miss of its label family") {
    val dir = java.nio.file.Files.createTempDirectory("knn").toString
    // vec_id 0 is the single seed center (id % 64 == 0), so every
    // vector lands in one cell. Cluster 1 (label 1) near x=1;
    // cluster 2 (label 2) near x=10; id 4 sits INSIDE cluster 1 but
    // carries label 2 — its 3 nearest neighbors all vote label 1.
    val rows = Seq(
      (0L, Array(0.0f, 0f), 1),
      (1L, Array(1.0f, 0f), 1),
      (2L, Array(1.2f, 0f), 1),
      (3L, Array(1.4f, 0f), 1),
      (4L, Array(1.1f, 0f), 2),
      (5L, Array(10.0f, 0f), 2),
      (6L, Array(10.2f, 0f), 2),
      (7L, Array(10.4f, 0f), 2))
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = Embeddings.knnLabelEval(spark, dir)
      .as[(Int, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1, 4L, 4L, 1000L, 0L),
      (2, 4L, 3L, 750L, 0L)))
  }
}
