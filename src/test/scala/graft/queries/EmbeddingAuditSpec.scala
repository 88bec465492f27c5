package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Pins centroid-margin semantics on planted geometry: separated
  * clusters have positive margins and zero boundary vectors; a
  * deliberately mislabeled vector is the ONLY negative margin. */
class EmbeddingAuditSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("separated clusters: no boundary vectors; a planted mislabel " +
      "is counted against its (wrong) label") {
    val dir = java.nio.file.Files.createTempDirectory("ea").toString
    // label 0 near (1,0), label 1 near (0,1); vec 99 sits at label 1's
    // cluster but carries label 0 → negative margin for label 0.
    val rows: Seq[(Long, Array[Float], Int)] = Seq(
      (0L, Array(1.0f, 0.0f), 0), (1L, Array(0.9f, 0.1f), 0),
      (2L, Array(1.1f, -0.1f), 0),
      (10L, Array(0.0f, 1.0f), 1), (11L, Array(0.1f, 0.9f), 1),
      (12L, Array(-0.1f, 1.1f), 1),
      (99L, Array(0.0f, 1.0f), 0))
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = EmbeddingAudit.centroidMargin(spark, dir)
      .as[(Int, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val byLabel = got.map(r => r._1 -> r).toMap
    assert(byLabel(0)._2 == 4L && byLabel(1)._2 == 3L)
    assert(byLabel(0)._3 == 1L, "the mislabeled vector is boundary")
    assert(byLabel(1)._3 == 0L)
    assert(byLabel(1)._5 > 0L, "clean cluster keeps a positive margin")
  }
}
