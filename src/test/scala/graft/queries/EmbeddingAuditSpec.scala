package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Pins centroid-margin semantics on planted geometry: separated
  * clusters have positive margins and zero boundary vectors; a
  * deliberately mislabeled vector is the ONLY negative margin. */
class EmbeddingAuditSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("pair-distance hist: adaptive modulus keeps the sample flat " +
      "across corpus sizes") {
    import org.apache.spark.sql.functions.col
    // 4x corpus growth must NOT grow the pair budget 16x: m scales
    // with n (m = max(8, n DIV 250)) so both corpora sample ~250
    // vectors. Recover the sample size k from SUM(n_pairs) = C(k,2).
    def sampleSize(n: Long): Long = {
      val df = spark.range(n).select(col("id").as("vec_id"),
        org.apache.spark.sql.functions.array(
          (col("id") % 97).cast("float"),
          (col("id") % 31).cast("float")).as("embedding"))
      val pairs = EmbeddingAudit.pairDistanceHistOn(df)
        .selectExpr("SUM(n_pairs)").as[Long].collect().head
      math.round((1.0 + math.sqrt(1.0 + 8.0 * pairs)) / 2.0)
    }
    val k4 = sampleSize(4000L)   // m = 16
    val k16 = sampleSize(16000L) // m = 64
    // binomial noise around 250 (sd ~ 16); the property under test is
    // FLATNESS: 4x corpus, same-order sample
    assert(k4 > 150 && k4 < 350, s"k4=$k4")
    assert(k16 > 150 && k16 < 350, s"k16=$k16")
    assert(math.abs(k16 - k4) < 120, s"sample drifted: $k4 -> $k16")
  }

  test("centroid drift: parity halves with a known shift; the most-" +
      "moved dimension wins the tie-break") {
    val dir = java.nio.file.Files.createTempDirectory("cd").toString
    // label 0: even ids (half 0) at [1.0, 0.5], odd ids (half 1) at
    // [2.0, 0.5] → dim-0 centroid shift −1000 on the e3 grid, dim-1
    // shift 0 → shift2 = 1e6, top_dim 0
    val rows: Seq[(Long, Array[Float], Int)] = Seq(
      (0L, Array(1.0f, 0.5f), 0), (2L, Array(1.0f, 0.5f), 0),
      (1L, Array(2.0f, 0.5f), 0), (3L, Array(2.0f, 0.5f), 0))
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = EmbeddingAudit.centroidDrift(spark, dir)
      .as[(Int, Long, Long, Long, Int, Long)].collect().toSeq
    assert(got == Seq((0, 2L, 2L, 1000000L, 0, -1000L)))
  }

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

  test("isotropy: a planted cross is exactly -1/3 mean pair cosine; " +
      "a collapsed pair is exactly +1; the ALL row mixes both") {
    val dir = java.nio.file.Files.createTempDirectory("iso").toString
    // label 0: the 4 unit axis vectors of R^2 — perfectly spread,
    // ordered-pair dot sum = -4 over 12 pairs → trunc(-1/3 e6).
    // label 1: two identical vectors → mean pair cosine exactly 1,
    // mean-vector norm exactly 1 (1000 on the e3 grid).
    // ALL: S = (2000, 0), ss = 4e6, q = 6e6 → (ss-q)/30 = -66666.
    val rows = Seq(
      (1L, Array(1f, 0f), 0), (2L, Array(0f, 1f), 0),
      (3L, Array(-1f, 0f), 0), (4L, Array(0f, -1f), 0),
      (5L, Array(1f, 0f), 1), (6L, Array(1f, 0f), 1))
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = EmbeddingAudit.isotropy(spark, dir)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("0", 4L, -333333L, 0L),
      ("1", 2L, 1000000L, 1000L),
      ("ALL", 6L, -66666L, 333L)))
  }
}
