package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Pins retrieval_hard_negatives on planted vectors: same-label
  * neighbors (false negatives, including the query itself) are
  * excluded no matter how similar, and ranking follows the exact
  * int8-quantized integer dot. */
class HardNegativesSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("same-label twin is excluded; different-label twin ranks first " +
      "with the exact quantized score") {
    val dir = java.nio.file.Files.createTempDirectory("hn").toString
    val u = Array(1f, 0f, 0f, 0f)
    val near = Array(1f, 0.2f, 0f, 0f)
    // id 0 is the query (0 % 50 == 0); ids 1-3 are candidates only
    Seq((0L, u, 0), (1L, u, 0), (2L, u, 1), (3L, near, 1))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = Embeddings.hardNegatives(spark, dir)
      .as[(Long, Long, Long, Int)].collect().toSeq
    // qv(u) = (127,0,0,0): identical-vector dot = 127² = 16129;
    // qv(near) = (125,25,0,0): dot vs u = 125·127 = 15875
    assert(out == Seq((0L, 2L, 16129L, 1), (0L, 3L, 15875L, 2)),
      s"got $out — the same-label twin (id 1) and the query itself " +
        "must never appear as negatives")
  }
}
