package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class PageRankSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  /** Driver-side mirror of the operator's exact integer recurrence. */
  private def refRanks(edges: Seq[(Long, Long)], nIter: Int,
                       dampNum: Long = 85L, dampDen: Long = 100L): Map[Long, Long] = {
    val dedup = edges.distinct
    val nodes = dedup.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val n = nodes.size.toLong
    val deg = dedup.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val base = (PageRank.Scale * (dampDen - dampNum) / dampDen) / n
    var r = nodes.map(_ -> PageRank.Scale / n).toMap
    for (_ <- 1 to nIter) {
      val in = dedup.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => ((r(src) / deg(src)) * dampNum) / dampDen }.sum
      }
      r = nodes.map(id => id -> (base + in.getOrElse(id, 0L))).toMap
    }
    r
  }

  private def run(edges: Seq[(Long, Long)], nIter: Int): Map[Long, Long] =
    PageRank.run(edges.toDF("src", "dst"), nIter)
      .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap

  test("matches the exact integer recurrence on a known graph") {
    // 3 pointing at 1; 1 -> 2 -> 3 -> 1 cycle plus extra in-links to 1
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 1L), (5L, 1L))
    val got = run(edges, nIter = 5)
    assert(got == refRanks(edges, 5))
    // 1 (three in-links) outranks the leaf sources 4 and 5
    assert(got(1L) > got(4L) && got(1L) > got(5L))
  }

  test("dangling and source-only nodes get exactly the base mass") {
    // 2 is dangling (no out-edges): its mass is dropped, not spread.
    // 3 -> 4 chain; 1 has no in-links -> rank = base every iteration.
    val edges = Seq((1L, 2L), (3L, 4L))
    val got = run(edges, nIter = 3)
    val exp = refRanks(edges, 3)
    assert(got == exp)
    val n = 4L
    val base = (PageRank.Scale * 15L / 100L) / n
    assert(got(1L) == base)
    assert(got(3L) == base)
  }

  test("duplicate edge rows do not double-count contributions") {
    val once = run(Seq((1L, 2L), (2L, 1L)), nIter = 4)
    val dup = run(Seq((1L, 2L), (1L, 2L), (2L, 1L)), nIter = 4)
    assert(once == dup)
  }

  test("random graphs match the recurrence (property)") {
    for (seed <- 1 to 3) {
      val rng = new scala.util.Random(seed)
      val edges = (1 to 80)
        .map(_ => (rng.nextInt(25).toLong, rng.nextInt(25).toLong))
        .filter { case (a, b) => a != b }
      assert(run(edges, 4) == refRanks(edges, 4), s"seed=$seed")
    }
  }

  test("rejects an empty edge set and nIter < 1") {
    intercept[IllegalArgumentException] {
      PageRank.run(Seq.empty[(Long, Long)].toDF("src", "dst"), 2).collect()
    }
    intercept[IllegalArgumentException] {
      PageRank.run(Seq((1L, 2L)).toDF("src", "dst"), 0)
    }
  }
}
