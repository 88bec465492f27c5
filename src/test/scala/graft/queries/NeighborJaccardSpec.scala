package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Pins per-edge neighbor-set Jaccard on planted motifs: exact values
  * below the cap (triangle, shared-edge bowtie, twin nodes), the
  * no-common-neighbor edge dropping out, structural invariants under
  * the double K=64 cap on a 70-clique (where the md5 sample decides
  * WHICH neighbors survive but the arithmetic must stay consistent:
  * common ≤ min(deg), jaccard ≤ 1000), and the empty graph. */
class NeighborJaccardSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def jacc(edges: Seq[(Long, Long)]) = {
    val df = edges.toDF("doc_a", "doc_b")
    val r = GraphRank.neighborJaccardOn(df)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    graft.operators.Materialize.freeAll(spark)
    r
  }

  test("triangle: every edge has one common neighbor, jaccard 333") {
    // edge (u,v): N(u) = {v,w}, N(v) = {u,w} → common 1, union 3
    val r = jacc(Seq((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(r.size == 3)
    assert(r.forall { case (_, _, c, du, dv, j) =>
      c == 1L && du == 2L && dv == 2L && j == 333L })
  }

  test("4-cycle: opposite corners never share a neighbor — empty") {
    // each edge's endpoints neighbor the two OPPOSITE corners
    assert(jacc(Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L))).isEmpty)
  }

  test("bowtie: the shared edge outranks the wing edges") {
    // triangles {1,2,3} + {2,3,4}: edge (2,3) has common {1,4} and
    // degree 3 each → 2000 DIV 4 = 500; the four wing edges each
    // share one neighbor over union 4 → 250
    val r = jacc(Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L)))
    assert(r.head == ((2L, 3L, 2L, 3L, 3L, 500L)))
    assert(r.tail.forall(_._6 == 250L) && r.size == 5)
  }

  test("adjacent twins: common neighbors dominate the union") {
    // 1,2 adjacent AND sharing {3,4,5}: common 3, union 4+4-3=5 → 600
    val r = jacc(Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L),
      (2L, 3L), (2L, 4L), (2L, 5L)))
    val top = r.head
    assert((top._1, top._2, top._3, top._6) == ((1L, 2L, 3L, 600L)))
  }

  test("70-clique: double cap keeps arithmetic consistent, 20 rows") {
    val edges = for { u <- 1L to 70L; v <- (u + 1) to 70L } yield (u, v)
    val r = jacc(edges)
    assert(r.size == 20, "limit 20 under a dense graph")
    assert(r.forall { case (_, _, c, du, dv, j) =>
      du <= 64L && dv <= 64L && c <= math.min(du, dv) &&
        j >= 0L && j <= 1000L })
  }

  test("empty edge set: no rows, no division error") {
    assert(jacc(Seq.empty[(Long, Long)]).isEmpty)
  }
}
