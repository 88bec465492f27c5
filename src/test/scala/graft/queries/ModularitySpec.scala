package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Pins Newman modularity of the LPA partition on planted motifs
  * where Q is computable by hand: disjoint cliques (the separable
  * case), one clique (Q = 0 — a single community explains nothing
  * beyond the degree distribution), a bridged pair (Q between), and
  * the empty graph (guarded division). */
class ModularitySpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def q(nodes: Seq[Long], edges: Seq[(Long, Long)]) = {
    val docs = nodes.toDF("doc_id")
    val pairs = edges.toDF("doc_a", "doc_b")
    val r = GraphRank.modularityOn(docs, pairs)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    graft.operators.Materialize.freeAll(spark)
    assert(r.length == 1)
    r.head
  }

  test("two disjoint triangles: perfect split, Q = 500 milli") {
    // each community: 3 internal edges, d_c = 6; m = 6
    // Q = 6/6 - 2*36/144 = 0.5
    val (n, m, c, i, qm, conv, _) = q(1L to 6L,
      Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L), (5L, 6L)))
    assert((n, m, c, i) == ((6L, 6L, 2L, 6L)))
    assert(qm == 500L && conv == 1L)
  }

  test("one triangle: a single community has Q = 0") {
    // internal/m = 1, sum_d2 = 36 = 4m² → Q = 1 - 1 = 0
    val (_, m, c, i, qm, _, _) =
      q(1L to 3L, Seq((1L, 2L), (1L, 3L), (2L, 3L)))
    assert((m, c, i, qm) == ((3L, 1L, 3L, 0L)))
  }

  test("bridged triangles: LPA keeps them apart, Q = 357 milli") {
    // bridge (3,4): m = 7, internal = 6, d_c = 7 each
    // Q = 6/7 - 98/196 = 0.357142... → ⌊357.1 + 0.5⌋ = 357
    val (_, m, c, i, qm, _, _) = q(1L to 6L,
      Seq((1L, 2L), (1L, 3L), (2L, 3L),
        (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L)))
    assert((m, c, i) == ((7L, 2L, 6L)))
    assert(qm == 357L)
  }

  test("no edges: Q guarded to 0, every node its own community") {
    val (n, m, c, i, qm, conv, ru) = q(1L to 3L, Seq.empty[(Long, Long)])
    assert((n, m, c, i, qm) == ((3L, 0L, 3L, 0L, 0L)))
    assert(conv == 1L && ru == 0L)
  }
}
