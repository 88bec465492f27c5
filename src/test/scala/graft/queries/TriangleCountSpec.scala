package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Pins triangle counting on planted motifs: exact triangle counts,
  * single-counting under the degree orientation (including a skewed
  * hub, the case the orientation exists for), the md5 out-degree cap
  * (the round-7 scale fix — without it the dense LSH candidate graph
  * made the wedge join spill 54 GB at sf0.1), and the empty graph.
  *
  * Closure semantics (round 7): `closure_pm` = closed TESTED wedges
  * per mille, where tested wedges are the oriented two-out-edge
  * wedges after the K=64 cap (`n_wedges_tested`). For graphs with all
  * out-degrees ≤ 64 — every motif here except the clique test — the
  * sample is the full oriented wedge set and the count is exact.
  * `n_wedges` stays the exact UNDIRECTED wedge count Σ C(deg,2). */
class TriangleCountSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def count(edges: Seq[(Long, Long)]) = {
    val df = edges.toDF("doc_a", "doc_b")
    val r = GraphRank.triangleCountOn(df)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    graft.operators.Materialize.freeAll(spark)
    assert(r.length == 1)
    r.head
  }

  test("triangle + pendant edge: 1 triangle from 1 tested wedge") {
    // K3 on {1,2,3} plus pendant 3-4: degrees 2,2,3,1 → undirected
    // wedges 1+1+3+0 = 5. Orientation: 1→2, 1→3, 2→3, 4→3 — only
    // src=1 has two out-edges, its (2,3) wedge closes → 1 triangle,
    // closure 1000
    val (n, e, w, wt, t, c) = count(Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)))
    assert((n, e, w, wt, t, c) == ((4L, 4L, 5L, 1L, 1L, 1000L)))
  }

  test("two triangles sharing an edge count as exactly two") {
    // {1,2,3} and {2,3,4}: degrees 2,3,3,2 → undirected wedges 8.
    // Orientation: 1→2, 1→3, 2→3, 4→2, 4→3 — srcs 1 and 4 each test
    // their (2,3) wedge; both close
    val (_, _, w, wt, t, c) = count(
      Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L)))
    assert((w, wt, t, c) == ((8L, 2L, 2L, 1000L)))
  }

  test("a star has wedges but no triangles; closure is 0") {
    // hub 1 has degree 3, leaves degree 1 → all edges orient INTO the
    // hub; no node has two out-edges → zero tested wedges, guard
    // keeps closure at 0 (no division error)
    val (n, e, w, wt, t, c) = count(Seq((1L, 2L), (1L, 3L), (1L, 4L)))
    assert((n, e, w, wt, t, c) == ((4L, 3L, 3L, 0L, 0L, 0L)))
  }

  test("skewed hub: orientation counts each hub triangle once") {
    // hub 1 → {2..11} plus closing edges (2,3) and (10,11): the hub's
    // degree-10 wedges would explode a naive doc_id-ordered join (hub
    // has the LOWEST id); degree orientation points 1's edges INWARD
    val hub = (2L to 11L).map(v => (1L, v))
    val (_, _, _, _, t, _) = count(hub ++ Seq((2L, 3L), (10L, 11L)))
    assert(t == 2L)
  }

  test("70-clique: out-degrees above 64 are capped; sampled closure stays 1000") {
    // K70 orients by id (all degrees tie at 69): node i has out-degree
    // 70-i, so nodes 1..5 exceed the K=64 cap. Tested wedges =
    // Σ C(min(70-i, 64), 2) — and in a clique EVERY tested wedge
    // closes, so n_triangles == n_wedges_tested and closure is 1000
    // even though the enumeration is a sample. This is the bound that
    // keeps the wedge join at O(n·K²) on the dense LSH graph.
    val edges = for {
      u <- 1L to 70L; v <- (u + 1) to 70L
    } yield (u, v)
    val expTested = (1L to 70L).map { i =>
      val od = math.min(70L - i, 64L); od * (od - 1) / 2
    }.sum
    val (n, e, w, wt, t, c) = count(edges)
    assert((n, e) == ((70L, 70L * 69 / 2)))
    assert(w == 70L * (69L * 68L / 2)) // every node: C(69,2)
    assert(wt == expTested)
    assert(t == wt, "every sampled wedge in a clique must close")
    assert(c == 1000L)
  }

  test("empty edge set: all zeros, no division error") {
    val (n, e, w, wt, t, c) = count(Seq.empty[(Long, Long)])
    assert((n, e, w, wt, t, c) == ((0L, 0L, 0L, 0L, 0L, 0L)))
  }
}
