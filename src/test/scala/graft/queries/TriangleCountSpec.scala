package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Pins triangle counting on planted motifs: exact triangle/wedge
  * counts, single-counting under the degree orientation (including a
  * skewed hub, the case the orientation exists for), and the empty
  * graph. */
class TriangleCountSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def count(edges: Seq[(Long, Long)]) = {
    val df = edges.toDF("doc_a", "doc_b")
    val r = GraphRank.triangleCountOn(df)
      .as[(Long, Long, Long, Long, Long)].collect()
    graft.operators.Materialize.freeAll(spark)
    assert(r.length == 1)
    r.head
  }

  test("triangle + pendant edge: 1 triangle, closure = 3/5 wedges") {
    // K3 on {1,2,3} plus pendant 3-4: degrees 2,2,3,1 → wedges
    // 1+1+3+0 = 5, one triangle, closure_pm = 3000/5 = 600
    val (n, e, w, t, c) = count(Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)))
    assert((n, e, w, t, c) == ((4L, 4L, 5L, 1L, 600L)))
  }

  test("two triangles sharing an edge count as exactly two") {
    // {1,2,3} and {2,3,4}: degrees 2,3,3,2 → wedges 1+3+3+1 = 8
    val (_, _, w, t, c) = count(
      Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L)))
    assert((w, t, c) == ((8L, 2L, 750L)))
  }

  test("a star has wedges but no triangles; closure is 0") {
    val (n, e, w, t, c) = count(Seq((1L, 2L), (1L, 3L), (1L, 4L)))
    assert((n, e, w, t, c) == ((4L, 3L, 3L, 0L, 0L)))
  }

  test("skewed hub: orientation counts each hub triangle once") {
    // hub 1 → {2..11} plus closing edges (2,3) and (10,11): the hub's
    // degree-10 wedges would explode a naive doc_id-ordered join (hub
    // has the LOWEST id); degree orientation points 1's edges INWARD
    val hub = (2L to 11L).map(v => (1L, v))
    val (_, _, _, t, _) = count(hub ++ Seq((2L, 3L), (10L, 11L)))
    assert(t == 2L)
  }

  test("empty edge set: all zeros, no division error") {
    val (n, e, w, t, c) = count(Seq.empty[(Long, Long)])
    assert((n, e, w, t, c) == ((0L, 0L, 0L, 0L, 0L)))
  }
}
