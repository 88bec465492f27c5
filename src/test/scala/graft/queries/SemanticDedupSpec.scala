package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class SemanticDedupSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  // one cluster (only id 0 qualifies as a seed center), hand-crafted
  // cosines: cos(a,b)=0.8, cos(a,c)=0.5, cos(b,c)≈0.92, everything
  // vs the near-zero id-0 anchor ≈ 0 on the first axis pair
  private def frame = Seq(
    (0L, Array(0f, 0f, 0f, 1f)),      // center anchor, dissimilar to all
    (1L, Array(1f, 0f, 0f, 0f)),      // a
    (2L, Array(0.8f, 0.6f, 0f, 0f)),  // b: dup of a at tau<=0.8
    (3L, Array(0.5f, 0.866f, 0f, 0f)) // c: dup of b only (cos(a,c)=0.5)
  ).toDF("vec_id", "embedding")

  private def decisions(tau: Double): Map[Long, (Long, Boolean)] =
    Embeddings.semanticDedupOn(spark, frame, tau)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3))).toMap

  test("greedy keep-first: a doc similar to ANY earlier cluster-mate drops") {
    val got = decisions(tau = 0.6)
    // a keeps (no earlier similar); b drops via a; c drops via b even
    // though b itself dropped — the greedy chain rule, not transitive
    // closure against kept docs only
    assert(got == Map(
      0L -> (0L, true), 1L -> (0L, true),
      2L -> (1L, false), 3L -> (1L, false)))
  }

  test("tau sweeps change decisions") {
    // at tau=0.79 only the cos≈0.8 pair (a,b) trips (cos(b,c)≈0.92
    // also trips), at 0.93 nothing does
    assert(decisions(tau = 0.79) == Map(
      0L -> (0L, true), 1L -> (0L, true),
      2L -> (1L, false), 3L -> (1L, false)))
    assert(decisions(tau = 0.93).values.forall(_ == (0L, true)))
  }

  test("n_dups counts every earlier similar mate, not just one") {
    // d similar to BOTH a and b -> n_dups = 2
    val f = Seq(
      (0L, Array(0f, 0f, 0f, 1f)),
      (1L, Array(1f, 0f, 0f, 0f)),
      (2L, Array(0.8f, 0.6f, 0f, 0f)),
      (3L, Array(0.95f, 0.3122499f, 0f, 0f)) // cos vs a=0.95, vs b≈0.947
    ).toDF("vec_id", "embedding")
    val got = Embeddings.semanticDedupOn(spark, f, 0.9)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 2L))
  }
}
