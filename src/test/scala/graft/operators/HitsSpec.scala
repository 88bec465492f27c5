package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Pins operators.Hits bit-for-bit against a driver-side Long-only
  * reference of the same recurrence (init Scale/n; per round: raw
  * authority sums, q = max(1, total/Scale) exact division, then the
  * hub half) — the differential style every fixed-point operator here
  * uses (cf. PageRank's oracle mirror): if any shuffle order, join
  * plan, or overflow detour perturbed a single bit, this fails. */
class HitsSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val S = Hits.Scale

  /** Sequential twin of Hits.run on an edge list. */
  private def reference(edges: Seq[(Long, Long)], nIter: Int)
      : Map[Long, Long] = {
    val e = edges.distinct
    val hubs = e.map(_._1).distinct
    var h: Map[Long, Long] = hubs.map(u => u -> S / hubs.size).toMap
    for (_ <- 1 to nIter) {
      val aRaw = e.groupBy(_._2).map { case (v, es) =>
        v -> es.map(x => h(x._1)).sum
      }
      val qa = math.max(1L, aRaw.values.sum / S)
      val a = aRaw.map { case (v, m) => v -> m / qa }
      val hRaw = e.groupBy(_._1).map { case (u, es) =>
        u -> es.map(x => a(x._2)).sum
      }
      val qh = math.max(1L, hRaw.values.sum / S)
      h = hRaw.map { case (u, m) => u -> m / qh }
    }
    h
  }

  private def run(edges: Seq[(Long, Long)], nIter: Int): Map[Long, Long] =
    Hits.run(edges.toDF("src", "dst"), nIter)
      .as[(Long, Long)].collect().toMap

  test("bipartite clique + singletons: exact equality with the " +
      "sequential twin, dup-heavy hubs rank above singleton hubs") {
    // docs 1..4 all share band 100 (a 4-clique of content); docs 5, 6
    // carry singleton bands; doc 1 additionally has a private band —
    // the motif where hub scores must separate dup-carriers
    val edges = Seq(
      (1L, 100L), (2L, 100L), (3L, 100L), (4L, 100L),
      (1L, 101L), (5L, 102L), (6L, 103L))
    val got = run(edges, nIter = 4)
    assert(got == reference(edges, 4))
    // every member of the shared band outranks every singleton doc
    val cliqueOnly = Seq(2L, 3L, 4L).map(got)
    val singles = Seq(5L, 6L).map(got)
    assert(cliqueOnly.distinct.size == 1, "symmetric docs score equal")
    assert(cliqueOnly.head > singles.max)
    // doc 1 adds a singleton band on top of the clique band: its raw
    // mass can only match-or-beat its clique peers
    assert(got(1L) >= cliqueOnly.head)
    assert(singles.distinct.size == 1)
  }

  test("duplicate input edges collapse (no double-counted mass)") {
    val base = Seq((1L, 10L), (2L, 10L), (3L, 11L))
    assert(run(base ++ base, 3) == reference(base, 3))
  }

  test("two disconnected components normalize against the GLOBAL " +
      "total — bigger clique wins") {
    val edges =
      (1L to 5L).map(u => (u, 200L)) ++ Seq((7L, 201L), (8L, 201L))
    val got = run(edges, nIter = 4)
    assert(got == reference(edges, 4))
    assert(got(1L) > got(7L))
  }
}
