package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Pins deterministic synchronous LPA on planted motifs — above all
  * the property that separates it from connected components: a
  * sparse bridge between two dense blobs does NOT merge them. */
class LabelPropagationSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def run(ids: Seq[Long], edges: Seq[(Long, Long)], rounds: Int = 8) =
    GraphRank.labelPropagationOn(
      ids.toDF("doc_id"), edges.toDF("doc_a", "doc_b"), rounds)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().head

  test("two 4-cliques over one bridge: LPA keeps TWO communities " +
      "(where CC would merge to one)") {
    def clique(v: Seq[Long]) =
      for { a <- v; b <- v if a < b } yield (a, b)
    val edges = clique(Seq(1L, 2L, 3L, 4L)) ++
      clique(Seq(11L, 12L, 13L, 14L)) :+ (4L, 11L)
    val (n, e, comms, largest, singles, conv, _) =
      run(Seq(1L, 2L, 3L, 4L, 11L, 12L, 13L, 14L), edges)
    assert(n == 8L && e == 13L)
    assert(comms == 2L && largest == 4L && singles == 0L && conv == 1L)
  }

  test("self-inclusion damps the 2-cycle: an isolated pair settles " +
      "on the min label instead of oscillating") {
    val (_, _, comms, largest, _, conv, rounds) =
      run(Seq(1L, 2L), Seq((1L, 2L)))
    assert(comms == 1L && largest == 2L && conv == 1L)
    assert(rounds == 1L, "node 2 flips to label 1 in round one, done")
  }

  test("isolated node is its own singleton community") {
    val (n, e, comms, _, singles, conv, _) =
      run(Seq(1L, 2L, 99L), Seq((1L, 2L)))
    assert(n == 3L && e == 1L)
    assert(comms == 2L && singles == 1L && conv == 1L)
  }

  test("paired-checkpoint loop is bit-identical to an independent " +
      "round-at-a-time reference, across odd/even/converging budgets") {
    // driver-side reference: synchronous LPA, argmax by (count desc,
    // label asc) over neighbors + self — implemented independently of
    // the DataFrame loop so the pairing optimization is checked
    // against the SEMANTICS, not against itself
    def reference(ids: Seq[Long], edges: Seq[(Long, Long)], rounds: Int)
        : (Map[Long, Long], Boolean, Int) = {
      val adj = (edges ++ edges.map(_.swap))
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
      var labels = ids.map(i => i -> i).toMap
      var converged = false
      var r = 0
      while (r < rounds && !converged) {
        val next = ids.map { i =>
          val votes = (adj.getOrElse(i, Seq.empty).map(labels) :+ labels(i))
            .groupBy(identity).map { case (l, v) => (l, v.size) }
          i -> votes.minBy { case (l, c) => (-c, l) }._1
        }.toMap
        converged = next == labels
        labels = next
        r += 1
      }
      (labels, converged, if (converged) r - 1 else r)
    }
    // two cliques + bridge (converges), a 10-path (slow drain), and a
    // 4-cycle (oscillation-prone) — at budgets 1..6 (odd and even,
    // pre- and post-fixpoint)
    def clique(v: Seq[Long]) = for { a <- v; b <- v if a < b } yield (a, b)
    val graphs = Seq(
      ((1L to 4L) ++ (11L to 14L),
        clique(Seq(1L, 2L, 3L, 4L)) ++ clique(Seq(11L, 12L, 13L, 14L))
          :+ (4L, 11L)),
      ((1L to 10L), (1L until 10L).map(i => (i, i + 1))),
      ((1L to 4L), Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))))
    for (((ids, edges), gi) <- graphs.zipWithIndex; rounds <- 1 to 6) {
      val (labels, edgesDf, conv, used) = GraphRank.lpaLabelsOn(
        ids.toDF("doc_id"), edges.toDF("doc_a", "doc_b"), rounds)
      val got = labels.as[(Long, Long)].collect().toMap
      val (expLabels, expConv, expUsed) = reference(ids, edges, rounds)
      assert(got == expLabels,
        s"graph $gi rounds=$rounds labels: $got vs $expLabels")
      assert(conv == expConv && used == expUsed,
        s"graph $gi rounds=$rounds conv/used: ($conv,$used) vs ($expConv,$expUsed)")
      graft.operators.Materialize.free(edgesDf)
    }
    graft.operators.Materialize.freeAll(spark)
  }

  test("budget truncation is visible: a long path under 1 round " +
      "reports converged = 0") {
    val path = (1L until 10L).map(i => (i, i + 1))
    val short = run((1L to 10L).toSeq, path, rounds = 1)
    assert(short._6 == 0L, "one round cannot settle a 10-path")
    // the min label walks ONE hop per round, so a 10-path needs ~11
    // rounds to drain + settle — 32 covers it with room
    val long = run((1L to 10L).toSeq, path, rounds = 32)
    assert(long._6 == 1L)
  }
}
