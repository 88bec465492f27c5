package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Pins the truncated k-core peel on planted motifs: a clique core
  * survives while an attached tail peels away; a long path under a
  * small round budget exposes the truncation via converged = 0. */
class KCoreSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], k: Int, rounds: Int) =
    GraphRank.kcoreOn(edges.toDF("doc_a", "doc_b"), k, rounds)
      .as[(Long, Long, Long, Long, Long, Long)].collect().head

  test("5-clique with a pendant tail: the clique IS the 3-core") {
    val clique = for {
      a <- 1L to 5L; b <- (a + 1) to 5L
    } yield (a, b)
    // tail 5-10-11-12 hangs off node 5; all tail degrees < 3
    val edges = clique ++ Seq((5L, 10L), (10L, 11L), (11L, 12L))
    val (n0, e0, nCore, eCore, conv, rounds) = run(edges, k = 3, rounds = 8)
    assert(n0 == 8L && e0 == 13L)
    assert(nCore == 5L && eCore == 10L && conv == 1L)
    // ONE round drops every below-k node (10, 11, 12 together)
    assert(rounds == 1L)
  }

  test("k=2 path peels one endpoint pair per round: a short budget " +
      "reports converged = 0, a long one finishes") {
    val path = (1L until 12L).map(i => (i, i + 1))
    val short = run(path, k = 2, rounds = 2)
    assert(short._5 == 0L, "truncation must be visible")
    assert(short._3 > 0L, "interior nodes still standing after 2 peels")
    val long = run(path, k = 2, rounds = 8)
    assert(long._3 == 0L && long._4 == 0L && long._5 == 1L,
      "a path has no 2-core; full peel must empty it")
  }

  test("empty graph: all-zero row, converged") {
    val (n0, e0, nCore, eCore, conv, rounds) =
      run(Seq.empty[(Long, Long)], k = 3, rounds = 2)
    assert(n0 == 0L && e0 == 0L && nCore == 0L && eCore == 0L && conv == 1L)
    assert(rounds == 0L, "an empty graph must not pay a peel round")
  }
}
