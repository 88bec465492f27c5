package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Pins link_entity_clusters' component fold: survivorship counts on
  * clean blocks, the nation guard, and the 4-round truncation made
  * visible by a planted 10-node name-chain (converged = false). */
class EntityClustersSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def run(cust: Seq[(Long, String, Long)],
      supp: Seq[(Long, String, Long)]) =
    DataAudit.linkEntityClustersOn(
        cust.toDF("c_custkey", "c_name", "c_nationkey"),
        supp.toDF("s_suppkey", "s_name", "s_nationkey"))
      .as[(Long, Long, Long, Long, String, Boolean)].collect().toSeq

  test("two customers sharing one supplier fold into one 3-member " +
      "cluster with the min-id customer as survivor") {
    // suffix 7 = one block; names within lev 5; same nation
    val cust = Seq(
      (1L, "Customer#7", 0L), (2L, "Customer#7", 0L),
      (9L, "Customer#8", 0L)) // block 8: no matching supplier
    val supp = Seq((1L, "Supplier#7", 0L))
    val got = run(cust, supp)
    assert(got.size == 1)
    val (cid, nc, ns, nm, canon, conv) = got.head
    assert(cid == 2L, "customer 1 on the even lane is the min node")
    assert(nc == 2L && ns == 1L && nm == 3L)
    assert(canon == "Customer#7" && conv)
  }

  test("same block, different nation: no link, no cluster") {
    assert(run(Seq((1L, "Customer#3", 0L)),
      Seq((1L, "Supplier#3", 5L))).isEmpty)
  }

  test("a 10-node link chain outruns the 4-round budget: some cluster " +
      "reports converged = false; a clean pair in the same run stays true") {
    // equal-length names a^k b^(48-k) + "#9": lev(Ci, Sj) =
    // |8i - (8j+4)| — 4 for j∈{i-1, i}, ≥12 otherwise → the links form
    // the path C1-S1-C2-S2-...-C5-S5 (9 hops end to end, eccentricity
    // from the min node C1 > 4)
    def nm(k: Int) = "a" * k + "b" * (48 - k) + "#9"
    val cust = (1 to 5).map(i => (i.toLong, nm(8 * i), 0L)) :+
      (100L, "Customer#77", 0L)
    val supp = (1 to 5).map(j => (j.toLong, nm(8 * j + 4), 0L)) :+
      (100L, "Supplier#77", 0L)
    val got = run(cust, supp)
    val chainRows = got.filter(_._5.startsWith("a"))
    assert(chainRows.map(_._4).sum == 10L, "all 10 chain nodes clustered")
    assert(chainRows.exists(!_._6),
      "a 9-hop chain cannot settle in 4 min-label rounds")
    // the min-id cluster's OWN labels are all stable after 4 rounds —
    // it is truncated because round 5 would ABSORB the hop-5 node, and
    // the honesty flag must catch that direction too
    val minCluster = chainRows.minBy(_._1)
    assert(!minCluster._6,
      "the absorbing min-id cluster must also report converged = false")
    val pair = got.find(_._5 == "Customer#77").get
    assert(pair._4 == 2L && pair._6, "the clean pair converges")
  }
}
