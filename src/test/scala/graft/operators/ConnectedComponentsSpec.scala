package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class ConnectedComponentsSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("label propagation equals union-find on a known graph") {
    // components: {1,2,3,4-chain}, {10,11}, {20 isolated}
    val nodes = Seq(1L, 2L, 3L, 4L, 10L, 11L, 20L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("src", "dst")
    val got = ConnectedComponents.run(spark, nodes, edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L))
  }

  test("long path converges within diameter iterations") {
    val n = 30
    val nodes = (1L to n.toLong).toDF("id")
    val edges = (1L until n.toLong).map(i => (i, i + 1)).toDF("src", "dst")
    val got = ConnectedComponents.run(spark, nodes, edges, maxIter = 40)
      .collect().map(r => r.getLong(1)).distinct
    assert(got.toSeq == Seq(1L), "a path graph is one component")
  }
}
