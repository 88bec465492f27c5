package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class IvfIndexSpec extends AnyFunSuite {
  import SparkTestSession._

  private val d = "/root/testdata/sf0.001"

  test("IVF search: probed cells only, decent recall vs brute force") {
    val e = graft.Tables.embeddings(spark, d)
    val (index, centers) = IvfIndex.build(spark, e, nLists = 8)
    assert(index.select("cell").distinct().count() <= 8)
    val queries = e.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val k = 5
    val approx = IvfIndex.search(spark, index, centers, queries, k, nProbe = 3, excludeSelf = true)
      .select("q_id", "c_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    // brute force ground truth (reuses the oracle-checked query)
    val exact = graft.queries.Embeddings.cosineTopK(spark, d)
      .select("q_id", "c_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val recalls = exact.map { case (q, truth) =>
      approx.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
    }
    val meanRecall = recalls.sum / recalls.size
    assert(meanRecall >= 0.6, f"mean recall@5 = $meanRecall%.2f")
    // scanning 3 of 8 cells must not equal a full scan
    assert(approx.keySet == exact.keySet)
  }

  test("IVF is deterministic across builds (seeded quantizer)") {
    val e = graft.Tables.embeddings(spark, d)
    val (i1, _) = IvfIndex.build(spark, e, nLists = 8)
    val (i2, _) = IvfIndex.build(spark, e, nLists = 8)
    val a = i1.select("vec_id", "cell").collect().map(r => (r.getLong(0), r.getInt(1))).sorted
    val b = i2.select("vec_id", "cell").collect().map(r => (r.getLong(0), r.getInt(1))).sorted
    assert(a.toSeq == b.toSeq)
  }
}
