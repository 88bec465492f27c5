package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class CosineSimSpec extends AnyFunSuite {
  import SparkTestSession._

  test("native expression equals the zip_with/aggregate composition") {
    GraftFunctions.registerAll(spark)
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val pairs = e.select(col("vec_id").as("a_id"), col("embedding").as("a"))
      .join(e.select(col("vec_id").as("b_id"), col("embedding").as("b")),
        col("a_id") < col("b_id"))
      .limit(500)
    def composed = {
      def dot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
        aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
          lit(0.0), (acc, v) => acc + v)
      pairs.select(col("a_id"), col("b_id"),
        (dot(col("a"), col("b")) / sqrt(dot(col("a"), col("a")) * dot(col("b"), col("b"))))
          .as("cos"))
    }
    val native = pairs.select(col("a_id"), col("b_id"),
      GraftFunctions.cosineSim(col("a"), col("b")).as("cos"))
    val c = composed.orderBy("a_id", "b_id").collect().map(_.getDouble(2))
    val n = native.orderBy("a_id", "b_id").collect().map(_.getDouble(2))
    assert(c.length == 500)
    // bit-identical: same fold order, same double ops
    assert(c.toSeq == n.toSeq)
  }

  test("SQL surface via extensions-injected function") {
    val r = spark.sql(
      "SELECT cosine_sim_f(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
        "array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c").head.getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
  }
}
