package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** sketch_profile runs the approximate tier (HLL + quantile sketch)
  * and self-checks it in-query against exact companions; the driver
  * oracle verifies the exact columns byte-for-byte and the bound
  * booleans as TRUE. Here we pin the bounds independently: the
  * booleans must come out true, and the exact companions must agree
  * with a from-scratch exact computation. */
class SketchSpec extends AnyFunSuite {
  import SparkTestSession._

  private val d = "/root/testdata/sf0.01"

  test("all sketch error-bound booleans hold per group") {
    val rows = queries.Relational2.sketchProfile(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val flag = r.getString(0)
      Seq("hll_orders_ok", "hll_parts_ok", "pq_p50_ok", "pq_p95_ok").foreach { c =>
        assert(r.getBoolean(r.fieldIndex(c)), s"$flag: $c violated its bound")
      }
    }
  }

  test("exact companions match an independent exact computation") {
    val got = queries.Relational2.sketchProfile(spark, d)
      .select(col("l_returnflag"), col("exact_orders"), col("price_p50"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val exact = Tables.lineitem(spark, d)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("o"),
        // same grid snap as the query (1/20-of-a-cent grid, see
        // Relational2.sketchProfile) so the compare stays exact
        (floor(expr("percentile(CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT), 0.5)") * 20 + lit(0.5)) / 2000.0).as("p50"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet == exact.keySet)
    exact.foreach { case (k, (eo, e50)) =>
      val (go, g50) = got(k)
      assert(go == eo, s"$k exact_orders: $go vs $eo")
      assert(math.abs(g50 - e50) < 1e-9, s"$k p50: $g50 vs $e50")
    }
  }

  test("approx_count_distinct within 5% of exact per group (raw sketch)") {
    val approx = Tables.lineitem(spark, d)
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_orderkey"), 0.01).as("ao"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.lineitem(spark, d)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("o"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, eo) =>
      assert(math.abs(approx(k) - eo).toDouble / eo < 0.05, s"$k: ${approx(k)} vs $eo")
    }
  }
}
