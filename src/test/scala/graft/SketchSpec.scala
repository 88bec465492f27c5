package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** sketch_profile has no DuckDB oracle (sketch internals are
  * engine-specific); pin it against exact answers instead:
  * HLL within its configured 1% rsd (generous 5% bound), approx
  * quantiles within the rank error implied by accuracy=10000. */
class SketchSpec extends AnyFunSuite {
  import SparkTestSession._

  private val d = "/root/testdata/sf0.01"

  test("approx_count_distinct within 5% of exact per group") {
    val approx = queries.Relational2.sketchProfile(spark, d)
      .select(col("l_returnflag"), col("approx_orders"), col("approx_parts"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = Tables.lineitem(spark, d)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("o"),
        countDistinct(col("l_partkey")).as("p"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    exact.foreach { case (k, (eo, ep)) =>
      val (ao, ap) = approx(k)
      assert(math.abs(ao - eo).toDouble / eo < 0.05, s"$k orders: $ao vs $eo")
      assert(math.abs(ap - ep).toDouble / ep < 0.05, s"$k parts: $ap vs $ep")
    }
  }

  test("approx_percentile brackets the exact median") {
    val approx = queries.Relational2.sketchProfile(spark, d)
      .select(col("l_returnflag"), col("price_p50"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = Tables.lineitem(spark, d)
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, 0.5)").as("p50"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    exact.foreach { case (k, e50) =>
      val a50 = approx(k)
      assert(math.abs(a50 - e50) / e50 < 0.02, s"$k median: $a50 vs $e50")
    }
  }
}
