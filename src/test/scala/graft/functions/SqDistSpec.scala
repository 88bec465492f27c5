package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** The native sq_dist_f must be BIT-identical to the composed
  * zip_with+aggregate fold it replaced — same index-order double
  * accumulation — or every integer snap downstream would shift. */
class SqDistSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("native == composed, bit-for-bit, on adversarial floats") {
    // values chosen to make fold ORDER matter if it ever changed:
    // large + tiny magnitudes whose partial sums round differently
    // under reassociation
    val rows = Seq(
      (1L, Array(1e8f, 1f, -1e8f, 3f), Array(0f, 0f, 0f, 0f)),
      (2L, Array(0.1f, 0.2f, 0.3f, 0.7f), Array(0.7f, 0.3f, 0.2f, 0.1f)),
      (3L, Array(Float.MinPositiveValue, 1e-30f, 5f, -5f),
        Array(0f, 0f, 0f, 0f)))
      .toDF("id", "a", "b")
    val got = rows.select(col("id"),
        GraftFunctions.sqDistF(col("a"), col("b")).as("n"),
        graft.operators.KMeans.sqDistComposed(col("a"), col("b")).as("c"))
      .as[(Long, Double, Double)].collect()
    got.foreach { case (id, n, c) =>
      assert(java.lang.Double.doubleToLongBits(n) ==
        java.lang.Double.doubleToLongBits(c), s"row $id: $n != $c")
    }
  }

  test("whole-stage codegen keeps the expression in the hot path") {
    // a local Seq constant-folds to LocalTableScan; a range-derived
    // frame forces a real codegen stage around the projection
    val df = spark.range(4)
      .select(array(col("id").cast("float"),
          lit(2f)).as("a"),
        array(lit(3f), lit(4f)).as("b"))
      .select(GraftFunctions.sqDistF(col("a"), col("b")).as("d"))
    // the `*(n)` prefix marks a WholeStageCodegen stage in the simple
    // plan string; a codegen-fallback expression would break the stage
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [sq_dist_f"), plan)
    // id i: (i-3)^2 + (2-4)^2 -> {13, 8, 5, 4}
    assert(df.as[Double].collect().sorted.toSeq == Seq(4.0, 5.0, 8.0, 13.0))
  }

  test("dimension mismatch fails loudly, not silently truncated") {
    val df = Seq((Array(1f, 2f), Array(3f))).toDF("a", "b")
      .select(GraftFunctions.sqDistF(col("a"), col("b")))
    val e = intercept[Exception] { df.collect() }
    assert(e.getMessage != null)
  }
}
