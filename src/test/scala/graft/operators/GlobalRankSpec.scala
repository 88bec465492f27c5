package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the distributed exact-rank operator against the window
  * functions it replaces: row numbers equal row_number() OVER (ORDER
  * BY ...), and the arithmetic NTILE equals ntile(k) bucket-for-
  * bucket — across remainder shapes (n % k != 0), n < k, and ties
  * broken by the trailing unique key. */
class GlobalRankSpec extends AnyFunSuite {
  import graft.SparkTestSession._
  import spark.implicits._

  private def check(n: Int, k: Int): Unit = {
    // values with heavy ties (i % 7) force the unique-id tiebreak;
    // ids deliberately unsorted w.r.t. value
    val df = (1 to n).map(i => ((i * 31 % n).toLong, (i % 7).toLong))
      .toDF("id", "v")
    val order = Seq(col("v").desc, col("id").asc)
    val ranked = GlobalRank.withRowNumber(df, order, "rk")
      .crossJoin(broadcast(df.agg(count(lit(1)).as("n_total"))))
      .withColumn("tile", GlobalRank.ntileFromRank("rk", "n_total", k))
    val expected = df
      .withColumn("rk_w", row_number().over(Window.orderBy(order: _*)))
      .withColumn("tile_w", ntile(k).over(Window.orderBy(order: _*)))
    val joined = ranked.join(expected, Seq("id", "v"))
      .select(col("rk"), col("rk_w"), col("tile"), col("tile_w"))
      .collect()
    assert(joined.length == n)
    joined.foreach { r =>
      assert(r.getLong(0) == r.getInt(1).toLong,
        s"rank mismatch at n=$n k=$k: $r")
      assert(r.getLong(2) == r.getInt(3).toLong,
        s"ntile mismatch at n=$n k=$k: $r")
    }
    Materialize.freeAll(spark)
  }

  test("rank + ntile equal the window functions (n % k != 0)") {
    check(103, 5)
  }

  test("even split (n % k == 0)") { check(100, 10) }

  test("n < k: every row its own bucket, no division by zero") {
    check(3, 5)
  }

  test("k = 1 puts everything in bucket 1") { check(17, 1) }
}
