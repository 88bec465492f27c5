package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Pins for the WITH RECURSIVE surface (Spark executes recursive CTEs
  * via UnionLoopExec; the DuckDB oracle runs the identical SQL). */
class RecursiveSqlSpec extends AnyFunSuite {
  import SparkTestSession._

  private val d = "/root/testdata/sf0.01"

  test("recursive_spine: dense 90-day spine, zero-filled gaps, and " +
      "the recursion really runs as UnionLoop") {
    import spark.implicits._
    val df = SqlSurface.sqlRecursiveSpine(spark, d)
    assert(df.queryExecution.executedPlan.toString.contains("UnionLoop"),
      "recursive CTE must plan as UnionLoopExec, not be silently rewritten")
    val rows = df.as[(java.sql.Timestamp, Long, Long)].collect()
    assert(rows.length == 90, "1995Q1 has 90 days")
    val days = rows.map(_._1.toLocalDateTime.toLocalDate)
    days.sliding(2).foreach { case Array(a, b) =>
      assert(b == a.plusDays(1), s"spine gap between $a and $b")
    }
    // gap-fill semantics: a zero row is a day with NO orders, and the
    // non-zero rows must agree with a direct group-by (no spine join
    // artifacts)
    val direct = graft.Tables.orders(spark, d)
      .filter(col("o_orderdate") >= "1995-01-01" &&
        col("o_orderdate") < "1995-04-01")
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(count(lit(1)).as("n"))
      .as[(java.sql.Date, Long)].collect()
      .map { case (dt, n) => dt.toLocalDate -> n }.toMap
    rows.foreach { case (ts, n, cents) =>
      val day = ts.toLocalDateTime.toLocalDate
      assert(n == direct.getOrElse(day, 0L), s"count mismatch on $day")
      if (n == 0) assert(cents == 0L, s"zero-order day $day has revenue")
    }
    assert(rows.exists(_._2 > 0), "no orders matched the window at all")
  }

  test("recursive_hierarchy: per-depth counts reconcile with the " +
      "source tables") {
    import spark.implicits._
    val rows = SqlSurface.sqlRecursiveHierarchy(spark, d)
      .as[(String, Int, Long)].collect()
    val byDepth = rows.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val nNation = graft.Tables.nation(spark, d).count()
    val nCust = graft.Tables.customer(spark, d).count()
    assert(byDepth(0) == 5, "one depth-0 row per region root")
    assert(byDepth(1) == nNation, "depth 1 must cover every nation")
    assert(byDepth(2) == nCust, "depth 2 must cover every customer")
    assert(!byDepth.contains(3),
      "customers are leaves — the walk must terminate before the guard")
  }
}
