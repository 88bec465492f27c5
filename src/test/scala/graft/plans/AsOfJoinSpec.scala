package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class AsOfJoinSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("native as-of equals the window composition on real data") {
    val d = "/root/testdata/sf0.001"
    val native = graft.queries.Relational2.asofNative(spark, d).collect().toSeq
    val composed = graft.queries.Relational2.asofLastPurchase(spark, d)
      .collect().toSeq
    assert(native.length == composed.length)
    assert(native == composed)
  }

  test("left rows before any build row get nulls; exact boundary matches") {
    val probe = Seq((1L, 10L, 5L), (2L, 10L, 15L), (3L, 10L, 20L),
      (4L, 99L, 50L)).toDF("id", "key", "t")
    val build = Seq((100L, 10L, 15L), (101L, 10L, 18L))
      .toDF("b_id", "b_key", "b_t")
    val got = AsOf.join(probe, build, "key", "b_key", "t", "b_t")
      .select("id", "b_id").orderBy("id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    assert(got.toSeq == Seq((1L, -1L), (2L, 100L), (3L, 101L), (4L, -1L)))
  }

  test("forward direction: earliest >= match, boundary inclusive") {
    // probe at t=15 matches the build row AT 15 (>= is inclusive);
    // probe past the last build row gets null; keys never cross
    val probe = Seq((1L, 10L, 5L), (2L, 10L, 15L), (3L, 10L, 17L),
      (4L, 10L, 30L), (5L, 99L, 1L)).toDF("id", "key", "t")
    val build = Seq((100L, 10L, 15L), (101L, 10L, 18L))
      .toDF("b_id", "b_key", "b_t")
    val got = AsOf.join(probe, build, "key", "b_key", "t", "b_t",
        direction = "forward")
      .select("id", "b_id").orderBy("id")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    assert(got.toSeq == Seq((1L, 100L), (2L, 100L), (3L, 101L),
      (4L, -1L), (5L, -1L)))
  }

  test("forward lookahead is not consumed: equal-t probes share a match") {
    val probe = Seq((1L, 7L, 10L), (2L, 7L, 10L), (3L, 7L, 10L))
      .toDF("id", "key", "t")
    val build = Seq((100L, 7L, 12L)).toDF("b_id", "b_key", "b_t")
    val got = AsOf.join(probe, build, "key", "b_key", "t", "b_t",
        direction = "forward")
      .select("id", "b_id").collect().map(_.getLong(1)).toSeq
    assert(got == Seq(100L, 100L, 100L))
  }

  test("tolerance bounds the gap in both directions") {
    val probe = Seq((1L, 5L, 100L)).toDF("id", "key", "t")
    val build = Seq((200L, 5L, 90L)).toDF("b_id", "b_key", "b_t")
    def run(dir: String, tol: Long) =
      AsOf.join(probe, build, "key", "b_key", "t", "b_t", dir, tol)
        .select("b_id").collect().map(r =>
          if (r.isNullAt(0)) -1L else r.getLong(0)).head
    assert(run("backward", 10L) == 200L)  // gap exactly tolerance: match
    assert(run("backward", 9L) == -1L)    // gap over tolerance: null
    assert(run("forward", 100L) == -1L)   // build row is in the PAST
    val fwdBuild = Seq((300L, 5L, 107L)).toDF("b_id", "b_key", "b_t")
    val fwd = AsOf.join(probe, fwdBuild, "key", "b_key", "t", "b_t",
        "forward", 7L).select("b_id").collect().head.getLong(0)
    assert(fwd == 300L)
    val fwdMiss = AsOf.join(probe, fwdBuild, "key", "b_key", "t", "b_t",
        "forward", 6L).select("b_id").collect().head
    assert(fwdMiss.isNullAt(0))
  }

  test("invalid direction is rejected with a clear error") {
    val df1 = Seq((1L, 2L, 3L)).toDF("a", "b", "c")
    val df2 = Seq((1L, 2L, 3L)).toDF("x", "y", "z")
    val e = intercept[IllegalArgumentException] {
      AsOf.join(df1, df2, "a", "x", "b", "y", direction = "nearest")
    }
    assert(e.getMessage.contains("backward"))
  }

  test("plan contains the custom exec and exactly one shuffle per side") {
    val probe = Seq((1L, 10L, 5L)).toDF("id", "key", "t")
    val build = Seq((100L, 10L, 1L)).toDF("b_id", "b_key", "b_t")
    val plan = AsOf.join(probe, build, "key", "b_key", "t", "b_t")
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    assert(plan.contains("Exchange hashpartitioning"), plan)
  }

  test("optimizer rule prunes unused columns through AsOfJoin") {
    val probe = Seq((1L, 10L, 5L, "wide-col-a")).toDF("id", "key", "t", "junk_a")
    val build = Seq((100L, 10L, 1L, "wide-col-b")).toDF("b_id", "b_key", "b_t", "junk_b")
    val slim = AsOf.join(probe, build, "key", "b_key", "t", "b_t")
      .select("id", "b_id")
    val optimized = slim.queryExecution.optimizedPlan
    val asof = optimized.collect { case a: AsOfJoin => a }.head
    val names = (asof.left.output ++ asof.right.output).map(_.name)
    assert(!names.contains("junk_a") && !names.contains("junk_b"),
      s"unused columns survived pruning: $names")
    // rows unaffected
    assert(slim.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 100L)))
  }

  test("shared-attribute self-join is rejected with a clear error") {
    val df = Seq((1L, 2L, 3L)).toDF("a", "b", "c")
    val e = intercept[IllegalArgumentException] {
      AsOf.join(df, df, "a", "a", "b", "b")
    }
    assert(e.getMessage.contains("alias the right side"))
  }

  test("missing column names the available columns") {
    val df = Seq((1L, 2L)).toDF("x", "y")
    val other = Seq((1L, 2L)).toDF("p", "q")
    val e = intercept[IllegalArgumentException] {
      AsOf.join(df, other, "nope", "p", "y", "q")
    }
    assert(e.getMessage.contains("'nope'") && e.getMessage.contains("x, y"))
  }
}
