package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Planted-fixture pins for the round-8 Relational4 additions:
  * market-basket lift ordering and backlog age-band bucketing. */
class Relational4Spec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("market basket: lift ranks a rare-but-always-together pair " +
      "above a common independent one; min support filters") {
    // parts 1,2 co-occur in ALL and ONLY baskets 1-3 (perfect lift);
    // parts 3 (7 baskets) and 4 (5 baskets) are common, together in
    // 4 — near independence; parts 5,6 together only twice (below
    // the support floor of 3)
    val items = Seq(
      (1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L), (3L, 1L), (3L, 2L),
      (4L, 3L), (4L, 4L), (5L, 3L), (5L, 4L), (6L, 3L), (6L, 4L),
      (7L, 3L), (7L, 4L), (8L, 3L), (1L, 3L), (2L, 4L), (3L, 3L),
      (6L, 5L), (6L, 6L), (7L, 5L), (7L, 6L))
      .toDF("ok", "pk")
    val got = Relational4.marketBasketOn(items)
      .as[(Int, Long, Long, Long, Long, Long, Long)].collect().toSeq
    val byPair = got.map(r => (r._2, r._3) -> r).toMap
    // n baskets = 8; (1,2): supp_ab=3, supp_1=3, supp_2=3
    //   lift = 1000*8*3/(3*3) = 2666
    assert(byPair((1L, 2L))._7 == 2666L)
    // (3,4): supp_ab=4, supp_3=7, supp_4=5 → 1000*8*4 DIV 35 = 914
    assert(byPair((3L, 4L))._7 == 914L)
    // rank: perfect-lift pair first
    assert(got.head._2 == 1L && got.head._3 == 2L)
    // (5,6) has support 2 < 3 → filtered out
    assert(!byPair.contains((5L, 6L)))
  }

  test("backlog aging: buckets are 30-day bands from the newest " +
      "order; finalized orders are excluded") {
    def ts(day: Long) = new java.sql.Timestamp(day * 86400L * 1000L)
    val orders = Seq(
      // (key, cust, status, total, date, priority)
      (1L, 1L, "O", 100.0, ts(100), "1-URGENT"), // age 0  → bucket 0
      (2L, 1L, "O", 200.0, ts(71), "1-URGENT"),  // age 29 → bucket 0
      (3L, 1L, "P", 300.0, ts(70), "1-URGENT"),  // age 30 → bucket 1
      (4L, 1L, "P", 400.0, ts(5), "1-URGENT"),   // age 95 → capped 3
      (5L, 1L, "F", 500.0, ts(5), "1-URGENT"))   // finalized: excluded
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val got = Relational4.backlogAgingOn(orders)
      .as[(String, String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("O", "1-URGENT", 0L, 2L, 30000L),
      ("P", "1-URGENT", 1L, 1L, 30000L),
      ("P", "1-URGENT", 3L, 1L, 40000L)))
  }

  test("price elasticity: a planted qty=C/price curve recovers slope " +
      "-1 within grid error; constant price guards to 0") {
    // brand E1: (price $, qty) on an exact power law qty = 320/price
    // over prices 10/20/40/80 — true ln-ln slope is exactly -1, the
    // milli-nat grid perturbs the OLS by < 1 milli.
    // brand E2: one price, varying qty -> sxx=0 -> guarded 0.
    val li = Seq(
      (1L, 10.0, 32.0), (1L, 20.0, 16.0), (1L, 40.0, 8.0),
      (1L, 80.0, 4.0),
      (2L, 10.0, 5.0), (2L, 10.0, 9.0))
      .toDF("l_partkey", "l_extendedprice", "l_quantity")
    val p = Seq((1L, "E1"), (2L, "E2")).toDF("p_partkey", "p_brand")
    val got = Relational4.priceElasticityOn(li, p)
      .as[(String, Long, Long)].collect().toSeq
    assert(got.map(r => (r._1, r._2)) == Seq(("E1", 4L), ("E2", 2L)))
    assert(math.abs(got.head._3 + 1000000L) <= 1000L,
      s"E1 slope ${got.head._3} not within 1 milli of -1e6")
    assert(got(1)._3 == 0L)
  }

  test("leadtime percentiles: two-point interpolation lands on the " +
      "centi-day grid exactly") {
    // order day 0, ships at day 10 and day 20: p50=15, p90=19,
    // p99=19.9 -> 1500/1900/1990 centi-days, floor-mean 15
    val day = 86400L
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val li = Seq((1L, t(10 * day)), (1L, t(20 * day)))
      .toDF("l_orderkey", "l_shipdate")
    val o = Seq((1L, "1-URGENT", t(0L)))
      .toDF("o_orderkey", "o_orderpriority", "o_orderdate")
    val dir = java.nio.file.Files.createTempDirectory("lt").toString
    li.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    o.write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = Relational4.leadtimePercentiles(spark, dir)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("1-URGENT", 2L, 1500L, 1900L, 1990L, 15L)))
  }
}
