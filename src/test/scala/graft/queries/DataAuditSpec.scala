package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Pins the constraint-audit semantics on PLANTED violations (the
  * synthetic tables are clean, so an all-pass run over them alone
  * proves nothing) and the linkage's blocking + two-signal match. */
class DataAuditSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._
  private val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")

  private def audit(orders: Seq[(Long, Long, Double)],
      lineitem: Seq[(Long, Long, Long, Double, Double, java.sql.Timestamp)],
      cust: Seq[Long], part: Seq[Long], supp: Seq[Long]) = {
    val o = orders.toDF("o_orderkey", "o_custkey", "o_totalprice")
    val l = lineitem.toDF("l_orderkey", "l_partkey", "l_suppkey",
      "l_quantity", "l_discount", "l_shipdate")
    val out = DataAudit.referentialAuditOn(o, l, cust.toDF("c_custkey"),
        part.toDF("p_partkey"), supp.toDF("s_suppkey"))
      .as[(String, Long, Long, Boolean)].collect()
    out.map(r => r._1 -> ((r._2, r._3, r._4))).toMap
  }

  test("planted orphan FK, duplicate PK, and range violations are " +
      "each counted exactly once by their own constraint") {
    val m = audit(
      // order 11 belongs to missing customer 99; order 10 duplicated;
      // order 12 has non-positive totalprice
      orders = Seq((10L, 1L, 5.0), (10L, 1L, 5.0), (11L, 99L, 5.0),
        (12L, 1L, 0.0)),
      // line 2 → missing order 77; line 3 → missing part 88; line 4 →
      // missing supplier 66; line 5 breaks both range checks
      lineitem = Seq(
        (10L, 1L, 1L, 5.0, 0.05, ts),
        (77L, 1L, 1L, 5.0, 0.05, ts),
        (10L, 88L, 1L, 5.0, 0.05, ts),
        (10L, 1L, 66L, 5.0, 0.05, ts),
        (10L, 1L, 1L, 99.0, 0.9, ts)),
      cust = Seq(1L), part = Seq(1L), supp = Seq(1L))
    assert(m("fk_orders_customer") == ((4L, 1L, false)))
    // the duplicated order 10 fans lineitem's order-FK probe: 4 of 5
    // lines hit order 10 twice -> 9 checked; the pk_ row flags why
    assert(m("fk_lineitem_orders") == ((9L, 1L, false)))
    assert(m("fk_lineitem_part")._2 == 1L)
    assert(m("fk_lineitem_supplier")._2 == 1L)
    assert(m("pk_orders_orderkey_unique") == ((4L, 1L, false)))
    assert(m("ck_orders_totalprice_positive")._2 == 1L)
    assert(m("ck_lineitem_quantity_range") == ((5L, 1L, false)))
    assert(m("ck_lineitem_discount_range") == ((5L, 1L, false)))
    assert(m("nn_lineitem_shipdate") == ((5L, 0L, true)))
    assert(m("pk_customer_custkey_unique") == ((1L, 0L, true)))
  }

  test("a clean micro-lake passes every constraint") {
    val m = audit(orders = Seq((10L, 1L, 5.0)),
      lineitem = Seq((10L, 1L, 1L, 5.0, 0.05, ts)),
      cust = Seq(1L), part = Seq(1L), supp = Seq(1L))
    assert(m.size == 10 && m.values.forall(_._3), s"expected all-pass: $m")
  }

  test("linkage: blocking confines pairs, and both signals (name " +
      "distance AND nation) are required to link") {
    val c = Seq((1L, "Customer#000000007", 3),
        (2L, "Customer#000000008", 4))
      .toDF("c_custkey", "c_name", "c_nationkey")
    val s7 = Seq((70L, "Supplier#000000007", 3), // same block, same nation
        (71L, "Supplier#000000008", 9), // same block as cust 2, nation off
        (72L, "Xupplier_Q000000007", 3)) // same block, name 2 edits worse
      .toDF("s_suppkey", "s_name", "s_nationkey")
    val out = DataAudit.linkBlockedFuzzyOn(c, s7)
      .as[(Long, Long, Long, Long, Boolean, Boolean)].collect().toSeq
    // block 7 pairs cust 1 with supp 70 and 72; block 8 pairs cust 2
    // with supp 71 — never the cross-block (1,71) or (2,70)
    assert(out.map(r => (r._2, r._3)).sorted ==
      Seq((1L, 70L), (1L, 72L), (2L, 71L)))
    val byPair = out.map(r => (r._2, r._3) -> r).toMap
    assert(byPair((1L, 70L))._4 == 5L && byPair((1L, 70L))._6,
      "registry prefix swap is exactly 5 edits and must link")
    assert(byPair((2L, 71L))._4 == 5L && !byPair((2L, 71L))._6,
      "close name but wrong nation must NOT link")
    assert(byPair((1L, 72L))._4 == 7L && !byPair((1L, 72L))._6,
      "7-edit name must NOT link even with the right nation")
  }

  test("k-anonymity: planted sub-k groups are counted; distinct QIDs " +
      "split groups; negative balances bucket like DuckDB") {
    // segment S: 3 clones in one QID group + 1 singleton (different
    // nation); segment T: 2 rows split ONLY by the balance bucket,
    // one of them negative (floor-vs-truncate divide trap)
    val c = Seq(
      (1L, 3, "S", 1234.0), (2L, 3, "S", 1500.0), (3L, 3, "S", 1999.99),
      (4L, 4, "S", 1234.0),
      (5L, 1, "T", 500.0), (6L, 1, "T", -500.0))
      .toDF("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")
    val out = DataAudit.kAnonymityOn(c)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    // S: groups {3 rows}, {1 row} → k=1, 1 singleton, 4 rows below 5
    assert(out("S") == ((4L, 2L, 1L, 1L, 4L)))
    // T: +500 → bucket 1, −500 → bucket 0 (shifted floor) → 2 groups
    assert(out("T") == ((2L, 2L, 1L, 2L, 2L)))
  }

  test("l-diversity: a large-but-homogeneous group is flagged; a " +
      "mixed group is not") {
    // segment S, nation 3: 3 rows ALL distressed (k-anonymous at k=3
    // but l=1 → homogeneous, the disclosure k-anonymity misses);
    // segment S, nation 4: mixed signs → l=2;
    // segment T: one mixed group → l=2, no homogeneous groups
    val c = Seq(
      (1L, 3, "S", -10.0), (2L, 3, "S", -20.0), (3L, 3, "S", -30.0),
      (4L, 4, "S", 100.0), (5L, 4, "S", -100.0),
      (6L, 1, "T", 500.0), (7L, 1, "T", -500.0))
      .toDF("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")
    val out = DataAudit.lDiversityOn(c)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    // S: 2 groups, 5 rows, min_l=1, 1 homogeneous group of 3 rows
    assert(out("S") == ((2L, 5L, 1L, 1L, 3L)))
    // T: 1 group, 2 rows, min_l=2, none homogeneous
    assert(out("T") == ((1L, 2L, 2L, 0L, 0L)))
  }

  test("id gaps: islands counted by absent predecessors, dups and " +
      "coverage exact") {
    // keys {1,2,3,7,8,10} with 10 twice: 3 islands (1, 7, 10 start),
    // coverage 6/10 = 600 pm, 1 dup row
    val ids = Seq(1L, 2L, 3L, 7L, 8L, 10L, 10L).toDF("id")
    val got = DataAudit.idGapsOn(ids)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((7L, 6L, 1L, 1L, 10L, 600L, 3L)))
    // dense run: one island, full coverage, no dups
    val dense = Seq(5L, 6L, 7L).toDF("id")
    val got2 = DataAudit.idGapsOn(dense)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got2 == Seq((3L, 3L, 0L, 5L, 7L, 1000L, 1L)))
  }

  test("numeric correlations: a perfectly linear pair snaps to 1000 " +
      "milli; a constant column guards to 0") {
    // quantity == price/100 exactly -> r = +1.000; discount constant
    // -> zero variance -> both discount pairs guard to 0
    val li = Seq((1.0, 0.05, 100.0), (2.0, 0.05, 200.0),
        (3.0, 0.05, 300.0))
      .toDF("l_quantity", "l_discount", "l_extendedprice")
    val dir = java.nio.file.Files.createTempDirectory("nc").toString
    li.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = DataAudit.numericCorrelations(spark, dir)
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("discount_vs_price", 3L, 0L),
      ("quantity_vs_discount", 3L, 0L),
      ("quantity_vs_price", 3L, 1000L)))
  }

  test("t-closeness: opposite-band groups hit EMD=500pm exactly; " +
      "global-matching groups are 0") {
    // bands: 0.0 → band 0, 1500.0 → band 1. Segment S: group A all
    // band0, group B all band1; global q=(.5,.5), so each group's
    // ordered EMD = .5 → 500 pm exactly on the integer grid.
    // Segment-T-free check of the zero case is the next test.
    val c = Seq(
      (1L, 1, "S", 0.0), (2L, 1, "S", 0.0),
      (3L, 2, "S", 1500.0), (4L, 2, "S", 1500.0))
      .toDF("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")
    val out = DataAudit.tClosenessOn(c)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(("S", 2L, 4L, 500L, 2L, 4L)))
  }

  test("t-closeness: groups mirroring the global mix score 0; a " +
      "single global band degenerates to 0 without dividing") {
    val mixed = Seq(
      (1L, 1, "S", 0.0), (2L, 1, "S", 1500.0),
      (3L, 2, "S", 0.0), (4L, 2, "S", 1500.0))
      .toDF("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")
    val outM = DataAudit.tClosenessOn(mixed)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(outM == Seq(("S", 2L, 4L, 0L, 0L, 0L)))
    // every row in band 0 → m=1 → the m<=1 guard, not a div-by-zero
    val mono = Seq((1L, 1, "S", 0.0), (2L, 2, "S", 10.0))
      .toDF("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")
    val outG = DataAudit.tClosenessOn(mono)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(outG == Seq(("S", 2L, 2L, 0L, 0L, 0L)))
  }

  test("key-skew audit: one row per audited key; skew_pm >= 1000 " +
      "(hottest >= mean) and consistent with the table rows") {
    val d = "/root/testdata/sf0.001"
    val out = DataAudit.keySkewAudit(spark, d)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(out.map(_._1).toSeq == Seq("events.user_id",
      "lineitem.l_orderkey", "lineitem.l_partkey", "lineitem.l_suppkey",
      "orders.o_custkey"))
    val liRows = graft.Tables.lineitem(spark, d).count()
    out.foreach { case (key, nKeys, nRows, maxCnt, skewPm) =>
      assert(nKeys > 0 && maxCnt > 0 && nKeys <= nRows)
      assert(skewPm >= 1000, s"$key: max below mean is impossible")
      if (key.startsWith("lineitem.")) assert(nRows == liRows)
    }
  }
}
