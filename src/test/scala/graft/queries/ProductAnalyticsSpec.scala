package graft.queries

import org.apache.spark.sql.functions.{col, sum}
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Pins the product-analytics tier's boundary semantics on planted
  * event fixtures: inclusive-interval concurrency ties, midnight
  * carry-in, rolling-window clipping at the corpus max day, and the
  * 48-hour attribution cutoff (touches are last NON-purchase, so an
  * intervening purchase never steals attribution). */
class ProductAnalyticsSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def writeEvents(rows: Seq[(Long, java.sql.Timestamp, Long, String, Double, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("pa").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }
  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  test("concurrency: same-second sessions overlap (inclusive ties); " +
      "midnight-crossing sessions carry +1 into the next day") {
    // users 1,2: single-event sessions both at t=1000 → peak 2 on day 0.
    // user 3: one session [86350, 86450] crossing midnight → +1 carried
    // into day 1 at 86400, where nothing else runs → day-1 peak 1.
    val d = writeEvents(Seq(
      (1L, ts(1000), 1L, "view", 1.0, "{}"),
      (2L, ts(1000), 2L, "view", 1.0, "{}"),
      (3L, ts(86350), 3L, "view", 1.0, "{}"),
      (4L, ts(86450), 3L, "view", 1.0, "{}")))
    val got = ProductAnalytics.concurrencyCurve(spark, d)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (0L, 2L, 3L),  // day 0: users 1+2 concurrent; 3 sessions start
      (1L, 1L, 1L))) // day 1: only user 3's carried session touches
  }

  test("rolling actives: trailing windows clip at max_day and " +
      "wau7 >= dau always") {
    // user 1 active day 0 only; user 2 active day 3 only; max_day = 3.
    val d = writeEvents(Seq(
      (1L, ts(3600), 1L, "view", 1.0, "{}"),
      (2L, ts(3 * 86400 + 3600), 2L, "view", 1.0, "{}")))
    val got = ProductAnalytics.rollingActiveUsers(spark, d)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    // day 0: dau 1, wau7 1 (only user 1); day 3: dau 1 (user 2), but
    // user 1's day-0 activity still inside the 7-day window → wau7 2;
    // stickiness 1000*1/2 = 500. Days 1,2 have no dau row (dau join).
    assert(got == Seq(
      (0L, 1L, 1L, 1L, 1000L),
      (3L, 1L, 2L, 2L, 500L)))
  }

  test("attribution: 48h cutoff is exact; intervening purchases never " +
      "steal the touch; first-event purchases fall to 'none'") {
    val d = writeEvents(Seq(
      // user 1: click at t=0, purchase 48h LATER EXACTLY → attributed
      (1L, ts(0), 1L, "click", 0.0, "{}"),
      (2L, ts(172800), 1L, "purchase", 10.0, "{}"),
      // user 2: view at t=0, purchase 48h + 1s → outside window → none
      (3L, ts(0), 2L, "view", 0.0, "{}"),
      (4L, ts(172801), 2L, "purchase", 20.0, "{}"),
      // user 3: click, then purchase, then ANOTHER purchase — both
      // credit the click (purchases are never touches)
      (5L, ts(100), 3L, "click", 0.0, "{}"),
      (6L, ts(200), 3L, "purchase", 5.0, "{}"),
      (7L, ts(300), 3L, "purchase", 7.0, "{}"),
      // user 4: purchase with no prior event at all → none
      (8L, ts(50), 4L, "purchase", 1.0, "{}")))
    val got = ProductAnalytics.attributionLastTouch(spark, d)
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      ("click", 3L, 2200L),  // 10.00 + 5.00 + 7.00
      ("none", 2L, 2100L)))  // 20.00 + 1.00
  }

  test("cusum: the windowed closed form equals Page's recursion " +
      "S_t = max(0, S_{t-1} + dev_t) on a planted level shift") {
    // one event type, 10 days: 8 days at 10.00, then a shift to 30.00
    val rows = (0 until 10).map { day =>
      val v = if (day >= 8) 30.00 else 10.00
      ((day + 1).toLong, ts(day * 86400L + 3600L), 1L, "click", v, "{}")
    }
    val d = writeEvents(rows)
    val got = ProductAnalytics.cusumChangepoint(spark, d)
      .as[(String, Long, Long, Long, Long, Boolean)].collect()
      .sortBy(_._2).toSeq
    // sequential reference: same integer mean/dev, textbook recursion
    val cents = got.map(_._3)
    val mean = cents.sum / cents.length
    val expected = cents.scanLeft(0L) { (s, c) =>
      math.max(0L, s + (c - mean)) }.tail
    assert(got.map(_._5) == expected)
    // the shift is flagged: variance is inflated by the planted step,
    // so only the post-shift accumulation crosses the 3-sigma bar
    assert(got.takeWhile(_._2 < 8).forall(!_._6))
    assert(got.last._6)
  }

  test("rfm: a single purchasing user lands in segment 111 " +
      "(best quintile on every axis when alone)") {
    val d = writeEvents(Seq(
      (1L, ts(1000), 1L, "purchase", 12.34, "{}"),
      (2L, ts(2000), 2L, "view", 0.0, "{}"))) // non-purchaser: excluded
    val got = ProductAnalytics.rfmSegments(spark, d)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("111", 1L, 1234L, 1L)))
  }

  test("touchpoints' last_touch equals the window-idiom attribution " +
      "per purchase (bucketed range join vs ordered window, whole " +
      "sf0.001 fixture)") {
    val d = "/root/testdata/sf0.001"
    val viaJoin = ProductAnalytics.attributionTouchpoints(spark, d)
      .select(col("p_id"), col("last_touch"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val viaWindow = ProductAnalytics.attributionPerPurchase(spark, d)
      .select(col("event_id"), col("attributed"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(viaJoin == viaWindow)
    assert(viaJoin.valuesIterator.contains("none") &&
      viaJoin.valuesIterator.exists(_ != "none"),
      "fixture must exercise both branches")
  }

  test("did uplift: treat-arm post jump nets out the flat control " +
      "arm; midpoint anchors from the data") {
    // days 0..3 -> mid_day 2; pre {0,1}, post {2,3}.
    // control (even ids): u0 1 pre + 1 post purchase, u2 views only.
    // treat (odd ids): u1 2 post, u3 1 pre + 1 post.
    // did = (3000/2 - 1000/2) - (1000/2 - 1000/2) = 1000 milli.
    val day = 86400L
    val d = writeEvents(Seq(
      (1L, ts(0L), 0L, "purchase", 1.0, "{}"),
      (2L, ts(2 * day), 0L, "purchase", 1.0, "{}"),
      (3L, ts(1 * day), 2L, "view", 0.0, "{}"),
      (4L, ts(3 * day), 2L, "view", 0.0, "{}"),
      (5L, ts(2 * day), 1L, "purchase", 1.0, "{}"),
      (6L, ts(3 * day), 1L, "purchase", 1.0, "{}"),
      (7L, ts(0L), 3L, "purchase", 1.0, "{}"),
      (8L, ts(3 * day), 3L, "purchase", 1.0, "{}")))
    val got = ProductAnalytics.didUplift(spark, d)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((2L, 2L, 1L, 1L, 1L, 3L, 1000L)))
  }

  test("mde power: pooled p=1/4 over 2+2 users yields the closed-form " +
      "MDE and required n exactly") {
    // user 0 converts (14 purchases), users 1..3 don't: p = 0.25
    // (exact in binary), arms 2/2 — the doubles below mirror the
    // engine expression term-for-term.
    val rows = (0 until 14).map(i =>
      (100L + i, ts(i * 3600L), 0L, "purchase", 1.0, "{}")) ++ Seq(
      (1L, ts(0L), 1L, "view", 0.0, "{}"),
      (2L, ts(0L), 2L, "view", 0.0, "{}"),
      (3L, ts(0L), 3L, "view", 0.0, "{}"))
    val d = writeEvents(rows)
    val got = ProductAnalytics.mdePower(spark, d)
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    val p = 1.0 / 4.0
    val mde = math.floor(2.801585 *
      math.sqrt(p * (1.0 - p) * (1.0 / 2.0 + 1.0 / 2.0)) * 1000 + 0.5)
      .toLong
    val nreq = math.ceil(
      2.801585 * 2.801585 * 2.0 * p * (1.0 - p) / 0.0001).toLong
    assert(got == ((2L, 2L, 1L, 250L, mde, nreq)))
    assert(mde == 1213L && nreq == 29434L,
      s"closed forms moved: mde=$mde nreq=$nreq")
  }

  test("rfm migration: stay, churn, and acquisition land in their " +
      "matrix cells with post-half revenue") {
    // days 0..3, mid 2. pre: u1 $300 > u2 $200 > u3 $100 (tiers
    // 1/2/3); post: u1 $300 > u4 $200 > u3 $100. u2 churns (2->0),
    // u4 is acquired (0->2), u1 and u3 hold their tiers.
    val day = 86400L
    val d = writeEvents(Seq(
      (1L, ts(0L), 1L, "purchase", 300.0, "{}"),
      (2L, ts(day), 2L, "purchase", 200.0, "{}"),
      (3L, ts(0L), 3L, "purchase", 100.0, "{}"),
      (4L, ts(2 * day), 1L, "purchase", 300.0, "{}"),
      (5L, ts(3 * day), 3L, "purchase", 100.0, "{}"),
      (6L, ts(2 * day), 4L, "purchase", 200.0, "{}")))
    val got = ProductAnalytics.rfmMigration(spark, d)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (0L, 2L, 1L, 20000L),
      (1L, 1L, 1L, 30000L),
      (2L, 0L, 1L, 0L),
      (3L, 3L, 1L, 10000L)))
  }

  test("ab srm: an all-treat split trips the 3-sigma gate; a mild " +
      "imbalance does not") {
    // 16 odd users, 0 even: z = 16/4 = 4.000 -> detected
    val allTreat = writeEvents((0 until 16).map(i =>
      (i.toLong, ts(i * 60L), 2L * i + 1, "view", 0.0, "{}")))
    val got = ProductAnalytics.abSrm(spark, allTreat)
      .as[(Long, Long, Long, Long, Boolean)].collect().toSeq
    assert(got == Seq((0L, 16L, 16L, 4000L, true)))
    // 1 control vs 10 treat: z = 9/sqrt(11) = 2.714 -> below the gate
    val mild = writeEvents(
      (0 until 10).map(i =>
        (i.toLong, ts(i * 60L), 2L * i + 1, "view", 0.0, "{}")) :+
      (99L, ts(0L), 2L, "view", 0.0, "{}"))
    val got2 = ProductAnalytics.abSrm(spark, mild)
      .as[(Long, Long, Long, Long, Boolean)].collect().toSeq
    assert(got2 == Seq((1L, 10L, 9L, 2714L, false)))
  }

  test("growth accounting: new/retained/resurrected classified per " +
      "week, churn attributed to the week users go missing") {
    // u1 wk0-3 (retained), u2 wk0 only, u3 wk0+wk2 (resurrected),
    // u4 wk1 only
    val wk = 7 * 86400L
    val d = writeEvents(Seq(
      (1L, ts(0L), 1L, "view", 0.0, "{}"),
      (2L, ts(wk), 1L, "view", 0.0, "{}"),
      (3L, ts(2 * wk), 1L, "view", 0.0, "{}"),
      (4L, ts(3 * wk), 1L, "view", 0.0, "{}"),
      (5L, ts(0L), 2L, "view", 0.0, "{}"),
      (6L, ts(0L), 3L, "view", 0.0, "{}"),
      (7L, ts(2 * wk), 3L, "view", 0.0, "{}"),
      (8L, ts(wk), 4L, "view", 0.0, "{}")))
    val got = ProductAnalytics.growthAccounting(spark, d)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (0L, 3L, 3L, 0L, 0L, 0L, 0L),
      (1L, 2L, 1L, 1L, 0L, 2L, 500L),
      (2L, 2L, 0L, 1L, 1L, 1L, 1000L),
      (3L, 1L, 0L, 1L, 0L, 1L, 0L)))
    // the accounting identity holds row-by-row
    got.foreach { case (_, a, n, r, res, _, _) => assert(a == n + r + res) }
  }

  test("position attribution: U-curve splits 103 cents 41/11/10/41 " +
      "and conserves revenue to the cent on the fixture") {
    // 4 touches a<b<c<d then a $1.03 purchase: ends get 2*103/5=41
    // each, the 21-cent middle pool floors to 10 with its 1-cent
    // remainder to the EARLIEST middle.
    val d = writeEvents(Seq(
      (1L, ts(10L), 1L, "a", 0.0, "{}"),
      (2L, ts(20L), 1L, "b", 0.0, "{}"),
      (3L, ts(30L), 1L, "c", 0.0, "{}"),
      (4L, ts(40L), 1L, "d", 0.0, "{}"),
      (5L, ts(100L), 1L, "purchase", 1.03, "{}")))
    val got = ProductAnalytics.attributionPosition(spark, d)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(got == Map("a" -> 41L, "b" -> 11L, "c" -> 10L, "d" -> 41L))
    // conservation on the real fixture: sum of credits (incl. 'none')
    // equals total purchase cents exactly
    val fx = "/root/testdata/sf0.001"
    val credited = ProductAnalytics.attributionPosition(spark, fx)
      .agg(sum(col("credit_cents"))).as[Long].collect().head
    val total = graft.Tables.events(spark, fx)
      .filter(col("event_type") === "purchase")
      .agg(sum(graft.queries.Relational.cents(col("value"))))
      .as[Long].collect().head
    assert(credited == total, s"$credited != $total")
  }

  test("retention halflife: a planted weekly halving fits slope " +
      "-ln2 exactly and half-life = 100 centi-weeks") {
    // one cohort of 8 (week 0); 4 return wk1, 2 wk2, 1 wk3: the
    // micro-nat floors land on an EXACTLY linear curve (each step is
    // the same ln(1/2) floor apart), so integer OLS gives -693147
    // and 69314700 DIV 693147 = 100.
    val wk = 7 * 86400L
    val active = Seq(
      (0, Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L)),
      (1, Seq(1L, 2L, 3L, 4L)),
      (2, Seq(1L, 2L)),
      (3, Seq(1L)))
    val rows = for {
      (w, users) <- active; u <- users
    } yield (w * 100L + u, ts(w * wk + u * 60), u, "view", 0.0, "{}")
    val d = writeEvents(rows)
    val got = ProductAnalytics.retentionHalflife(spark, d)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((3L, -693147L, 100L)))
  }

  test("tail index: a planted geometric activity ladder recovers the " +
      "Hill alpha on the milli grid, k adapting below 100 users") {
    // counts 16/8/4/2/1 over 5 users: k=4, x_ref=1, the four micro-nat
    // floors sum to 6931470, alpha = 4e9 DIV 6931470 = 577 milli —
    // the closed form 4/(10 ln 2).
    val rows = Seq(16, 8, 4, 2, 1).zipWithIndex.flatMap {
      case (n, u) => (0 until n).map(i =>
        (u * 100L + i, ts(u * 3600L + i), u.toLong, "view", 0.0, "{}"))
    }
    val d = writeEvents(rows)
    val got = ProductAnalytics.tailIndex(spark, d)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((4L, 1L, 6931470L, 577L)))
  }

  test("cuped: a post-period exactly equal to pre gives theta = 1, " +
      "full variance reduction, and a raw uplift adjusted to zero") {
    // 4 users, purchases on day 0 (pre) and day 2 (post), post == pre:
    // x = (200,100,400,300) cents, y = x. theta = 1e6 exactly,
    // rho^2 = 1 -> var_reduction 1000. Raw uplift: treat (u1,u3)
    // mean 300 cents vs control (u2,u4) mean 200 -> +100 cents =
    // 1e8 micro-cents, ALL of it pre-period imbalance -> CUPED 0.
    def buy(id: Long, u: Long, day: Long, v: Double) =
      (id, ts(day * 86400L + 3600L), u, "purchase", v, "{}")
    val d = writeEvents(Seq(
      buy(1L, 1L, 0, 2.0), buy(2L, 1L, 2, 2.0),
      buy(3L, 2L, 0, 1.0), buy(4L, 2L, 2, 1.0),
      buy(5L, 3L, 0, 4.0), buy(6L, 3L, 2, 4.0),
      buy(7L, 4L, 0, 3.0), buy(8L, 4L, 2, 3.0)))
    val got = ProductAnalytics.cupedAdjusted(spark, d)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((2L, 2L, 1000000L, 100000000L, 0L, 1000L)))
  }

  test("gini: a planted 1/2/3/4 count ladder gives exactly 0.25; " +
      "equal purchase spends give exactly 0") {
    // events: users 1..4 with 1,2,3,4 events → Σx=10, Σi·x=30,
    // G = (60-50)/40 = 0.25 → 250000 on the e6 grid.
    // purchases: users 1,2 spend 2.00 each → perfect equality,
    // G = (2·(200+400) - 3·400)/(2·400) = 0 exactly.
    val base = (1 to 4).flatMap { u =>
      (0 until u).map(i =>
        (u * 10L + i, ts(u * 3600L + i * 60), u.toLong, "view", 0.0, "{}"))
    }
    val buys = Seq(
      (900L, ts(7 * 3600L), 1L, "purchase", 2.0, "{}"),
      (901L, ts(8 * 3600L), 2L, "purchase", 2.0, "{}"))
    val d = writeEvents(base ++ buys)
    val got = ProductAnalytics.giniConcentration(spark, d)
      .as[(String, Long, Long, Long)].collect().toSeq
    // the two purchase events also count toward the event ladder:
    // counts become 2,3,3,4 → Σx=12, Σi·x = 2·1+3·2+3·3+4·4 = 33,
    // G = (66 - 60)/48 = 0.125 → 125000.
    assert(got == Seq(
      ("events", 4L, 12L, 125000L),
      ("purchase_cents", 2L, 400L, 0L)))
  }
}
