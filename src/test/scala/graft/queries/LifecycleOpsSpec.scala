package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Pins the lifecycle tier's semantics on planted fixtures: the −1
  * never-converted bucket, integer histogram bin edges, the bit-length
  * entropy ladder on a known transition matrix, distinct-slot
  * co-presence counting, and the MAD audit's discrete lower median. */
class LifecycleOpsSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  private def writeEvents(
      rows: Seq[(Long, java.sql.Timestamp, Long, String, Double, String)])
      : String = {
    val dir = java.nio.file.Files.createTempDirectory("lc").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("time to convert: day buckets from first-seen, -1 for never") {
    // user 1: first event t=0, purchase at day 2 (2*86400+10)
    // user 2: purchase IS the first event -> latency 0
    // user 3: never purchases -> -1 bucket
    val d = writeEvents(Seq(
      (1L, ts(0), 1L, "view", 0.0, "{}"),
      (2L, ts(2 * 86400 + 10), 1L, "purchase", 0.0, "{}"),
      (3L, ts(50), 2L, "purchase", 0.0, "{}"),
      (4L, ts(60), 3L, "click", 0.0, "{}")))
    val got = LifecycleOps.timeToConvert(spark, d)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((-1L, 1L, 333L), (0L, 1L, 333L), (2L, 1L, 333L)))
  }

  test("value histogram: integer bin edges, max lands in bucket 9") {
    // one type, cents 0..99 -> mn=0, mx=9900 over 100 events? keep tiny:
    // values 0,1,...,9 dollars -> cents 0..900, width rule
    // bucket = (c-0)*10 DIV 901 -> 0..9, c=900 -> 9
    val rows = (0 until 10).map(i =>
      (i.toLong, ts(i * 100L), 1L, "a", i.toDouble, "{}"))
    val d = writeEvents(rows)
    val got = LifecycleOps.valueHistogram(spark, d)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got.size == 10)
    assert(got.head == ("a", 0L, 1L, 0L, 0L))
    assert(got.last == ("a", 9L, 1L, 900L, 900L))
  }

  test("markov entropy: uniform 2-way split is exactly 1000 millibits") {
    // user chains: a->b, a->c, a->b, a->c (n=4, k=2,2)
    // bits: 2*(bitlen(4)-bitlen(2)) * 2 = 2*(3-2)*2 = 4; 1000*4/4 = 1000
    val d = writeEvents(Seq(
      (1L, ts(0), 1L, "a", 0.0, "{}"),
      (2L, ts(1), 1L, "b", 0.0, "{}"),
      (3L, ts(2), 1L, "a", 0.0, "{}"),
      (4L, ts(3), 1L, "c", 0.0, "{}"),
      (5L, ts(0), 2L, "a", 0.0, "{}"),
      (6L, ts(1), 2L, "b", 0.0, "{}"),
      (7L, ts(2), 2L, "a", 0.0, "{}"),
      (8L, ts(3), 2L, "c", 0.0, "{}")))
    val got = LifecycleOps.markovEntropy(spark, d)
      .as[(String, Long, Long, Long, String, Long)].collect()
      .map(r => r._1 -> r).toMap
    val a = got("a")
    assert(a._2 == 4L && a._3 == 2L && a._4 == 1000L)
    // modal tie between b and c breaks to the lexicographically first
    assert(a._5 == "b" && a._6 == 2L)
    // b -> a deterministic: entropy 0
    assert(got("b")._4 == 0L && got("b")._5 == "a")
  }

  test("copresence: distinct (hour,type) slots — repeats don't double") {
    // users 1,2 share hour-0 'click' (user 1 clicks twice — one slot)
    // and hour-1 'view'; users 1,3 share only hour-0 'click'
    val d = writeEvents(Seq(
      (1L, ts(10), 1L, "click", 0.0, "{}"),
      (2L, ts(20), 1L, "click", 0.0, "{}"),
      (3L, ts(30), 2L, "click", 0.0, "{}"),
      (4L, ts(40), 3L, "click", 0.0, "{}"),
      (5L, ts(3700), 1L, "view", 0.0, "{}"),
      (6L, ts(3800), 2L, "view", 0.0, "{}")))
    val got = LifecycleOps.copresenceAffinity(spark, d)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 2L, 0L), (1L, 3L, 1L, 0L), (2L, 3L, 1L, 0L)))
  }

  test("copresence cap: identity below K, bounded pairs + honesty above") {
    import org.apache.spark.sql.functions.col
    // two buckets: a cold 6-user slot and a hot 40-user slot
    val df = ((1L to 6L).map(u => (0L, "click", u)) ++
      (1L to 40L).map(u => (1L, "view", u)))
      .toDF("hour_idx", "event_type", "user_id")
    val capped = LifecycleOps.copresenceAffinityOn(df, capK = 16)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val open = LifecycleOps.copresenceAffinityOn(df, capK = 1000000)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // honesty column: exactly the one hot bucket reported as capped
    assert(capped.forall(_._4 == 1L))
    assert(open.forall(_._4 == 0L))
    // counts stay within the 2-slot ceiling (cold + hot) in both runs;
    // the capped run's hot bucket emits at most C(16,2)=120 candidates
    assert(capped.forall(_._3 <= 2L) && open.forall(_._3 <= 2L))
    assert(capped.size <= 20 && open.size <= 20)
    // identity on a frame where NO bucket exceeds K: capped == uncapped
    val cold = (1L to 6L).map(u => (0L, "click", u))
      .toDF("hour_idx", "event_type", "user_id")
    val x = LifecycleOps.copresenceAffinityOn(cold, capK = 16)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val y = LifecycleOps.copresenceAffinityOn(cold, capK = 1000000)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(x == y && x.nonEmpty && x.forall(_._4 == 0L))
  }

  test("streaks: consecutive-day islands; repeats within a day don't " +
      "extend; the BEST streak per user feeds the histogram") {
    val day = 86400L
    val d = writeEvents(Seq(
      // u1: days 0,1,2 then 5 → best 3 (two events on day 1 = one day)
      (1L, ts(10), 1L, "a", 0.0, "{}"),
      (2L, ts(day + 10), 1L, "a", 0.0, "{}"),
      (3L, ts(day + 20), 1L, "a", 0.0, "{}"),
      (4L, ts(2 * day + 10), 1L, "a", 0.0, "{}"),
      (5L, ts(5 * day + 10), 1L, "a", 0.0, "{}"),
      // u2: one day → best 1
      (6L, ts(10 * day), 2L, "a", 0.0, "{}"),
      // u3: days 3,4 → best 2
      (7L, ts(3 * day), 3L, "a", 0.0, "{}"),
      (8L, ts(4 * day), 3L, "a", 0.0, "{}")))
    val got = LifecycleOps.streakLengths(spark, d)
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1L), (2L, 1L), (3L, 1L)))
  }

  test("interarrival quantiles: per-(user,type) gaps, snapped centisec") {
    // user 1 type a at 0,10,30 -> gaps 10,20; p50 = 15 s = 1500 centisec
    val d = writeEvents(Seq(
      (1L, ts(0), 1L, "a", 0.0, "{}"),
      (2L, ts(10), 1L, "a", 0.0, "{}"),
      (3L, ts(30), 1L, "a", 0.0, "{}")))
    val got = LifecycleOps.interarrivalQuantiles(spark, d)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got.map(r => (r._1, r._2, r._3)) == Seq(("a", 2L, 1500L)))
  }

  test("survival curve: suffix counts over lifespans, zero tail") {
    // user 1 lifespan 0 days; user 2 lifespan 2 days
    val d = writeEvents(Seq(
      (1L, ts(100), 1L, "a", 0.0, "{}"),
      (2L, ts(200), 1L, "a", 0.0, "{}"),
      (3L, ts(0), 2L, "a", 0.0, "{}"),
      (4L, ts(2 * 86400), 2L, "a", 0.0, "{}")))
    val got = LifecycleOps.survivalCurve(spark, d)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got.size == 30)
    assert(got.take(3) == Seq((0L, 2L, 1000L), (1L, 1L, 500L),
      (2L, 1L, 500L)))
    assert(got.drop(3).forall(r => r._2 == 0L && r._3 == 0L))
  }

  test("windowed funnel: 3-day boundary is inclusive, beyond is out") {
    val day = 86400L
    val d = writeEvents(Seq(
      // user 1: click exactly at signup+3d (in), purchase at click+3d (in)
      (1L, ts(0), 1L, "signup", 0.0, "{}"),
      (2L, ts(3 * day), 1L, "click", 0.0, "{}"),
      (3L, ts(6 * day), 1L, "purchase", 0.0, "{}"),
      // user 2: click one second past the window (out)
      (4L, ts(0), 2L, "signup", 0.0, "{}"),
      (5L, ts(3 * day + 1), 2L, "click", 0.0, "{}")))
    val got = LifecycleOps.funnelWindowed(spark, d)
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("1_signup", 2L, 1000L), ("2_click_3d", 1L, 500L),
      ("3_purchase_3d", 1L, 1000L)))
  }

  test("bot regularity: a metronome ranks first with zero variance") {
    val metronome = (0 until 11).map(i =>
      (100L + i, ts(i * 10L), 1L, "a", 0.0, "{}"))
    val human = Seq(0L, 7L, 9L, 30L, 31L, 55L, 80L, 81L, 82L, 120L, 200L)
      .zipWithIndex.map { case (t, i) => (200L + i, ts(t), 2L, "a", 0.0, "{}") }
    val d = writeEvents(metronome ++ human)
    val got = LifecycleOps.botRegularity(spark, d)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got.head == (1L, 10L, 10L, 0L))
    assert(got(1)._1 == 2L && got(1)._4 > 0L)
  }

  test("MAD audit: discrete lower median, strict 10x threshold") {
    // cents 100,200,300,400,100000 -> n=5, lower median rn=3 -> 300
    // devs 200,100,0,100,99700 -> sorted 0,100,100,200,99700; med rn=3
    // -> MAD=100; outlier iff dev > 1000: only 99700 -> 1 of 5 = 200pm
    val rows = Seq(1.0, 2.0, 3.0, 4.0, 1000.0).zipWithIndex.map {
      case (v, i) => (i.toLong, ts(i * 10L), 1L, "a", v, "{}")
    }
    val d = writeEvents(rows)
    val got = DataAudit.valueMadOutliers(spark, d)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("a", 5L, 300L, 100L, 1L, 200L)))
  }
}
