package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Pins ev_gap_fill_linear's arithmetic on a planted series: interior
  * gaps take the exact integer-cents straight line (including a
  * truncating-division case), boundary days never extrapolate, and
  * observed days pass through untouched. */
class GapFillSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("interior gaps interpolate in cents; edges stay null") {
    val dir = java.nio.file.Files.createTempDirectory("gf").toString
    // user 0 (% 10 == 0 → sampled): purchases on day 1 (10.00) and
    // day 4 (16.00) of a 0..5 day range (bounds set by user 3's rows
    // — unsampled, so it shapes the spine only via min/max ts).
    def ts(day: Int) = new java.sql.Timestamp(day * 86400000L + 3600000L)
    val rows = Seq(
      (1L, ts(1), 0L, "purchase", 10.00, "{}"),
      (2L, ts(4), 0L, "purchase", 16.00, "{}"),
      (3L, ts(0), 3L, "view", 1.0, "{}"),
      (4L, ts(5), 3L, "view", 1.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Events.gapFillLinear(spark, dir)
      .as[(Long, Long, Option[Long], Option[Long], Boolean)].collect()
      .filter(_._1 == 0L).sortBy(_._2).toSeq
    // days 0..5; observed 1000c@1, 1600c@4; line: day2=1200, day3=1400
    assert(got.map(t => (t._2, t._4, t._5)) == Seq(
      (0L, None, false),          // before first obs: no extrapolation
      (1L, Some(1000L), false),
      (2L, Some(1200L), true),
      (3L, Some(1400L), true),
      (4L, Some(1600L), false),
      (5L, None, false)))         // after last obs
  }

  test("truncating division matches both engines' semantics") {
    val dir = java.nio.file.Files.createTempDirectory("gf2").toString
    // 10.00 on day 0, 10.01 on day 3: delta 1c over 3 days →
    // day1 = 1000 + (1*1)/3 = 1000, day2 = 1000 + (1*2)/3 = 1000
    def ts(day: Int) = new java.sql.Timestamp(day * 86400000L)
    Seq(
      (1L, ts(0), 0L, "purchase", 10.00, "{}"),
      (2L, ts(3), 0L, "purchase", 10.01, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Events.gapFillLinear(spark, dir)
      .as[(Long, Long, Option[Long], Option[Long], Boolean)].collect()
      .sortBy(_._2).toSeq
    assert(got.map(_._4) == Seq(
      Some(1000L), Some(1000L), Some(1000L), Some(1001L)))
  }
}
