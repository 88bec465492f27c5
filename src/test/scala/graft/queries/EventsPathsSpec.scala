package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Pins ev_top_paths' session-boundary semantics: BOTH hops must be
  * strictly under the 30-minute gap (the same µs-exact, gap-EXCLUSIVE
  * boundary sessionize pins), and the (n DESC, types ASC) rank is a
  * total order. */
class EventsPathsSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  test("both hops inside the gap; an exactly-30-min hop breaks the path") {
    val dir = java.nio.file.Files.createTempDirectory("paths").toString
    Seq(
      // user 1: a→b→c tight path, then EXACTLY 30 min to d: the
      // (b,c,d) and (c,d,*) paths must not form across the boundary
      (1L, ts(0), 1L, "a", 0.0, "{}"),
      (2L, ts(10), 1L, "b", 0.0, "{}"),
      (3L, ts(20), 1L, "c", 0.0, "{}"),
      (4L, ts(20 + 1800), 1L, "d", 0.0, "{}"),
      // user 2: the same a→b→c, twice the weight for the rank check
      (5L, ts(0), 2L, "a", 0.0, "{}"),
      (6L, ts(5), 2L, "b", 0.0, "{}"),
      (7L, ts(9), 2L, "c", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Events.topPaths(spark, dir)
      .as[(String, String, String, Long)].collect().toSeq
    assert(got == Seq(("a", "b", "c", 2L)))
  }

  test("seasonal anomaly: the one off-pattern (day, hour) cell is " +
      "flagged within its own hour-of-day population, flat hours not") {
    // 12 days: hour 3 carries 1 event/day except day 11 (2 events);
    // hour 5 carries exactly 1 every day. For a single deviant among
    // n-1 equals the integer 3-sigma test reduces to n-1 > 9, so with
    // n=12 the day-11 cell flags and the flat hour never can.
    val day = 86400L
    val rows = (0 until 12).flatMap { dd =>
      val base = Seq(
        (1000L + dd, ts(dd * day + 3 * 3600L), dd.toLong, "view", 0.0, "{}"),
        (2000L + dd, ts(dd * day + 5 * 3600L), dd.toLong, "view", 0.0, "{}"))
      if (dd == 11)
        base :+ (3000L, ts(11 * day + 3 * 3600L + 60), 11L, "view", 0.0, "{}")
      else base
    }
    val dir = java.nio.file.Files.createTempDirectory("sa").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Events.seasonalAnomaly(spark, dir)
      .as[(Long, Long, Long, Long, Option[Long], Option[Long])]
      .collect().toSeq
    assert(got == Seq(
      (3L, 12L, 1L, 1L, Some(11L), Some(11L)),
      (5L, 12L, 1L, 0L, None, None)))
  }
}
