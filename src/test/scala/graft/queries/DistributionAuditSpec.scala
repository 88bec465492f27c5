package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Pins the distribution-audit semantics on planted fixtures: the KS
  * midpoint split and permille CDF gap, the single-half degenerate
  * guard, and Benford's exact string-derived leading digit. */
class DistributionAuditSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  private def writeEvents(
      rows: Seq[(Long, java.sql.Timestamp, Long, String, Double, String)])
      : String = {
    val dir = java.nio.file.Files.createTempDirectory("da").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("ks drift: identical halves score 0; a full shift scores 1000") {
    val day1 = 86400L
    val d = writeEvents(Seq(
      // type x: same values both days → ks 0
      (1L, ts(10), 1L, "x", 1.00, "{}"),
      (2L, ts(20), 1L, "x", 2.00, "{}"),
      (3L, ts(day1 + 10), 1L, "x", 1.00, "{}"),
      (4L, ts(day1 + 20), 1L, "x", 2.00, "{}"),
      // type y: all mass moves from cents=100 to cents=200 → ks 1000
      (5L, ts(30), 1L, "y", 1.00, "{}"),
      (6L, ts(40), 1L, "y", 1.00, "{}"),
      (7L, ts(day1 + 30), 1L, "y", 2.00, "{}"),
      (8L, ts(day1 + 40), 1L, "y", 2.00, "{}")))
    val got = DistributionAudit.ksDrift(spark, d)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("x", 2L, 2L, 0L), ("y", 2L, 2L, 1000L)))
  }

  test("ks drift: a single-day corpus (empty first half) reports 0, " +
      "not a division error") {
    val d = writeEvents(Seq(
      (1L, ts(10), 1L, "x", 1.00, "{}"),
      (2L, ts(20), 1L, "x", 2.00, "{}")))
    // one day: mid = d0 + 0 → nothing earlier than mid, half a empty
    val got = DistributionAudit.ksDrift(spark, d)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("x", 0L, 2L, 0L)))
  }

  test("benford: leading digit comes from the exact cents string") {
    val d = writeEvents(Seq(
      (1L, ts(10), 1L, "x", 1.00, "{}"),   // cents 100 → digit 1
      (2L, ts(20), 1L, "x", 1.27, "{}"),   // cents 127 → digit 1
      (3L, ts(30), 1L, "x", 10.00, "{}"),  // cents 1000 → digit 1
      (4L, ts(40), 1L, "x", 0.25, "{}")))  // cents 25 → digit 2
    val got = DistributionAudit.benfordDigits(spark, d)
      .as[(Int, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1, 3L, 750L, 301L, 449L),
      (2, 1L, 250L, 176L, 74L)))
  }
}
