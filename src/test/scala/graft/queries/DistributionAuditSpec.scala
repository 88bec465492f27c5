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

  test("psi drift: identical halves score 0; disjoint supports use " +
      "no bins (finite-PSI convention); an overlapping shift is " +
      "positive and matches the hand formula") {
    val day1 = 86400L
    val d = writeEvents(Seq(
      // type x: same multiset both days → every shared bin equal → 0
      (1L, ts(10), 1L, "x", 1.00, "{}"),
      (2L, ts(20), 1L, "x", 2.00, "{}"),
      (3L, ts(day1 + 10), 1L, "x", 1.00, "{}"),
      (4L, ts(day1 + 20), 1L, "x", 2.00, "{}"),
      // type y: halves live in DISJOINT bins → no bin counted on
      // both sides → n_bins_used 0, psi 0 by the finite convention
      (5L, ts(30), 1L, "y", 0.01, "{}"),
      (6L, ts(day1 + 30), 1L, "y", 2.00, "{}"),
      // type z: 3:1 vs 1:3 across the two extreme bins
      (7L, ts(40), 1L, "z", 0.01, "{}"),
      (8L, ts(50), 1L, "z", 0.01, "{}"),
      (9L, ts(60), 1L, "z", 0.01, "{}"),
      (10L, ts(70), 1L, "z", 2.00, "{}"),
      (11L, ts(day1 + 40), 1L, "z", 0.01, "{}"),
      (12L, ts(day1 + 50), 1L, "z", 2.00, "{}"),
      (13L, ts(day1 + 60), 1L, "z", 2.00, "{}"),
      (14L, ts(day1 + 70), 1L, "z", 2.00, "{}")))
    val got = DistributionAudit.psiDrift(spark, d)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
      .map(r => r._1 -> r).toMap
    assert(got("x") == (("x", 2L, 2L, 2L, 0L)))
    assert(got("y") == (("y", 1L, 1L, 0L, 0L)))
    // z: shares 750000/250000 flip across the two bins; hand formula:
    // Σ (sa−sb)·(⌊ln(sa)e6⌋−⌊ln(sb)e6⌋) DIV 1e6 over both bins
    def flog(x: Long) = math.floor(math.log(x.toDouble) * 1e6).toLong
    // both bins contribute the SAME term by symmetry of the flip
    val term = (750000L - 250000L) * (flog(750000L) - flog(250000L))
    val psi = (term * 2) / 1000000L
    assert(got("z")._4 == 2L && got("z")._5 == psi && psi > 0L)
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
