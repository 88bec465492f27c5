package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Pins the SCD2 interval build: consecutive equal states collapse,
  * intervals tile the timeline per user, exactly one open (current)
  * interval per user, and timestamp ties break by event_id. */
class Scd2Spec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  private def build(rows: Seq[(Long, Long, java.sql.Timestamp, String)]) =
    Events.scd2IntervalsOn(rows.toDF("user_id", "event_id", "ts", "event_type"))
      .as[(Long, String, Long, Long, Option[Long], Boolean)].collect()

  test("runs of equal states collapse; intervals tile; one current") {
    // user 7: A A B B A → changes at t1 (A), t3 (B), t5 (A)
    val out = build(Seq(
      (7L, 1L, ts(10), "A"), (7L, 2L, ts(20), "A"), (7L, 3L, ts(30), "B"),
      (7L, 4L, ts(40), "B"), (7L, 5L, ts(50), "A")))
    assert(out.map(r => (r._2, r._4, r._5, r._6)).toSeq == Seq(
      ("A", 10000000L, Some(30000000L), false),
      ("B", 30000000L, Some(50000000L), false),
      ("A", 50000000L, None, true)))
    // lineage: the change row carries the FIRST event of each run
    assert(out.map(_._3).toSeq == Seq(1L, 3L, 5L))
  }

  test("timestamp ties break by event_id — deterministic total order") {
    // two events at the same instant: event 1 (A) then event 2 (B)
    val out = build(Seq((1L, 2L, ts(10), "B"), (1L, 1L, ts(10), "A")))
    assert(out.map(r => (r._2, r._6)).toSeq ==
      Seq(("A", false), ("B", true)))
    // the A interval closes at the SAME micro it opened (zero-width)
    assert(out.head._5.contains(out.head._4))
  }

  test("independent users never interleave; single-event user is current") {
    val out = build(Seq(
      (1L, 1L, ts(10), "A"),
      (2L, 2L, ts(5), "X"), (2L, 3L, ts(15), "X")))
    val byUser = out.groupBy(_._1)
    assert(byUser(1L).map(r => (r._2, r._6)).toSeq == Seq(("A", true)))
    // user 2's X-run collapsed to one current interval from t=5
    assert(byUser(2L).map(r => (r._2, r._4, r._6)).toSeq ==
      Seq(("X", 5000000L, true)))
    // exactly one current interval per user
    assert(byUser.values.forall(_.count(_._6) == 1))
  }
}
