package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Pins the mergeable base-2 quantile sketch: exact answers where
  * buckets are singletons (cents < 32 → shift 0), the containment +
  * 1/16-width guarantees on large values, and day-split invariance
  * (merging per-day sketches must equal sketching the union — the
  * abelian-state property the whole design rests on). */
class QuantileSketchSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def run(rows: Seq[(Long, Long)]): Map[Long, (Long, Long, Long, Long)] =
    ProductAnalytics.sketchQuantileMergeOn(rows.toDF("day_idx", "c"))
      .as[(Long, Long, Long, Long, Long)].collect()
      .map { case (q, lo, hi, n, b) => q -> (lo, hi, n, b) }.toMap

  test("cents < 32: every bucket is a singleton, quantiles are exact " +
      "ceiling order statistics") {
    // 1..20 cents, one per row: p50 target = ceil(20*0.5) = 10th value
    val got = run((1L to 20L).map(c => (c % 3, c)))
    assert(got(500L) == ((10L, 10L, 20L, 20L)))
    assert(got(900L) == ((18L, 18L, 20L, 20L)))
    assert(got(950L) == ((19L, 19L, 20L, 20L)))
    assert(got(990L) == ((20L, 20L, 20L, 20L)))
  }

  test("large values: the true order statistic lies inside the " +
      "answering bucket and the bucket is <= 1/16 relative width") {
    val vals = Seq.tabulate(1000)(i => 1000L + 37L * i) // up to ~38k cents
    val got = run(vals.zipWithIndex.map { case (c, i) => (i.toLong % 30, c) })
    val sorted = vals.sorted
    for (q <- Seq(500L, 900L, 950L, 990L)) {
      val (lo, hi, n, _) = got(q)
      assert(n == 1000L)
      val exact = sorted(((1000 * q + 999) / 1000).toInt - 1)
      assert(lo <= exact && exact <= hi, s"q=$q: $exact not in [$lo,$hi]")
      assert((hi - lo) * 16L <= lo, s"q=$q: bucket wider than 1/16")
    }
  }

  test("day-split invariance: per-day sketches merged == one-shot " +
      "sketch of the union") {
    val vals = Seq.tabulate(500)(i => (i.toLong * 13) % 40000 + 1)
    val oneDay = run(vals.map(c => (0L, c)))
    val manyDays = run(vals.zipWithIndex.map { case (c, i) => (i.toLong % 25, c) })
    assert(oneDay == manyDays)
  }

  test("zero cents land in the (0,0) singleton bucket") {
    val got = run(Seq((0L, 0L), (0L, 0L), (0L, 0L), (0L, 5L)))
    // p50 target = 2nd value = 0; p99 target = 4th = 5
    assert(got(500L)._1 == 0L && got(500L)._2 == 0L)
    assert(got(990L)._1 == 5L && got(990L)._2 == 5L)
  }
}
