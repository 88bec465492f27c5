package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the self-judging bench gate's pure core: calibration
  * normalization, the 2×-plus-absolute-floor trigger, new-query
  * seeding, and the compare-then-merge ordering that keeps a slow
  * run from raising its own bar. */
class BenchGateSpec extends AnyFunSuite {

  private val busy = 0.5 // this run's probe: norm = sec / 0.5

  test("2x normalized with real absolute excess flags; merge keeps " +
      "the historical min") {
    // hist min 4.0 norm = 2.0 s at this probe; current 5.0 s = 10.0
    // norm — 2.5x the min, 3 s over it
    val (regs, merged) =
      Bench.gate(Map("q" -> 4.0), Map("q" -> 5.0), busy)
    assert(regs == Seq(("q", 10.0, 4.0)))
    assert(merged("q") == 4.0, "a regressed run must not raise the bar")
  }

  test("sub-floor jitter never trips the gate even past 2x") {
    // hist min 0.4 norm = 0.2 s at this probe; current 0.55 s = 1.1
    // norm — 2.75x the min but only (1.1 − 0.4)·0.5 = 0.35 s of
    // absolute excess, under the 0.5 s floor
    val (regs, _) = Bench.gate(Map("q" -> 0.4), Map("q" -> 0.55), busy)
    assert(regs.isEmpty, "0.35 s of excess is under the 0.5 s floor")
  }

  test("under 2x is never a regression regardless of magnitude") {
    // hist 20.0 norm = 10 s; current 19 s = 38 norm -> 1.9x, 9 s over
    val (regs, _) = Bench.gate(Map("q" -> 20.0), Map("q" -> 19.0), busy)
    assert(regs.isEmpty)
  }

  test("a query new to the history seeds it and cannot regress") {
    val (regs, merged) =
      Bench.gate(Map("old" -> 1.0), Map("old" -> 0.4, "new" -> 9.0), busy)
    assert(regs.isEmpty)
    assert(merged("new") == 18.0) // 9.0 s / 0.5 probe
    assert(merged("old") == 0.8, "a faster run lowers the bar")
  }

  test("host-speed invariance: the same slowdown measured on a 2x " +
      "slower host flags identically") {
    val fastHost = Bench.gate(Map("q" -> 4.0), Map("q" -> 5.0), 0.5)
    val slowHost = Bench.gate(Map("q" -> 4.0), Map("q" -> 10.0), 1.0)
    assert(fastHost._1.map(r => (r._1, r._2)) ==
      slowHost._1.map(r => (r._1, r._2)))
  }

  test("a query missing from this run keeps its historical min") {
    val (_, merged) = Bench.gate(Map("gone" -> 3.0), Map.empty, busy)
    assert(merged("gone") == 3.0)
  }

  test("reserved probe keys never act as query minimums") {
    // the history file carries __busy32_best/__stream32_best next to
    // the query mins; a run of a (hypothetical) query named like a
    // probe key must not compare against the probe reading
    val raw = Map("q" -> 4.0, Bench.BusyBestKey -> 0.45,
      Bench.StreamBestKey -> 0.020)
    val mins = Bench.queryMins(raw)
    assert(mins == Map("q" -> 4.0))
    val (regs, merged) = Bench.gate(mins, Map("q" -> 5.0), busy)
    assert(regs.map(_._1) == Seq("q"))
    assert(!merged.contains(Bench.BusyBestKey),
      "gate merge operates on query mins only; probes re-attach in main")
  }

  test("nearest probe picks the reading closest in execution order, " +
      "earlier on ties") {
    val ps = Seq((1, 0.020, 1.7), (33, 0.040, 2.0), (65, 0.021, 1.8))
    assert(Bench.nearestProbe(ps, 2) == ps(0))
    assert(Bench.nearestProbe(ps, 30) == ps(1))
    assert(Bench.nearestProbe(ps, 49) == ps(1), "tie resolves earlier")
    assert(Bench.nearestProbe(ps, 64) == ps(2))
    assert(Bench.nearestProbe(ps, 500) == ps(2))
  }

  test("mins merge only from runs whose ALU calibration is healthy") {
    // norm = raw / busy32: an ALU-degraded run (busy32 inflated)
    // shrinks the norm of every non-ALU-bound query, so folding its
    // norms into the history would record unachievable minimums
    assert(Bench.mergeAllowed(busySec = 0.45, busyBest = 0.445))
    assert(Bench.mergeAllowed(busySec = 0.50, busyBest = 0.445))
    assert(!Bench.mergeAllowed(busySec = 0.60, busyBest = 0.445))
    assert(!Bench.mergeAllowed(busySec = 1.17, busyBest = 0.445))
    // first-ever run: best == this run, always merges (seeds history)
    assert(Bench.mergeAllowed(busySec = 0.80, busyBest = 0.80))
  }

  test("history body round-trips through the flat parser") {
    val hist = Map("a_q" -> 1.234, "z.q" -> 0.007)
    val body = hist.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    assert(Bench.parseHistory(body) == hist)
  }
}
