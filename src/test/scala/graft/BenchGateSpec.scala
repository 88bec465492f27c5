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

  test("retry picks the worst flags by normalized excess, bounded by " +
      "the budget") {
    val regs = Seq(("mild", 2.2, 1.0), ("worst", 9.0, 1.0),
      ("bad", 4.0, 1.0), ("ratio_worst", 5.0, 0.5))
    val picked = Bench.retryPick(regs, 2).map(_._1)
    assert(picked == Seq("ratio_worst", "worst"),
      s"10x and 9x excess outrank 4x and 2.2x: $picked")
    assert(Bench.retryPick(regs, 10).size == 4)
    assert(Bench.retryPick(Seq.empty, 8).isEmpty)
  }

  test("a retry resolves a flag only within the resolve factor, only " +
      "under a healthy ALU probe, and a failed measurement never resolves") {
    def ok(norm: Double, busyR: Double = 0.45) =
      Bench.retryResolved(norm, best = 1.0, busyRetry = busyR,
        busyBest = 0.445)
    assert(ok(1.29) && ok(1.0))
    assert(!ok(1.31))
    // resolve bar (1.3x) sits far under the 2x flag bar: a genuinely
    // regressed query re-measuring at its new speed stays flagged
    assert(!ok(1.9))
    assert(!ok(-1.0))
    // the merge-gate hole, closed for retries too: an ALU-degraded
    // retry window (busy32 inflated) shrinks the norm — a live run
    // "resolved" a 3.3 s retry against a 3.1 min through a 2.3x
    // busy32; with the busy gate the same retry stays unresolved
    assert(!ok(1.0, busyR = 0.907))
    assert(!ok(0.2, busyR = 1.2))
  }

  test("a retry window is healthy only when BOTH the ALU and bandwidth " +
      "probes pass their bars") {
    def ok(busy: Double, stream: Double) =
      Bench.retryWindowHealthy(busy, busyBest = 0.445,
        stream = stream, streamBest = 0.020)
    assert(ok(0.45, 0.021))
    assert(ok(0.50, 0.024))            // 1.12x busy, 1.20x stream
    assert(!ok(0.60, 0.020), "ALU-degraded window never healthy")
    assert(!ok(0.45, 0.030), "bandwidth-degraded window never healthy")
    assert(!ok(1.0, 0.08), "both degraded (the r11 closing window)")
  }

  test("awaitHealthyWindow: an immediately healthy pair returns " +
      "without sleeping") {
    var slept = 0L
    val (r, healthy, polls) = Bench.awaitHealthyWindow(
      () => (0.45, 0.020), busyBest = 0.445, streamBest = 0.020,
      sleep = ms => slept += ms, now = () => 0.0)
    assert(healthy && polls == 1 && slept == 0L && r == ((0.45, 0.020)))
  }

  test("awaitHealthyWindow: a window that heals mid-wait is caught and " +
      "returned") {
    // poll pairs (busy32, stream32): two sick readings, then healthy —
    // the poll deliberately carries NO sched16 (32 Spark jobs per
    // draw, multi-second on exactly the sick hosts the loop waits
    // out); the caller draws sched once after the window passes
    val readings = Iterator((1.0, 0.08), (0.60, 0.03), (0.45, 0.021))
    var clock = 0.0
    val (r, healthy, polls) = Bench.awaitHealthyWindow(
      () => readings.next(), busyBest = 0.445, streamBest = 0.020,
      sleep = ms => clock += ms / 1000.0, now = () => clock)
    assert(healthy && polls == 3, s"healthy on the third pair: $polls")
    assert(r == ((0.45, 0.021)), "the HEALTHY pair is returned")
  }

  test("awaitHealthyWindow: a host that never heals exhausts the " +
      "bounded budget and reports unhealthy — the caller's skip stamp") {
    var clock = 0.0
    var polls = 0
    val (_, healthy, drawn) = Bench.awaitHealthyWindow(
      () => { polls += 1; (1.0, 0.08) },
      busyBest = 0.445, streamBest = 0.020, maxWaitSec = 100.0,
      sleep = ms => clock += ms / 1000.0, now = () => clock)
    assert(!healthy, "never-healing host must report unhealthy")
    // 100 s budget / 20 s poll gap: first draw + 5 sleeps = 6 draws,
    // and the loop must terminate on the CLOCK, not spin forever
    assert(drawn == polls && drawn == 6, s"bounded draws, got $drawn")
    assert(clock >= 100.0, "budget actually spent before giving up")
  }

  test("the post-wait retry bracket outranks a same-moment end-of-run " +
      "probe for every retry's attribution") {
    // main records the end-of-run probe at index E and the post-wait
    // healthy bracket at E + 1 (the first retry's index): retries at
    // E+1.. must attribute to the bracket they actually ran under,
    // never to the pre-wait window that forced the wait. A bracket
    // recorded AT E would tie for early retries and nearestProbe's
    // first-minimum rule would hand them the sick window's ratios.
    val E = 560
    val endOfRun = (E, 0.080, 6.0)      // sick: the reason we waited
    val bracket = (E + 1, 0.021, 1.8)   // healthy: where retries ran
    val after = (E + 8, 0.022, 1.9)
    val ps = Seq(endOfRun, bracket, after)
    for (j <- 1 to 8) {
      val p = Bench.nearestProbe(ps, E + j)
      assert(p != endOfRun, s"retry $j attributed to the pre-wait probe")
    }
  }

  test("every updated minimum carries its recording window's busy32; " +
      "untouched minimums keep their prior stamp") {
    val raw = Map("q_old" -> 1.0, "q_drops" -> 2.0,
      "__w:q_old" -> 0.41, "__w:q_drops" -> 0.52, "__busy32_best" -> 0.40)
    // this run: q_drops improves, q_old doesn't, q_new seeds
    val merged = Map("q_old" -> 1.0, "q_drops" -> 1.7, "q_new" -> 3.0)
    val stamps = Bench.windowStamps(raw, merged, busySec = 0.43)
    assert(stamps("__w:q_drops") == 0.43, "updated min stamped with THIS window")
    assert(stamps("__w:q_new") == 0.43, "seeded min stamped too")
    assert(stamps("__w:q_old") == 0.41, "untouched min keeps its prior stamp")
    assert(!stamps.contains("__w:__busy32_best"),
      "probe keys never get window stamps")
    // the stamps round-trip the flat parser (colon in key is fine)
    val body = stamps.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    assert(Bench.parseHistory(body) == stamps)
    // and queryMins never mistakes a stamp for a query minimum
    assert(Bench.queryMins(stamps).isEmpty)
  }

  test("a run inside the history file's %.3f rounding band never " +
      "replaces a minimum's recording-window stamp") {
    // the stored file renders %.3f, so a merged 1.0006 writes back as
    // the SAME "1.001" — the minimum did not move, and the stamp (its
    // recording window's provenance, kept forever) must not move
    // either. A full-precision compare silently re-stamped exactly
    // this case.
    val raw = Map("q" -> 1.001, "__w:q" -> 0.445)
    val stamps = Bench.windowStamps(raw,
      merged = Map("q" -> 1.0006), busySec = 0.51)
    assert(stamps("__w:q") == 0.445,
      "stamp preserved when the rendered minimum is unchanged")
    // a genuine improvement past the rendering quantum DOES re-stamp
    val stamps2 = Bench.windowStamps(raw,
      merged = Map("q" -> 0.999), busySec = 0.51)
    assert(stamps2("__w:q") == 0.51)
  }

  test("history body round-trips through the flat parser") {
    val hist = Map("a_q" -> 1.234, "z.q" -> 0.007)
    val body = hist.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    assert(Bench.parseHistory(body) == hist)
  }
}
