package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, forcing full plan execution through the noop
  * sink (no driver-side collect, no count()-only column pruning).
  * A warm-up pass (q1) absorbs JVM/codegen startup so per-query times
  * reflect steady state. Prints exactly one JSON metric line. */
object Bench {

  /** Minimal flat-JSON parse of the machine-written history file
    * ("name":num pairs) — no json lib in the dependency budget. */
  private[graft] def parseHistory(txt: String): Map[String, Double] =
    """"([^"]+)":([0-9.]+)""".r.findAllMatchIn(txt)
      .map(m => m.group(1) -> m.group(2).toDouble).toMap

  // Reserved history keys (never query names — the "__" prefix keeps
  // them out of the gate's per-query minimums): the best (lowest)
  // probe readings ever recorded, i.e. the healthiest host observed.
  // A regression entry's probe RATIOS (this run / best recorded) make
  // a flag on a degraded host machine-readably distinguishable from a
  // code regression — the round-9 LPA/kcore flags took a manual
  // forensic pass (git diff + probe archaeology) to attribute; now
  // the artifact carries the attribution itself.
  private[graft] val BusyBestKey = "__busy32_best"
  private[graft] val StreamBestKey = "__stream32_best"
  private[graft] val SchedBestKey = "__sched16_best"

  /** Query-only view of the raw history (probe keys excluded) — the
    * gate must never treat a probe minimum as a query minimum. */
  private[graft] def queryMins(hist: Map[String, Double]): Map[String, Double] =
    hist.filterNot(_._1.startsWith("__"))

  /** Recording-window stamps: every time a query's minimum UPDATES,
    * the history also records `__w:<name>` = the busy32 of the run
    * that recorded it. Round-11's retroactive audit found four
    * poisoned minimums whose recording windows were unknowable after
    * the fact (the pre-gate history kept no provenance); the stamp
    * makes every future minimum auditable — a recorded min whose
    * window busy32 was degraded is machine-findable, forever.
    * Carries prior stamps for untouched minimums; pure so
    * BenchGateSpec can pin it.
    *
    * Comparison is at the history file's own %.3f precision: the
    * stored minimum only changes when its RENDERED value changes, so
    * the stamp must use the same quantum — a full-precision compare
    * let a run landing 0.0004 under the stored min replace the
    * recording-window provenance of a minimum that did not move. */
  private[graft] val WindowKeyPrefix = "__w:"
  private[graft] def quant3(v: Double): Double = math.rint(v * 1000) / 1000
  private[graft] def windowStamps(raw: Map[String, Double],
      merged: Map[String, Double], busySec: Double): Map[String, Double] = {
    val prior = queryMins(raw)
    raw.filter(_._1.startsWith(WindowKeyPrefix)) ++
      merged.collect {
        case (n, v) if quant3(v) < quant3(prior.getOrElse(n, Double.MaxValue)) =>
          (WindowKeyPrefix + n) -> busySec
      }
  }

  /** A run's normalized times may only FOLD INTO the history when its
    * ALU calibration is near the recorded best: norm = raw / busy32,
    * so on an ALU-degraded host (busy32 inflated) every query that is
    * NOT ALU-bound gets an artificially SHRUNKEN norm — four poisoned
    * minimums (sketch_daily_merge's recorded 0.816 implies a 0.36 s
    * raw never observed on any healthy run) entered the history
    * exactly this way and then flagged every healthy run as a 2×
    * "regression". Comparison still happens on degraded runs (with
    * per-window probe attribution); only the MERGE is gated. */
  private[graft] def mergeAllowed(busySec: Double, busyBest: Double): Boolean =
    busySec <= 1.15 * busyBest

  /** The probe reading closest in execution order to execution `i` —
    * pure so the spec can pin it. Entries are (execIdx, stream32_sec,
    * sched16_sec); ties resolve to the earlier probe (minBy keeps the
    * first minimum). */
  private[graft] def nearestProbe(probes: Seq[(Int, Double, Double)],
      i: Int): (Int, Double, Double) =
    probes.minBy(p => math.abs(p._1 - i))

  /** Retry selection: the worst flagged queries by normalized
    * excess over their minimum — pure so the spec can pin it. */
  private[graft] def retryPick(regs: Seq[(String, Double, Double)],
      n: Int): Seq[(String, Double, Double)] =
    regs.sortBy { case (_, cur, best) => -(cur / best) }.take(n)

  /** A flag is RESOLVED by its retry when the re-measured normalized
    * time sits within [[RetryResolveFactor]] of the historical min —
    * AND the retry window's own ALU probe is healthy ([[mergeAllowed]]
    * vs the recorded best). The second condition closes the same hole
    * the merge gate closed: norm = raw / busy32, so a retry measured
    * on an ALU-degraded host gets an artificially SHRUNKEN norm and
    * would falsely resolve (observed live: a 3.3 s retry normalized
    * by a 2.3×-inflated busy32 read 3.5 "norm" against a 3.1 min).
    * Well under the 2× flag threshold, so a genuinely regressed query
    * cannot slip through on retry jitter. */
  private[graft] val RetryResolveFactor = 1.3
  private[graft] def retryResolved(retryNorm: Double, best: Double,
      busyRetry: Double, busyBest: Double): Boolean =
    retryNorm >= 0 && retryNorm <= best * RetryResolveFactor &&
      mergeAllowed(busyRetry, busyBest)

  /** A retry WINDOW is healthy when both the ALU probe (merge-gate
    * bar, 1.15× best) and the memory-bandwidth probe pass — stream32
    * gets a slightly looser 1.25× because its healthy-host readings
    * jitter more than busy32's (observed across the r9–r11 probe
    * series), while its degraded readings sit at 2–4×, far outside
    * either bar. Retrying inside a sick window can neither resolve a
    * flag (retryResolved's busy gate) nor measure anything meaningful,
    * so the run should wait for health instead. */
  private[graft] val StreamHealthyFactor = 1.25
  private[graft] def retryWindowHealthy(busy: Double, busyBest: Double,
      stream: Double, streamBest: Double): Boolean =
    mergeAllowed(busy, busyBest) && stream <= StreamHealthyFactor * streamBest

  /** Bounded wait for a healthy probe bracket before the flag-retry
    * pass (round-11 verdict #1: BENCH_r11 closed with 8 unresolved
    * retries because the end-of-run window itself was sick — the
    * busy gate correctly refused to resolve, but the design then left
    * the artifact dirty on exactly the hosts that need cleaning).
    * Draws (busy32, stream32) pairs from `probe` — ONLY the two
    * readings the health predicate uses; sched16 costs 32 Spark jobs
    * per draw (multi-second on exactly the degraded hosts this loop
    * exists for) and is drawn once by the caller AFTER the window
    * passes, for the recorded bracket — sleeping [[RetryPollGapSec]]
    * between draws, until a pair passes [[retryWindowHealthy]] or
    * `maxWaitSec` of wall clock is spent. Returns (last pair,
    * healthy?, pairs drawn). Pure in the injected clock/sleep so
    * BenchGateSpec can pin both paths; the caller stamps
    * `retry_skipped_unhealthy` when health never arrives, making an
    * unclean artifact SAY SO machine-readably. */
  private[graft] val RetryWaitMaxSec = 600.0
  private[graft] val RetryPollGapSec = 20.0
  private[graft] def awaitHealthyWindow(
      probe: () => (Double, Double),
      busyBest: Double, streamBest: Double,
      maxWaitSec: Double = RetryWaitMaxSec,
      sleep: Long => Unit = Thread.sleep,
      now: () => Double = () => System.nanoTime / 1e9)
      : ((Double, Double), Boolean, Int) = {
    val t0 = now()
    var r = probe()
    var polls = 1
    while (!retryWindowHealthy(r._1, busyBest, r._2, streamBest) &&
        now() - t0 < maxWaitSec) {
      sleep((RetryPollGapSec * 1000).toLong)
      r = probe()
      polls += 1
    }
    (r, retryWindowHealthy(r._1, busyBest, r._2, streamBest), polls)
  }

  /** The self-judging core, pure so BenchGateSpec can pin it: given
    * the persisted per-query NORMALIZED minimums (sec / busy32_sec —
    * unitless multiples of the calibration probe's fixed CPU work,
    * which cancels host speed), this run's raw timings, and this
    * run's probe, returns (regressions, merged history).
    *
    * A query regresses when its normalized time exceeds 2× its
    * historical min AND the excess is over 0.5 raw seconds (the
    * absolute floor that keeps sub-second jitter out of the gate).
    * Queries absent from the history (new this round) cannot regress
    * — they seed the history instead. Minimums merge AFTER the
    * comparison, so a slow run never raises its own bar, and a fast
    * run lowers it for every future round. */
  private[graft] def gate(hist: Map[String, Double],
      timings: Map[String, Double], busySec: Double)
      : (Seq[(String, Double, Double)], Map[String, Double]) = {
    val norms = timings.map { case (n, v) => n -> v / busySec }
    val regs = norms.toSeq.collect {
      case (n, norm) if hist.contains(n) && norm > 2.0 * hist(n) &&
          (norm - hist(n)) * busySec > 0.5 =>
        (n, norm, hist(n))
    }.sortBy(-_._2)
    val merged = (hist.keySet ++ norms.keySet).map { n =>
      n -> math.min(hist.getOrElse(n, Double.MaxValue),
        norms.getOrElse(n, Double.MaxValue))
    }.toMap
    (regs, merged)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Session.build("graft-bench")
    // Interleaved host-health probes (full-surface runs only): rounds
    // 9/10 proved start/end probe brackets are blind to MID-RUN host
    // swings — a run with healthy start probes flagged 59 queries
    // because the host degraded after the probes ran, and attribution
    // took standalone re-runs. A stream32+sched16 reading every
    // ProbeEvery executions (outside every timed window) gives each
    // regression entry a nearest-in-time probe ratio, so a flag is
    // host-attributable at QUERY granularity from the artifact alone.
    // ~18 probes over ~560 executions ≈ under a minute of untimed
    // wall — busy32 stays start/end-only (it is the normalization
    // anchor; its history units must not mix mid-run readings).
    val ProbeEvery = 32
    val interleave = args.isEmpty
    var execCount = 0
    val probes =
      scala.collection.mutable.ArrayBuffer[(Int, Double, Double)]()
    // Host-calibration probe: cross-round totals are host-dominated
    // (a mid-round reboot once rescaled every query ~1.6x on identical
    // code — BASELINE.md), so the artifact carries a fixed-work CPU
    // number future rounds can normalize by. 32 threads of a pinned
    // xorshift64 loop — pure integer ALU, no allocation, no memory
    // traffic — measures delivered parallel throughput; min of two
    // runs after a JIT warm pass. Measured 0.45 s on this host when
    // healthy (round 8); effective-core loss shows up as a
    // proportional increase.
    // AtomicLong sink: exists only to defeat DCE, but an earlier
    // @volatile-on-a-local spelling was a silent no-op (locals caught
    // in closures become plain ObjectRefs) — the atomic makes the
    // cross-thread accumulation actually well-defined at identical
    // cost outside the timed loop (one addAndGet per thread).
    // (implementations extracted to graft.Probes so the scaling tools
    // share them; the rationale comments above/below still govern)
    def busyProbe(): Double = Probes.busy32()
    // Memory-bandwidth probe: busy32 is pure register ALU and CANNOT
    // see memory-subsystem degradation — observed in-round as the
    // checkpoint/shuffle-heavy query family running 1.2–2× its
    // normalized min while busy32 read healthy (a noisy-neighbor /
    // bandwidth squeeze, the post-reboot pattern of BASELINE.md with
    // a probe blind spot). 32 threads each stream-sum a disjoint
    // 16 MiB slice of one shared 512 MiB long array, 4 sweeps —
    // pure sequential loads, no ALU pressure — so future rounds can
    // attribute THIS class of host swing too. Attribution-only: the
    // regression gate stays keyed on busy32 (its history is in
    // busy32 units; mixing probes would corrupt the recorded mins).
    // The 512 MiB buffer lives only inside this block: as a
    // method-local it would stay strongly reachable for the whole
    // benchmark (main never returns until the end), pinning half a
    // gigabyte of driver heap through every timed query (ADVICE r9).
    def measureStream(): Double = Probes.stream32()
    // Scheduler/barrier probe: busy32 (ALU) and stream32 (bandwidth)
    // both read healthy on a host where every MULTI-STAGE query sat at
    // 2-2.7x its min while single-stage q1 sat AT its min — the
    // remaining blind spot is the per-job round-trip (driver schedule
    // -> task launch -> barrier), which is what many-short-stage
    // queries (TPC-H join chains, the iterative graph family, the
    // 11-barrier pipeline) actually multiply by. 16 two-task count
    // jobs, min of two batches; only CALLED after the q1 warm-up so
    // codegen/session startup never pollutes it. Healthy local[32]:
    // ~0.2-0.4 s.
    def schedProbe(): Double = Probes.sched16(spark)
    def exec(name: String): Double = {
      val t0 = System.nanoTime()
      val ok =
        try {
          SparkEntry.queries(name)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
          true
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          false
        }
      val dt = (System.nanoTime() - t0) / 1e9
      // between executions (outside the timed window): drop any cached
      // table AND free every Materialize-tracked block synchronously.
      // A BARE System.gc() here was once worse than useless — the full
      // GC only ENQUEUES the ContextCleaner's async block removal,
      // which then landed inside the NEXT query's timed window
      // (observed as a uniform ~20% run inflation). But with NO nudge,
      // ~230 executions' broadcast exchanges and codegen'd plans pile
      // up un-collected in the shared 8 GiB heap, and allocation-heavy
      // late-alphabet queries go GC-bound (scalar_array_functions
      // 1.7 s isolated vs 4.2 s in-suite). The fix is gc PLUS a drain
      // pause so the cleaner's removals also land before the next t0.
      spark.catalog.clearCache()
      graft.operators.Materialize.freeAll(spark)
      System.gc()
      Thread.sleep(250)
      execCount += 1
      if (interleave && execCount % ProbeEvery == 0)
        probes += ((execCount, measureStream(), schedProbe()))
      if (ok) dt else -1.0
    }
    Probes.warm() // JIT warm
    val busySec = math.min(busyProbe(), busyProbe())
    val streamSec = measureStream()
    System.gc() // the probe buffer is unreachable now — free it before q1
    exec("q1_pricing_summary") // warm-up: JVM, codegen, file index
    val schedSec = math.min(schedProbe(), schedProbe())
    probes += ((execCount, streamSec, schedSec)) // start-of-run reading
    // two passes, report min: first execution of a query shape pays
    // one-time janino codegen (~1-5 s) that is irrelevant at scale.
    // Optional args: query names for single-query A/B timing (the
    // driver always runs the full surface with no args).
    val names =
      if (args.nonEmpty) args.toSeq.sorted
      else SparkEntry.queries.keys.toSeq.sorted
    // per-execution indices: the gate stamps each regression with the
    // probe reading nearest the pass that produced the judged (min)
    // time, so the attribution matches the window that was measured
    val idx1 = scala.collection.mutable.Map[String, Int]()
    val idx2 = scala.collection.mutable.Map[String, Int]()
    val pass1 = names.map { n =>
      val t = exec(n); idx1(n) = execCount; n -> t
    }.toMap
    val pass2 = scala.collection.mutable.Map[String, Double]()
    val results = names.map { n =>
      val t2 = exec(n)
      idx2(n) = execCount
      pass2(n) = t2
      // args mode: per-pass times to stderr — pass 1 is the cold side
      // (session-shared scans build), pass 2 the pinned side, so one
      // invocation IS a same-host-minute cold/shared A/B per query
      if (args.nonEmpty)
        System.err.println(f"[bench] $n pass1=${pass1(n)}%.3f pass2=$t2%.3f")
      n -> (if (t2 < 0 || pass1(n) < 0) -1.0 else math.min(pass1(n), t2))
    }
    // millisecond precision: full-double rendering made the line long
    // enough that the driver's stdout tail truncated ~17 of 78 query
    // timings out of the round artifact (ADVICE r3)
    def fmt(v: Double): String =
      if (v < 0) "-1"
      // Locale.ROOT: a comma-decimal default locale would emit "1,234"
      // and corrupt the JSON artifact this line exists to protect
      else String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    // ---- self-judging regression gate (full-surface runs only) ----
    // Three rounds of verdicts did this forensics by hand: raw totals
    // swing with host health (a mid-round reboot once rescaled every
    // query ~1.6x), so cross-round comparison needs the calibration
    // probe. The artifact now carries its own verdict: per-query
    // times are normalized by busy32 (sec / busy32_sec — a unitless
    // "multiples of fixed-CPU-work" ratio that cancels host speed),
    // compared against a persisted per-query normalized minimum
    // (bench_history.json, committed to the repo so it survives
    // rounds), and any query >2x its historical min — with an
    // absolute floor of 0.5 s so sub-second jitter can't trip the
    // gate — lands in a `regressions` array in the JSON line. New
    // minimums fold back into the history AFTER the comparison, so a
    // regressed run never raises its own bar.
    // sf-scoped: the history's minimums are sf0.1 numbers (the
    // driver's per-round surface), so the gate only engages there — a
    // local full-surface run at sf0.001 must not fold its tiny
    // timings into the minimums and then flag every future official
    // run as a 50x "regression"
    // END-of-run probe trio, measured BEFORE the gate so the probe
    // series the gate stamps from includes the closing window:
    // start-only probes proved blind to MID-RUN host swings (round
    // 10: a run with healthy start probes flagged 59 queries — the
    // host degraded after the probes ran). Start + interleaved + end
    // readings cover the whole run.
    val busyEnd = math.min(busyProbe(), busyProbe())
    val streamEnd = measureStream()
    val schedEnd = math.min(schedProbe(), schedProbe())
    probes += ((execCount, streamEnd, schedEnd))
    val histFile = java.nio.file.Paths.get("bench_history.json")
    // probe ratios: a probe reading / best (lowest) recorded reading.
    // ~1.0 on a healthy host; >1 quantifies degradation — busy32 for
    // ALU, stream32 for memory bandwidth (the round-9 blind spot:
    // checkpoint-heavy queries flagged on a host whose ALU probe read
    // healthy but whose bandwidth probe was 2.8x degraded), sched16
    // for driver-scheduling round-trips (the round-10 blind spot).
    // Each regression entry is stamped with the stream/sched reading
    // NEAREST IN EXECUTION ORDER to the pass the gate judged, so a
    // flag carries its own window's host state, not the run average.
    val (regressions, busyRatio, streamBest, schedBest) =
      if (args.nonEmpty || busySec <= 0 || !sfDir.endsWith("sf0.1"))
        (Seq.empty[(String, Double, Double)], 1.0, 1.0, 1.0)
      else {
        val raw: Map[String, Double] =
          if (java.nio.file.Files.exists(histFile))
            parseHistory(java.nio.file.Files.readString(histFile))
          else Map.empty
        val timings = results.collect { case (n, v) if v >= 0 => n -> v }.toMap
        val (regs, gateMerged) = gate(queryMins(raw), timings, busySec)
        val busyRun = math.min(busySec, busyEnd)
        val busyBest = math.min(raw.getOrElse(BusyBestKey, busyRun), busyRun)
        // degraded-ALU runs compare but never merge (see mergeAllowed)
        val merged =
          if (mergeAllowed(busySec, busyBest)) gateMerged else queryMins(raw)
        val streamRun = probes.map(_._2).min
        val streamB =
          math.min(raw.getOrElse(StreamBestKey, streamRun), streamRun)
        val schedRun = probes.map(_._3).min
        val schedB = math.min(raw.getOrElse(SchedBestKey, schedRun), schedRun)
        val withProbes = merged ++ windowStamps(raw, merged, busySec) +
          (BusyBestKey -> busyBest) +
          (StreamBestKey -> streamB) + (SchedBestKey -> schedB)
        val body = withProbes.toSeq.sortBy(_._1)
          .map { case (k, v) => "\"" + k + "\":" + fmt(v) }
          .mkString("{", ",", "}")
        try java.nio.file.Files.writeString(histFile, body + "\n")
        catch { case e: Throwable =>
          System.err.println(s"[bench] history write failed: ${e.getMessage}")
        }
        (regs, busySec / busyBest, streamB, schedB)
      }
    // ---- flag-retry pass (the completion of the probe-bracket arc:
    // r9 start probes → r10 end probes → r11 interleaved windows →
    // now SELF-RESOLUTION). Three rounds of closing runs have carried
    // host-window-attributed flags that only a later manual re-run
    // could clear; instead, the run itself re-measures its worst
    // flags at the end under a fresh probe bracket. A retry landing
    // within RetryResolveFactor (1.3×) of the historical min — far
    // under the 2× flag bar — proves the original reading was the
    // window: the entry moves from `regressions` to `retried` with
    // resolved=true (nothing hidden: original norm, retry norm, and
    // the retry window's own probe ratios all ship in the artifact).
    // Retries never fold into the history minimums — one merge path
    // (the gated one above) keeps the poisoning analysis simple.
    val retryBudget = 8
    // busyBest reconstructed from the gate's ratio (busyRatio =
    // busySec / busyBest); <= 0 means the gate didn't run
    val busyBestKnown = if (busyRatio > 0) busySec / busyRatio else -1.0
    // Bounded wait for a HEALTHY retry window (see awaitHealthyWindow):
    // a retry bracket read inside a sick window can't resolve anything,
    // so poll the cheap probes (≤10 min) until busy32+stream32 pass;
    // if health never arrives, skip the retries and stamp the artifact
    // retry_skipped_unhealthy so its dirt is self-describing.
    val (retried, busyRetry, retryWaitPolls, retrySkippedUnhealthy)
        : (Seq[(String, Double, Double, Double, Double, Int)], Double, Int,
          Boolean) =
      if (regressions.isEmpty) (Seq.empty, -1.0, 0, false)
      else {
        // the poll draws ONLY the two readings the health predicate
        // uses; sched16 (32 Spark jobs — multi-second on a sick host)
        // is drawn once here, after the wait settles, for the record
        def pollPair(): (Double, Double) =
          (math.min(busyProbe(), busyProbe()), measureStream())
        val ((busyR, streamR), healthy, polls) =
          awaitHealthyWindow(pollPair, busyBestKnown, streamBest)
        val schedR = math.min(schedProbe(), schedProbe())
        // recorded at execCount + 1 — the first retry's index — NOT at
        // execCount, where it would tie with the end-of-run probe and
        // nearestProbe's first-minimum rule would stamp early retries
        // with the PRE-WAIT (possibly sick) window's ratios
        probes += ((execCount + 1, streamR, schedR))
        if (!healthy) (Seq.empty, busyR, polls, true)
        else {
          val picks = retryPick(regressions, retryBudget)
          val out = picks.map { case (n, cur, best) =>
            val t = exec(n)
            val norm = if (t >= 0 && busyR > 0) t / busyR else -1.0
            // execCount AFTER exec = this retry's execution index, so
            // each retry stamps its own nearest-in-time probe window
            // instead of the single post-retry closing probe
            (n, cur, best, t, norm, execCount)
          }
          probes += ((execCount, measureStream(),
            math.min(schedProbe(), schedProbe())))
          (out, busyR, polls, false)
        }
      }
    val resolved = retried.collect {
      case (n, _, best, _, norm, _)
        if retryResolved(norm, best, busyRetry, busyBestKnown) => n
    }.toSet
    val regRemaining = regressions.filterNot(r => resolved(r._1))
    val retriedJson = retried
      .map { case (n, cur, best, t, norm, i) =>
        val p = nearestProbe(probes.toSeq, i)
        s"""{"q":"$n","norm":${fmt(cur)},"min":${fmt(best)}""" +
          s""","retry_sec":${fmt(t)},"retry_norm":${fmt(norm)}""" +
          s""","probe_i":${p._1}""" +
          s""","busy32_ratio":${fmt(
            if (busyBestKnown > 0) busyRetry / busyBestKnown else -1.0)}""" +
          s""","stream32_ratio":${fmt(p._2 / streamBest)}""" +
          s""","sched16_ratio":${fmt(p._3 / schedBest)}""" +
          s""","resolved":${resolved(n)}}"""
      }
      .mkString("[", ",", "]")
    val regJson = regRemaining
      .map { case (n, cur, best) =>
        // the judged time is min(pass1, pass2): attribute to the pass
        // that produced it
        val i =
          if (pass2.getOrElse(n, -1.0) >= 0 &&
            (pass1.getOrElse(n, Double.MaxValue) < 0 ||
              pass2(n) <= pass1(n))) idx2(n)
          else idx1.getOrElse(n, 0)
        val p = nearestProbe(probes.toSeq, i)
        s"""{"q":"$n","norm":${fmt(cur)},"min":${fmt(best)}""" +
          s""","probe_i":${p._1}""" +
          s""","busy32_ratio":${fmt(busyRatio)}""" +
          s""","stream32_ratio":${fmt(p._2 / streamBest)}""" +
          s""","sched16_ratio":${fmt(p._3 / schedBest)}}""" }
      .mkString("[", ",", "]")
    // the full probe series (execution index → readings), so any
    // query — flagged or not — can be host-attributed after the fact
    val probesJson = probes
      .map(p => s"""{"i":${p._1},"stream32_sec":${fmt(p._2)}""" +
        s""","sched16_sec":${fmt(p._3)}}""")
      .mkString("[", ",", "]")
    // queries sorted FASTEST-FIRST and the total/metric fields LAST:
    // the driver archives only a bounded stdout tail, and a ~87-entry
    // map overflows it — this ordering makes front-truncation lose the
    // cheapest timings first and never the slowest queries or the
    // total (round-4 lost 6 alphabetically-first queries AND the
    // leading "metric" field to exactly this).
    val qs = results.sortBy { case (_, v) => (v < 0, v) }
      .map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    // calibration sits AFTER queries so tail-truncation can't eat it:
    // busy32_sec is the fixed-work CPU probe above; probe_query_sec is
    // the canonical q1 min (present on full-surface runs) — the pair
    // lets any two rounds' numbers be host-normalized
    val probeQ = results.toMap.getOrElse("q1_pricing_summary", -1.0)
    val cal = s"""{"busy32_sec":${fmt(busySec)},"stream32_sec":${fmt(streamSec)},"sched16_sec":${fmt(schedSec)},"probe_query_sec":${fmt(probeQ)}}"""
    val calEnd = s"""{"busy32_sec":${fmt(busyEnd)},"stream32_sec":${fmt(streamEnd)},"sched16_sec":${fmt(schedEnd)}}"""
    // regressions sits with the calibration block AFTER the queries
    // map, so the driver's stdout tail-truncation can lose cheap
    // per-query timings but never the gate's verdict
    val line =
      s"""{"queries":$qs,"sf":"$sfDir","calibration":$cal,"calibration_end":$calEnd,"probes":$probesJson,"regressions":$regJson,"retried":$retriedJson,"retry_skipped_unhealthy":$retrySkippedUnhealthy,"retry_wait_polls":$retryWaitPolls,"unit":"sec","metric":"total","value":${fmt(total)}}"""
    println(line)
    // belt-and-braces: persist the full line where tail-truncation
    // can't lose it (read by later rounds for perf comparisons).
    // Single-query A/B runs (args.nonEmpty) go to bench_ab.json so a
    // partial run never replaces the full-surface baseline artifact.
    val outFile = if (args.nonEmpty) "bench_ab.json" else "bench_last.json"
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(outFile), line + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outFile: ${e.getMessage}")
    }
    spark.stop()
  }
}
