package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, forcing full plan execution through the noop
  * sink (no driver-side collect, no count()-only column pruning).
  * A warm-up pass (q1) absorbs JVM/codegen startup so per-query times
  * reflect steady state. Prints exactly one JSON metric line. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Session.build("graft-bench")
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
      if (ok) dt else -1.0
    }
    // Host-calibration probe: cross-round totals are host-dominated
    // (a mid-round reboot once rescaled every query ~1.6x on identical
    // code — BASELINE.md), so the artifact carries a fixed-work CPU
    // number future rounds can normalize by. 32 threads of a pinned
    // xorshift64 loop — pure integer ALU, no allocation, no memory
    // traffic — measures delivered parallel throughput; min of two
    // runs after a JIT warm pass. Measured 0.45 s on this host when
    // healthy (round 8); effective-core loss shows up as a
    // proportional increase.
    @volatile var sink = 0L
    def spin(seed: Long, iters: Long): Long = {
      var x = seed | 1L; var i = 0L
      while (i < iters) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; i += 1 }
      x
    }
    def busyProbe(): Double = {
      val t0 = System.nanoTime()
      val ts = (1 to 32).map { k =>
        val th = new Thread(() => { sink += spin(k.toLong, 200000000L) })
        th.start(); th
      }
      ts.foreach(_.join())
      (System.nanoTime() - t0) / 1e9
    }
    sink = spin(99L, 20000000L) // JIT warm
    val busySec = math.min(busyProbe(), busyProbe())
    exec("q1_pricing_summary") // warm-up: JVM, codegen, file index
    // two passes, report min: first execution of a query shape pays
    // one-time janino codegen (~1-5 s) that is irrelevant at scale.
    // Optional args: query names for single-query A/B timing (the
    // driver always runs the full surface with no args).
    val names =
      if (args.nonEmpty) args.toSeq.sorted
      else SparkEntry.queries.keys.toSeq.sorted
    val pass1 = names.map(n => n -> exec(n)).toMap
    val results = names.map { n =>
      val t2 = exec(n)
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
    val cal = s"""{"busy32_sec":${fmt(busySec)},"probe_query_sec":${fmt(probeQ)}}"""
    val line =
      s"""{"queries":$qs,"sf":"$sfDir","calibration":$cal,"unit":"sec","metric":"total","value":${fmt(total)}}"""
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
