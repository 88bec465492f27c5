package graft

import org.apache.spark.sql.SparkSession

/** The host-health probe trio, shared by Bench (full-surface runs) and
  * the scaling-rehearsal tools (graft.tools.*) so every recorded
  * measurement can carry the same window attribution:
  *
  *   - `busy32`  — pure-ALU parallel throughput (32 xorshift threads).
  *     The normalization anchor: bench_history minimums are stored in
  *     busy32-normalized units.
  *   - `stream32` — memory bandwidth (32 threads stream-summing a
  *     shared 512 MiB array). Catches noisy-neighbor bandwidth
  *     squeezes busy32 is blind to.
  *   - `sched16` — per-job round-trip (16 two-task count jobs).
  *     Catches driver-schedule/barrier degradation both other probes
  *     are blind to; multi-stage queries multiply by this.
  *
  * Each probe's rationale and calibration history lives with its
  * original in-Bench definition (see Bench.scala's round-8..10 notes);
  * the implementations here are those definitions, extracted verbatim
  * so tools stop reimplementing them.
  */
private[graft] object Probes {
  // AtomicLong sink: exists only to defeat DCE — a @volatile local is
  // a silent no-op inside thread closures (plain ObjectRef).
  private val sink = new java.util.concurrent.atomic.AtomicLong(0L)

  private[graft] def spin(seed: Long, iters: Long): Long = {
    var x = seed | 1L; var i = 0L
    while (i < iters) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; i += 1 }
    x
  }

  /** One JIT-warm pass callers should run before trusting busy32. */
  def warm(): Unit = { sink.addAndGet(spin(99L, 20000000L)); () }

  /** 32-thread ALU probe, single reading (~0.45 s healthy). Callers
    * wanting the Bench convention take `min(busy32(), busy32())`. */
  def busy32(): Double = {
    val t0 = System.nanoTime()
    val ts = (1 to 32).map { k =>
      val th =
        new Thread(() => { sink.addAndGet(spin(k.toLong, 200000000L)); () })
      th.start(); th
    }
    ts.foreach(_.join())
    (System.nanoTime() - t0) / 1e9
  }

  /** 32-thread bandwidth probe: warm pass + min of two (~0.020 s
    * healthy). The 512 MiB buffer is method-local so it never pins
    * driver heap across a caller's timed windows. */
  def stream32(): Double = {
    val streamBuf = new Array[Long](64 * 1024 * 1024) // 512 MiB
    java.util.Arrays.fill(streamBuf, 3L)
    def streamProbe(): Double = {
      val t0 = System.nanoTime()
      val slice = streamBuf.length / 32
      val ts = (0 until 32).map { k =>
        val th = new Thread(() => {
          var pass = 0; var acc = 0L
          while (pass < 4) {
            var i = k * slice; val end = i + slice
            while (i < end) { acc += streamBuf(i); i += 1 }
            pass += 1
          }
          sink.addAndGet(acc); ()
        })
        th.start(); th
      }
      ts.foreach(_.join())
      (System.nanoTime() - t0) / 1e9
    }
    streamProbe() // JIT + page-touch warm
    math.min(streamProbe(), streamProbe())
  }

  /** Scheduler/barrier probe: 16 two-task count jobs, single batch
    * (~0.2–0.4 s healthy local[32]). Call only after the session has
    * run at least one real query so codegen/session startup never
    * pollutes it; Bench takes `min` of two batches. */
  def sched16(spark: SparkSession): Double = {
    val t0 = System.nanoTime()
    var i = 0
    while (i < 16) { spark.range(64).repartition(2).count(); i += 1 }
    (System.nanoTime() - t0) / 1e9
  }
}
