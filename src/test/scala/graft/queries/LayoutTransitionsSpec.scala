package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Behavioral pins for the round-5 additions beyond the DuckDB oracle:
  * transition counts must tie out against sessionize (same session
  * boundary, two independent formulations), source overlap must count
  * exactly the crafted shared shingle, and Z-order buckets must
  * actually deliver the per-bucket span bound that justifies the
  * layout. */
class LayoutTransitionsSpec extends AnyFunSuite {
  import graft.SparkTestSession._
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  test("session transitions tie out: sum of transition counts equals " +
      "total events minus session count (each k-event session has k-1)") {
    val trans = Events.sessionTransitions(spark, d)
      .agg(sum(col("n"))).collect()(0).getLong(0)
    val sess = Events.sessionize(spark, d)
      .agg(count(lit(1)).as("n_sessions"), sum(col("n_events")).as("n_events"))
      .collect()(0)
    assert(trans == sess.getLong(1) - sess.getLong(0),
      "transitions must equal events - sessions under the same boundary")
    assert(trans > 0, "fixture must exercise the within-session path")
  }

  test("source overlap counts exactly the crafted shared shingle") {
    val dir = java.nio.file.Files.createTempDirectory("ovl").toString
    // srcA and srcB share exactly one 3-gram ("one two three"); srcC
    // shares nothing. Distinct shingles: A = {one two three, two three
    // aaa}, B = {zzz one two, one two three}, so |A∩B| = 1, |A∪B| = 3.
    Seq(
      (1L, "one two three aaa", "srcA"),
      (2L, "zzz one two three", "srcB"),
      (3L, "ppp qqq rrr sss", "srcC"))
      .map { case (id, t, src) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = CorpusCuration.sourceOverlap(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == Seq(("srcA", "srcB", 1L, 1000L / 3)),
      "exactly the A-B pair, 1 shared shingle, Jaccard 1/3 permille-floored")
  }

  test("morton spread ladder equals the per-bit interleave definition") {
    // the shipped key uses the 5-step shift/mask ladder; pin it against
    // the definitional bit loop (also the oracle's formulation) on the
    // full corners plus a pseudo-random sweep of the 21-bit domain
    def loop(x: Long, y: Long): Long =
      (0 until 21).map(i =>
        (((x >> i) & 1L) << (2 * i + 1)) | (((y >> i) & 1L) << (2 * i))).sum
    val probes = Seq(0L, 1L, 2L, 0x1FFFFFL, 0x155555L, 0x0AAAAAL) ++
      (1 to 500).map(i => (i * 2654435761L) & 0x1FFFFFL)
    val df = spark.createDataFrame(
      probes.flatMap(x => probes.take(12).map(y => (x, y))))
      .toDF("xs", "ys")
    val got = df.select(col("xs"), col("ys"),
      org.apache.spark.sql.functions.shiftleft(
        DataLayout.spread21Test(col("xs")), 1)
        .bitwiseOR(DataLayout.spread21Test(col("ys"))).as("z"))
      .collect()
    for (r <- got)
      assert(r.getLong(2) == loop(r.getLong(0), r.getLong(1)),
        s"ladder diverges from definition at (${r.getLong(0)}, ${r.getLong(1)})")
  }

  test("compaction plan packs planted files sequentially with at most " +
      "one-file overshoot and never splits a file") {
    val dir = java.nio.file.Files.createTempDirectory("cmp").toString
    // plant one event per (window, row) so each 15-min window becomes
    // one "file" of a known size: props of length L → file bytes =
    // n*(L+32). Windows sized 20 KiB each → with the 64 KiB target,
    // sequential packing puts windows {0,1,2} in bin 0 (60 KiB),
    // {3,4,5} in bin 1 (overshoot starts bin 1 at window 3 since
    // cum_before(3) = 60 KiB < 64 KiB... exactly: bins by
    // cum_before DIV 65536: win3 cum=61440 → bin 0 (4 files!),
    // win4 cum=81920 → bin 1. Compute expectations directly.
    val perWin = 20480L // 20 KiB per window-file
    val rowLen = 480 // props length; bytes/row = 512
    val rowsPerWin = (perWin / 512).toInt // 40 rows
    val rows = for {
      w <- 0 until 8; r <- 0 until rowsPerWin
    } yield (w.toLong * 100 + r, // event_id
      new java.sql.Timestamp(w * 900000L + r * 1000L),
      r.toLong, "etypeA", 1.0, "x" * rowLen)
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = DataLayout.compactionBins(spark, dir)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    // expected greedy pack: cum_before(w) = w*20480; bin = that DIV 65536
    val expBins = (0 until 8).groupBy(w => (w.toLong * perWin) / 65536L)
    val want = expBins.toSeq.sortBy(_._1).map { case (b, ws) =>
      ("etypeA", b, ws.size.toLong, ws.size * perWin,
        ws.size.toLong * rowsPerWin, ws.min.toLong, ws.max.toLong)
    }
    assert(got == want, "plan must match the sequential-fill definition")
    assert(got.map(_._3).sum == 8L, "every file lands in exactly one bin")
    // overshoot bound: every bin except possibly the last holds
    // >= target once its last file is in (sequential fill property)
    for (t <- got.dropRight(1))
      assert(t._4 + perWin > 65536L,
        "a closed bin must be within one file of the target")
  }

  test("z-order buckets tile the table and bound both dimension spans") {
    val stats = DataLayout.zorderStats(spark, d).collect()
    val li = graft.Tables.lineitem(spark, d)
      .agg(count(lit(1)), max(col("l_partkey")).cast("long"),
        max(col("l_suppkey")).cast("long")).collect()(0)
    val (total, xm, ym) = (li.getLong(0), li.getLong(1), li.getLong(2))
    assert(stats.map(_.getLong(1)).sum == total, "buckets must tile all rows")
    assert(stats.length <= 64 && stats.length > 1)
    // an 8x8 grid bucket spans at most 1/8 of each normalized dimension;
    // mapping back to raw values adds at most one integer-rounding step
    for (r <- stats) {
      assert(r.getLong(6) <= (xm + 1) / 8 + 1,
        s"bucket ${r.getLong(0)} x_span ${r.getLong(6)} exceeds an eighth")
      assert(r.getLong(7) <= (ym + 1) / 8 + 1,
        s"bucket ${r.getLong(0)} y_span ${r.getLong(7)} exceeds an eighth")
    }
  }
}
