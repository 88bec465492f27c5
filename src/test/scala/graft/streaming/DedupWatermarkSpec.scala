package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Pins dedupWithinWatermarkStream's two-sided contract across an
  * ordered multi-batch file replay:
  *   - suppression: a duplicate arriving while its predecessor's key
  *     is inside the watermark horizon is NOT re-emitted;
  *   - bounded state: the store EVICTS expired keys (numRowsRemoved
  *     advances, final state ≪ distinct keys seen), and the price of
  *     that bound is visible — a duplicate arriving after expiry IS
  *     re-emitted. Plain dropDuplicates would dedup it forever while
  *     holding every key ever seen; this spec is the proof the
  *     operator chose bounded state instead. */
class DedupWatermarkSpec extends AnyFunSuite {
  import SparkTestSession._

  test("within-horizon dups suppressed; expired keys evicted and " +
      "re-emitted on re-arrival") {
    val stage = java.nio.file.Files.createTempDirectory("dedupwm_stage")
    val inDir = java.nio.file.Files.createTempDirectory("dedupwm")
    // ts minutes (offset from a nonzero base — rows AT the initial
    // epoch-0 watermark would be dropped as late data); chunks staged
    // in event-time order so the watermark advances between batches.
    // Two semantics this replay pins: the watermark trails one batch,
    // and every suppressed duplicate EXTENDS its key's expiry to its
    // own ts + horizon — so eviction of a hot key needs a batch
    // without it (chunk 3) before a re-arrival can re-emit (chunk 4).
    val chunks = Seq(
      Seq((1L, "alpha", 0), (2L, "beta", 0), (3L, "gamma", 1)),
      // +5 min: doc 4 repeats alpha INSIDE the horizon → suppressed,
      // alpha's expiry extends to +15
      Seq((4L, "alpha", 5), (5L, "delta", 5)),
      // +60: watermark is still -5 when this batch runs → alpha live
      // → doc 6 suppressed, expiry extends to +70
      Seq((6L, "alpha", 60), (7L, "epsilon", 60)),
      // +200 (no alpha): watermark +50 evicts beta/gamma/delta; after
      // this batch the watermark (+190) passes alpha's +70 expiry
      Seq((8L, "zeta", 200)),
      // +240: alpha was evicted → doc 9 re-emits it
      Seq((9L, "alpha", 240)))
    import spark.implicits._
    def stamped(rows: Seq[(Long, String, Int)]) =
      rows.toDF("doc_id", "text", "m")
        .select(col("doc_id"), col("text"),
          ((col("m") + 1000) * 60).cast("timestamp").as("ts"))
    val schema = stamped(chunks.head).schema
    chunks.zipWithIndex.foreach { case (rows, k) =>
      stamped(rows)
        .coalesce(1).write.mode("overwrite").parquet(s"$stage/chunk$k")
      val part = new java.io.File(s"$stage/chunk$k").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = java.nio.file.Paths.get(s"$inDir/d$k.parquet")
      java.nio.file.Files.copy(part.toPath, dst)
      // the file source replays in modification-time order — make the
      // intended order explicit instead of trusting copy latency
      dst.toFile.setLastModified(1700000000000L + k * 10000L)
    }
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(inDir.toString)
    val q = DocStreams.dedupWithinWatermarkStream(stream, "10 minutes")
      .writeStream.format("memory").queryName("dedup_wm")
      .outputMode(OutputMode.Append()).start()
    q.processAllAvailable()
    val progress = q.recentProgress.toSeq.filter(_.stateOperators.nonEmpty)
    q.stop()
    val emitted = spark.table("dedup_wm")
      .select(col("doc_id")).as[Long].collect().toSet
    // docs 4 and 6 are the suppressed duplicates; 9 re-emits alpha
    // after eviction — the documented horizon trade-off
    assert(emitted == Set(1L, 2L, 3L, 5L, 7L, 8L, 9L),
      s"got $emitted")
    val removed = progress.map(_.stateOperators.map(_.numRowsRemoved).sum).sum
    assert(removed >= 5,
      s"watermark eviction must reclaim expired keys, removed=$removed")
    val finalState = progress.last.stateOperators.map(_.numRowsTotal).sum
    assert(finalState <= 2,
      s"final state must hold only the live horizon, got $finalState")
  }
}
