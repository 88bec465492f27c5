package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** The reference's crash/early_exit invariants lifted to STREAMING
  * (test-mr.sh:183-271 kills workers mid-task and demands the final
  * output equal the sequential oracle with no dup/loss): a
  * foreachBatch sink crashes AFTER writing a batch's output but
  * BEFORE the checkpoint commit — the worst-case window, where the
  * work is on disk but the engine doesn't know it. On restart the
  * engine re-runs that batch with the SAME batch id; an idempotent
  * per-batch-id overwrite makes the retry converge instead of
  * duplicating — the standard exactly-once foreachBatch discipline
  * (idempotent merge keyed on batchId). CheckpointSpec covers the
  * benign restart (offsets committed, nothing re-runs); this spec
  * pins the torn-commit path. */
object ForeachBatchExactlyOnceSpec {
  // driver-side injection state: foreachBatch bodies run on the driver
  @volatile var crashArmed = true
  @volatile var batch2Attempts = 0
}

class ForeachBatchExactlyOnceSpec extends AnyFunSuite {
  import SparkTestSession._
  import ForeachBatchExactlyOnceSpec._

  test("foreachBatch idempotent merge survives a mid-stream crash " +
      "with no duplicates and no loss") {
    val inDir = java.nio.file.Files.createTempDirectory("fbin").toString
    val outDir = java.nio.file.Files.createTempDirectory("fbout").toString
    val ckDir = java.nio.file.Files.createTempDirectory("fbckpt").toString
    graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("user_id"), col("event_type"))
      .repartition(4).write.mode("overwrite").parquet(inDir)
    crashArmed = true
    batch2Attempts = 0

    def runOnce(): Boolean = { // true = terminated clean
      val schema = spark.read.parquet(inDir).schema
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(inDir)
        .withColumn("etype_up", upper(col("event_type")))
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
          // idempotent unit: each batch id owns one overwrite target,
          // so a re-run of the same id replaces rather than appends
          df.write.mode("overwrite").parquet(s"$outDir/b$id")
          if (id == 2L) {
            batch2Attempts += 1
            if (crashArmed) {
              crashArmed = false
              // crash in the torn window: output written, commit not
              throw new RuntimeException("injected crash after write")
            }
          }
        }
        .option("checkpointLocation", ckDir)
        .trigger(Trigger.AvailableNow())
        .start()
      try { q.awaitTermination(); true }
      catch {
        case e: org.apache.spark.sql.streaming.StreamingQueryException =>
          assert(e.getMessage.contains("injected crash") ||
            Option(e.getCause).exists(_.getMessage.contains("injected crash")))
          false
      }
    }

    assert(!runOnce(), "first run must die on the injected crash")
    assert(batch2Attempts == 1)
    assert(runOnce(), "restart must complete cleanly")
    // batch 2 re-ran under the same id (offsets were uncommitted)
    assert(batch2Attempts == 2, s"batch 2 ran $batch2Attempts times")
    // no dup, no loss: union of per-batch outputs == the batch twin
    val sink = spark.read.parquet(s"$outDir/b*")
      .select("event_id", "etype_up").collect().map(_.mkString(":")).sorted
    val batch = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), upper(col("event_type")))
      .collect().map(_.mkString(":")).sorted
    assert(sink.length == 1000, s"sink rows ${sink.length}")
    assert(sink.toSeq == batch.toSeq)
  }
}
