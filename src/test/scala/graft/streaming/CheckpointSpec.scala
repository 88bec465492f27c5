package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Exactly-once across restarts: a checkpointed file-source → parquet
  * -sink stream, run to completion twice — the second run must add
  * nothing (source offsets committed in the checkpoint), and the sink
  * must equal the batch projection of the input. */
class CheckpointSpec extends AnyFunSuite {
  import SparkTestSession._

  test("checkpointed stream is exactly-once across restarts") {
    val inDir = java.nio.file.Files.createTempDirectory("ckin").toString
    val outDir = java.nio.file.Files.createTempDirectory("ckout").toString + "/sink"
    val ckDir = java.nio.file.Files.createTempDirectory("ckpt").toString
    // stage events as 4 files so the source has multiple batches
    graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("user_id"), col("event_type"))
      .repartition(4).write.mode("overwrite").parquet(inDir)

    def runOnce(): Unit = {
      val schema = spark.read.parquet(inDir).schema
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(inDir)
        .withColumn("etype_up", upper(col("event_type")))
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckDir)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runOnce()
    val afterFirst = spark.read.parquet(outDir).count()
    runOnce() // restart from checkpoint: no new input -> no new rows
    val afterSecond = spark.read.parquet(outDir).count()
    assert(afterFirst == 1000L, s"first run wrote $afterFirst")
    assert(afterSecond == afterFirst, "restart must not duplicate output")
    // content equals the batch projection
    val sink = spark.read.parquet(outDir)
      .select("event_id", "etype_up").collect().map(_.mkString(":")).sorted
    val batch = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), upper(col("event_type")))
      .collect().map(_.mkString(":")).sorted
    assert(sink.toSeq == batch.toSeq)
  }
}
