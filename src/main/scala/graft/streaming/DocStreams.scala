package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming ingestion over the documents table: the arriving-corpus
  * side of the curation pipeline. The key operator is the
  * STREAM-STATIC join — each micro-batch of new documents checked
  * against the existing corpus' signature table without any streaming
  * state at all (the static side is just a DataFrame; Spark re-plans
  * it per micro-batch, so a periodically-refreshed corpus snapshot
  * works unchanged).
  *
  * This is only possible because MinHash signatures are a per-row
  * PROJECTION (queries.Documents.minhashSignatures' zero-shuffle
  * form): no explode/groupBy means no streaming aggregation, no
  * watermark bookkeeping, and append output mode — each arriving doc
  * emits its duplicate verdict exactly once, in its own micro-batch. */
object DocStreams {

  /** File-source stream over a documents parquet path (staged into a
    * directory when pointed at a bare file; maxFilesPerTrigger=1 for
    * deterministic micro-batch replay — same conventions as
    * EventStreams.readEventStream). */
  def readDocStream(spark: SparkSession, path: String): DataFrame = {
    val schema = spark.read.parquet(path).schema
    val f = new java.io.File(path)
    val dir =
      if (f.isFile) {
        val d = java.nio.file.Files.createTempDirectory("docstream")
        java.nio.file.Files.copy(f.toPath, d.resolve(f.getName))
        d.toString
      } else path
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
  }

  /** Banded signature projection shared by both sides of the
    * stream-static join (band keys = md5-concat strings, exactly the
    * batch dedup_incremental convention). A pure select — safe on a
    * stream. */
  private[streaming] def bandedSignatures(docs: DataFrame): DataFrame = {
    val sigs = (0 until 4).map(j =>
      array_min(transform(col("ws"),
        w => md5(concat(lit(j.toString), lit("|"), w)))).as(s"mh$j"))
    docs
      .withColumn("ws", array_distinct(
        filter(split(col("text"), "[^\\p{L}]+"), t => length(t) > 0)))
      .filter(size(col("ws")) > 0)
      .select(col("doc_id") +: sigs: _*)
      .select(col("doc_id"),
        concat(lit("b0_"), col("mh0"), lit("_"), col("mh1")).as("b0"),
        concat(lit("b1_"), col("mh2"), lit("_"), col("mh3")).as("b1"))
  }

  /** Stream-static incremental dedup: arriving docs (stream) banded
    * and joined against the corpus signature table (static). Emits
    * (doc_id, dup_of, n_candidates) per arriving doc that collides
    * with the corpus — the disjoint-band union counts each
    * (new, corpus) pair exactly once, and the per-doc aggregate is
    * WITHIN one arriving doc's rows only, so it stays a stateless
    * append pipeline when grouped per micro-batch via foreachBatch
    * (the spec drives it that way); a globally-grouped variant would
    * be a streaming agg needing a watermark column this table lacks. */
  def incrementalDedupStream(streamDocs: DataFrame, corpus: DataFrame)
      : DataFrame = {
    val neu = bandedSignatures(streamDocs)
    val old = bandedSignatures(corpus)
      .select(col("doc_id").as("old_id"),
        col("b0").as("ob0"), col("b1").as("ob1"))
    val onB0 = neu.join(old, col("b0") === col("ob0"))
    val onB1Only = neu.join(old,
      col("b1") === col("ob1") && col("b0") =!= col("ob0"))
    onB0.union(onB1Only)
      .select(col("doc_id"), col("old_id"))
  }
}
