package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Stream-static join: arriving documents dedup-checked against a
  * static corpus signature table, micro-batch by micro-batch, with
  * zero streaming state — results must match the batch incremental
  * dedup semantics on the same data. */
class DocStreamsSpec extends AnyFunSuite {
  import graft.SparkTestSession._
  import spark.implicits._

  private val shared = "alpha beta gamma delta epsilon zeta eta theta " * 5
  private val other = "lorem ipsum dolor sit amet consectetur adipiscing " * 5

  private def docsDf(rows: Seq[(Long, String)]) =
    rows.map { case (id, t) => (id, t, "en", s"src$id", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("arriving duplicates are flagged against the static corpus, " +
      "across multiple micro-batches") {
    val corpus = docsDf(Seq((0L, shared), (1L, shared), (2L, other)))
    // two parquet files → two micro-batches (maxFilesPerTrigger=1)
    val dir = java.nio.file.Files.createTempDirectory("docstream").toString
    docsDf(Seq((4L, shared), (9L, "nothing here matches anything at all")))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/b0")
    docsDf(Seq((14L, other)))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/b1")
    val staged = java.nio.file.Files.createTempDirectory("docstream-in")
    Seq("b0", "b1").foreach { b =>
      val part = new java.io.File(s"$dir/$b").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(part.toPath, staged.resolve(s"$b.parquet"))
    }
    val pairs = DocStreams.incrementalDedupStream(
      DocStreams.readDocStream(spark, staged.toString), corpus)
    EventStreams.runToMemory(spark, pairs, "inc_dedup_stream",
      OutputMode.Append())
    val got = spark.table("inc_dedup_stream")
      .groupBy(col("doc_id"))
      .agg(min(col("old_id")).as("dup_of"), count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet == Set(4L, 14L),
      s"only duplicated arrivals may be flagged: ${got.keySet}")
    assert(got(4L) == (0L, 2L), s"doc 4 must match corpus docs 0 and 1: ${got(4L)}")
    assert(got(14L) == (2L, 1L))
  }

  test("projection-form bands equal the batch signature-table bands") {
    // one tokenizer, one band convention: the stream's projection form
    // must be byte-equal to what the batch tier computes via
    // explode+partial-agg, or streaming dedup verdicts silently fork
    // from the materialized corpus signature table
    val dir = java.nio.file.Files.createTempDirectory("bandpin").toString
    docsDf(Seq((0L, shared), (1L, other), (2L, ""), (3L, shared + " tail")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val batch = graft.queries.Documents.minhashSignatures(spark, dir)
      .select(col("doc_id"),
        concat(lit("b0_"), col("mh0"), lit("_"), col("mh1")).as("b0"),
        concat(lit("b1_"), col("mh2"), lit("_"), col("mh3")).as("b1"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_._1)
    val proj = graft.queries.Documents.bandedSignatureProjection(
      graft.Tables.documents(spark, dir))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .sortBy(_._1)
    assert(batch.nonEmpty && batch.toSeq == proj.toSeq)
  }

  test("stream-static surprisal scores equal the batch form, with " +
      "add-one smoothing for corpus-unseen words") {
    // corpus model: alpha ×10, beta ×5 → N=15 (bits 4)
    val corpus = docsDf(Seq(
      (0L, "alpha alpha alpha alpha alpha alpha alpha alpha alpha alpha"),
      (1L, "beta beta beta beta beta")))
    val arrivals = docsDf(Seq((7L, "alpha beta omega")))
    val dir = java.nio.file.Files.createTempDirectory("docscore")
    arrivals.coalesce(1).write.mode("overwrite").parquet(dir.toString + "/in")
    val batch = DocStreams.surprisalScoreStream(
      spark.read.parquet(dir.toString + "/in"), corpus)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sorted
    val stream = DocStreams.surprisalScoreStream(
      DocStreams.readDocStream(spark, dir.toString + "/in"), corpus)
    EventStreams.runToMemory(spark, stream, "doc_score_stream",
      OutputMode.Append())
    val got = spark.table("doc_score_stream")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sorted
    assert(got.toSeq == batch.toSeq,
      "stream-static and batch scoring must produce identical rows")
    // hand-check: bits(15)=4; alpha c+1=11 → 4-4=0; beta c+1=6 → 4-3=1;
    // omega unseen → c+1=1 → 4-1=3 (the smoothing path)
    assert(got.toSeq == Seq((7L, "alpha", 0L), (7L, "beta", 1L),
      (7L, "omega", 3L)))
  }

  test("streaming pairs equal the batch asymmetric-join pairs on the same data") {
    val corpus = docsDf(Seq((0L, shared), (2L, other)))
    val arrivals = docsDf(Seq((4L, shared), (14L, other)))
    val dir = java.nio.file.Files.createTempDirectory("docstream2")
    arrivals.coalesce(1).write.mode("overwrite").parquet(dir.toString + "/in")
    val batch = DocStreams.incrementalDedupStream(
      spark.read.parquet(dir.toString + "/in"), corpus)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val stream = DocStreams.incrementalDedupStream(
      DocStreams.readDocStream(spark, dir.toString + "/in"), corpus)
    EventStreams.runToMemory(spark, stream, "inc_dedup_stream2",
      OutputMode.Append())
    val got = spark.table("inc_dedup_stream2")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(got.toSeq == batch.toSeq,
      "stream-static and batch joins must produce identical pairs")
  }

  test("streaming IVM: change feed folded over initial-state stats " +
      "equals the batch recompute, across micro-batch boundaries") {
    val d = "/root/testdata/sf0.001"
    // stage the classified change feed as several files so the fold
    // crosses micro-batch boundaries (maxFilesPerTrigger=1)
    val feedDir = java.nio.file.Files.createTempDirectory("ivm-feed")
    graft.queries.SnapshotOps.changeFeed(spark, d)
      .repartition(3)
      .write.mode("overwrite").parquet(feedDir.toString + "/out")
    val staged = java.nio.file.Files.createTempDirectory("ivm-staged")
    new java.io.File(feedDir.toString + "/out").listFiles()
      .filter(_.getName.endsWith(".parquet")).zipWithIndex
      .foreach { case (f, i) =>
        java.nio.file.Files.copy(f.toPath, staged.resolve(s"f$i.parquet"))
      }
    val initial = graft.queries.SnapshotOps.oldSnap(spark, d)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
    val updates = DocStreams.statsMaintenanceStream(spark,
      DocStreams.readDocStream(spark, staged.toString), initial)
    EventStreams.runToMemory(spark, updates.toDF(), "ivm_stream",
      OutputMode.Update())
    // final view = the max-upd_seq row per source
    val sink = spark.table("ivm_stream")
    val finalAll = sink.as[(String, Long, Long, Long)].collect()
      .groupBy(_._1).map { case (_, rows) => rows.maxBy(_._4) }
      .map(r => (r._1, r._2, r._3)).toSeq.sorted
    val batch = graft.queries.SnapshotOps.incrementalStats(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq.sorted
    // the batch view drops fully-deleted sources; the stream keeps
    // their state and it must have drained to exactly zero
    val (gone, finalRows) = finalAll.partition(_._2 == 0L)
    assert(finalRows == batch,
      "streamed fold must land on the exact batch-recompute stats")
    assert(gone.forall(_._3 == 0L),
      "a fully-deleted source must drain to (0 docs, 0 chars)")
    // and the fold really did cross batches: some source updated >1 time
    assert(sink.agg(max(col("upd_seq"))).collect()(0).getLong(0) > 1L,
      "expected multiple micro-batches to touch at least one source")
  }
}
