package graft.multimodal

import org.apache.spark.sql.types._
import org.apache.spark.sql.functions.{expr, lit}
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class MultimodalSpec extends AnyFunSuite {
  import SparkTestSession._

  private val dir = "/root/testdata/sf0.001"

  test("media table: binary payload schema and determinism") {
    val m = Multimodal.mediaTable(spark, dir)
    assert(m.schema("payload").dataType == BinaryType)
    val a = m.collect().map(x => (x.media_id, x.payload.toSeq)).sortBy(_._1)
    val b = Multimodal.mediaTable(spark, dir).collect()
      .map(x => (x.media_id, x.payload.toSeq)).sortBy(_._1)
    assert(a.toSeq == b.toSeq, "payload synthesis must be deterministic")
  }

  test("decodeMeta: typed metadata for every media row, batched") {
    val media = Multimodal.mediaTable(spark, dir)
    val meta = Multimodal.decodeMeta(spark, media)
    assert(meta.count() == media.count())
    val row = meta.filter(_.kind == "video").head()
    assert(row.n_frames >= 8 && row.width >= 64 && row.bytes > 16)
  }

  test("sampleFrames: image->1 frame, audio->0, video->ceil(frames/k)") {
    import spark.implicits._
    // unpersisted in the finally below: a suite-leaked cache entry
    // breaks CacheHygieneSpec's global invariant for later suites
    val media = Multimodal.mediaTable(spark, dir).cache()
    try {
    val frames = Multimodal.sampleFrames(spark, media, everyK = 4)
      .groupByKey(_.media_id).count().collect().toMap
    val metas = Multimodal.decodeMeta(spark, media).collect()
    metas.foreach { m =>
      val expected = m.kind match {
        case "image" => 1L
        case "audio" => 0L
        case "video" => ((m.n_frames + 3) / 4).toLong
      }
      assert(frames.getOrElse(m.media_id, 0L) == expected,
        s"media ${m.media_id} kind ${m.kind} frames ${m.n_frames}")
    }
    } finally media.unpersist(blocking = false)
  }

  test("sceneCuts: one row per video, segments = cuts + 1, frame " +
      "counts match the sampler, deterministic across runs") {
    import spark.implicits._
    val cuts = Multimodal.sceneCuts(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val metas = Multimodal.decodeMeta(spark,
      Multimodal.mediaTable(spark, dir)).collect()
      .filter(_.kind == "video")
    assert(cuts.map(_._1).sorted == metas.map(_.media_id).toSeq.sorted,
      "exactly the videos, every video")
    val byId = metas.map(m => m.media_id -> m).toMap
    for ((id, nf, nCuts, nSeg, maxJump) <- cuts) {
      assert(nf == (byId(id).n_frames + 3) / 4, s"sampled count for $id")
      assert(nSeg == nCuts + 1, s"segments must be cuts+1 for $id")
      assert(nCuts >= 0 && maxJump >= 0)
      assert(nCuts <= nf - 1, s"at most one cut per frame gap for $id")
    }
    val again = Multimodal.sceneCuts(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(cuts.sortBy(_._1) == again.sortBy(_._1), "deterministic")
  }

  test("frameFeatures: fixed 8-dim normalized vectors") {
    val media = Multimodal.mediaTable(spark, dir)
    val feats = Multimodal.frameFeatures(spark,
      Multimodal.sampleFrames(spark, media, 4))
    assert(feats.schema("features").dataType ==
      ArrayType(FloatType, containsNull = false))
    val vs = feats.limit(20).collect().map(_.getSeq[Float](2))
    assert(vs.forall(_.length == 8))
    assert(vs.forall(v => math.abs(v.sum - 1f) < 1e-3))
  }

  test("mediaStats: per-kind aggregate over decoded metadata") {
    val stats = Multimodal.mediaStats(spark, dir).collect()
    assert(stats.map(_.getString(0)).toSeq == Seq("audio", "image", "video"))
    assert(stats.map(_.getLong(1)).sum == 500L)
  }

  test("resize: longest side fits the cap, bytes follow the stride " +
      "formula, and content is the stride subset of the original") {
    val media = Multimodal.mediaTable(spark, dir)
    val before = media.collect().map(m => m.media_id -> m).toMap
    val after = Multimodal.resizeMedia(spark, media).collect()
    assert(after.length == before.size)
    after.foreach { m =>
      val (w, h, frames) = StubCodec.decodeHeader(m.payload)
      val (w0, h0, f0) = StubCodec.decodeHeader(before(m.media_id).payload)
      if (m.kind == "audio") {
        assert((w, h, frames) == ((w0, h0, f0)), "audio passes through")
      } else {
        assert(math.max(w, h) <= Multimodal.ResizeMaxDim)
        assert(frames == f0, "frame count survives resize")
        var l = 0
        while (math.max(w0, h0) >> l > Multimodal.ResizeMaxDim) l += 1
        assert(w == (w0 >> l) && h == (h0 >> l))
        val b0 = StubCodec.body(before(m.media_id).payload)
        val b = StubCodec.body(m.payload)
        assert(b.length == (b0.length + (1 << l) - 1) / (1 << l))
        // stub "resample" = every 2^l-th byte of the original body
        b.zipWithIndex.foreach { case (x, i) => assert(x == b0(i * (1 << l))) }
      }
    }
  }

  test("oracle level ladder == the codec's shift rule for EVERY dim, " +
      "including the 129*2^L boundaries and the LOG2 fallback") {
    import spark.implicits._
    // lift the CASE ladder verbatim out of resizeStatsSql (it is pure
    // GREATEST/CEIL/LOG2 — valid Spark SQL too) and evaluate it against
    // the definition: smallest L with max(w,h) >> L <= 128. Dims 1..6000
    // cross every ladder threshold (..., 2063, 4127) and 6000 exercises
    // the closed-form fallback branch.
    val sql = Multimodal.resizeStatsSql
    val start = sql.indexOf("CASE WHEN GREATEST")
    val stop = sql.indexOf("END AS l")
    assert(start >= 0 && stop > start, "ladder not found in oracle SQL")
    val ladder = sql.substring(start, stop).replace("|", "").replace("\n", " ") + "END"
    val dims = (1 to 6000).toDF("w").withColumn("h", lit(64))
      .withColumn("l_oracle", expr(ladder))
      .collect().map(r => r.getInt(0) -> r.getInt(2)).toMap
    (1 to 6000).foreach { d =>
      var l = 0
      while (d >> l > 128) l += 1
      assert(dims(d) == l, s"dim $d: oracle ladder ${dims(d)} != shift rule $l")
    }
  }

  test("audioVad: planted frame counts, jitter duty cycle, and the " +
      "longest voiced run") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("vad").toString
    // only doc_id % 3 == 1 rows are audio; 320 chars → 2 frames,
    // 10 chars → 1 frame; jitter = (id*37 + f*17) % 83, voiced ⇔ ≥ 28
    Seq(
      (1L, "a" * 320, "en", "s", 320L), // f0 j=37 v, f1 j=54 v → run 2
      (4L, "b" * 10, "en", "s", 10L),   // f0 j=65 v → run 1
      (7L, "c" * 5, "en", "s", 5L),     // f0 j=10 unvoiced → run 0
      (2L, "ignored video row", "en", "s", 17L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = Multimodal.audioVad(spark, tmp)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 2L, 2L, 1000L, 2L),
      (4L, 1L, 1L, 1000L, 1L),
      (7L, 1L, 0L, 0L, 0L)))
  }

  test("phash: identical payloads share a bucket; a few flipped bytes " +
      "usually do too; redundancy counts add up") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("ph").toString
    // ids 0,3,6 -> kind image. 0 and 3 identical text; 6 differs from
    // them in ONE character (perceptual robustness: ' '(32) -> '!'(33)
    // stays far below the sample mean whether or not the position is
    // sampled) -> all three in one bucket.
    val base = ("abcz " * 40).trim
    val oneOff = base.substring(0, 4) + "!" + base.substring(5)
    Seq(
      (0L, base, "en", "s", base.length.toLong),
      (3L, base, "en", "s", base.length.toLong),
      (6L, oneOff, "en", "s", oneOff.length.toLong),
      (1L, base.reverse, "en", "s", base.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = Multimodal.phashBuckets(spark, tmp)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val img = got("image")
    // (n_buckets, n_media, n_dup_buckets, n_redundant, max_bucket)
    assert(img._3 == 3L, s"3 image media expected, got $img")
    assert(img._2 == 1L && img._4 == 1L && img._5 == 2L && img._6 == 3L,
      s"one bucket holding all three image payloads expected, got $img")
    assert(got("audio")._3 == 1L)
  }

  test("phash near-dup pairs: identical payloads collide at Hamming " +
      "0 within their kind") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ph").toString
    val base = "the quick brown fox jumps over the lazy dog " * 4
    // doc_ids 0 and 3 are both kind 'image' (id % 3 == 0) and share
    // the exact text -> identical phash -> a Hamming-0 near-dup pair;
    // 6 (image) and 1,4 (audio) carry unrelated long texts
    val other1 = "zebra quartz jolt vex wump flog bling crwth " * 4
    val other2 = "mimsy borogove rath outgrabe tove wabe gyre " * 4
    Seq((0L, base), (3L, base), (6L, other1), (1L, other2), (4L, base))
      .map { case (id, t) => (id, t, "en", s"s$id", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Multimodal.phashNearDupPairs(spark, dir)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // image kind: the identical pair (0,3) is a candidate at distance
    // 0; kinds never mix, so doc 4's identical text (audio) cannot
    // pair with 0 or 3
    assert(got.contains("image"))
    assert(got("image")._3 >= 1L, "identical pair must confirm")
    assert(got("image")._4 == 0L, "identical payloads are Hamming 0")
    assert(!got.contains("video"), "single-doc kinds emit no pairs")
  }

  test("aspect buckets: geometric-midpoint boundaries assign the " +
      "log-nearest rung; square images waste nothing") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ar").toString
    // widths from doc_id%16, heights from n_chars%16 (stub header
    // arithmetic): ar=166 is below the 176 midpoint -> rung 125;
    // ar=181 is above it -> rung 250; 160x160 -> rung 1000, waste 0
    Seq((0L, "a", 10L),   // w=64,  h=384 -> ar 166
        (48L, "b", 9L),   // w=64,  h=352 -> ar 181
        (3L, "c", 3L))    // w=160, h=160 -> ar 1000
      .map { case (id, t, nc) => (id, t, "en", s"s$id", nc) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Multimodal.aspectBuckets(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (125L, 1L, 247L, 247L),
      (250L, 1L, 276L, 276L),
      (1000L, 1L, 0L, 0L)))
  }
}
