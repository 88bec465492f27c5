package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Behavioral pins for the curation tier — the DuckDB oracle checks
  * values on the fixture corpus; these pin the SEMANTICS on crafted
  * inputs: a shared phrase becomes one merged span, CDC chunk hashes
  * survive a front-of-document edit, target-looking docs outscore
  * generic ones. */
class CorpusCurationSpec extends AnyFunSuite {
  import graft.SparkTestSession._
  import spark.implicits._

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("cc").toString
    rows.map { case (id, t) => (id, t, "en", s"src$id", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("duplicate spans: a shared 5-token phrase merges into ONE span " +
      "of 5 tokens; a no-overlap doc emits nothing") {
    val phrase = "one two three four five"
    val dir = writeDocs(Seq(
      (1L, s"$phrase aaa bbb ccc ddd eee"),
      (2L, s"fff ggg hhh iii jjj $phrase"),
      (3L, "kkk lll mmm nnn ooo ppp qqq")))
    val got = CorpusCuration.duplicateSpans(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // 3 overlapping 3-gram hits (pos 1..3 resp. 6..8) merge to one
    // span covering exactly the 5 phrase tokens
    assert(got(1L) == ((1L, 5L)))
    assert(got(2L) == ((1L, 5L)))
    assert(!got.contains(3L), "a doc with no cross-doc 3-gram has no spans")
  }

  test("cdc chunks: chunks tile the doc exactly, and a front edit " +
      "leaves later chunk hashes intact") {
    // enough distinct words that at least one md5-boundary fires
    val words = (0 until 40).map(i =>
      s"w${('a' + i / 26).toChar}${('a' + i % 26).toChar}")
    val base = words.mkString(" ")
    val dir = writeDocs(Seq((1L, base), (2L, s"zzz $base")))
    val rows = CorpusCuration.cdcChunks(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    val d1 = rows.filter(_._1 == 1L).sortBy(_._2)
    val d2 = rows.filter(_._1 == 2L).sortBy(_._2)
    // tiling: token counts sum to doc length, ids contiguous from 0
    assert(d1.map(_._3).sum == 40)
    assert(d2.map(_._3).sum == 41)
    assert(d1.map(_._2).toSeq == d1.indices.toSeq)
    // boundary stability: every chunk hash of doc 1 except its first
    // chunk's reappears in doc 2 (the prepended token only perturbs
    // the first chunk — the content-defined boundaries re-align)
    val h2 = d2.map(_._4).toSet
    d1.drop(1).foreach { c =>
      assert(h2.contains(c._4), s"chunk ${c._2} hash should survive the edit")
    }
  }

  test("importance: a doc matching the src0 target slice outscores a " +
      "generic doc, deterministically") {
    // corpus: tango appears only in the target slice + doc 1 (cc=8),
    // generic filler dominates (Nc=40) — so tango carries positive
    // target-vs-corpus ratio bits while filler carries negative
    val dir = writeDocs(
      Seq((0L, "tango tango tango tango"), // the target (src0) slice
        (1L, "tango tango tango tango"), // looks exactly like the target
        (2L, "beta gamma delta epsilon")) ++ // generic corpus-only words
        (3L to 9L).map(i => (i, "beta gamma delta epsilon")))
    val got = CorpusCuration.importanceScore(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got(1L) > got(2L),
      "target-like doc must carry a higher likelihood ratio")
    val again = CorpusCuration.importanceScore(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got == again, "integer scoring must be run-deterministic")
  }

  test("quality deciles: bins are 1..10 per source, balanced within 1, " +
      "and score-monotone (bin 1 holds the best scores)") {
    val d = "/root/testdata/sf0.01"
    val rows = CorpusCuration.qualityDeciles(spark, d)
      .as[(String, Int, Long, Long, Long, Long)].collect()
    rows.groupBy(_._1).foreach { case (src, bins) =>
      assert(bins.map(_._2).sorted.toSeq == (1 to bins.length),
        s"$src bins must be contiguous from 1")
      val sizes = bins.map(_._3)
      assert(sizes.max - sizes.min <= 1, s"$src NTILE bins unbalanced")
      // min_score of bin k must be >= max_score of bin k+1
      val byBin = bins.sortBy(_._2)
      byBin.sliding(2).foreach {
        case Array(hi, lo) =>
          assert(hi._5 >= lo._6,
            s"$src bin ${hi._2} overlaps bin ${lo._2} score range")
        case _ =>
      }
    }
  }

  test("lsh precision audit: buckets in 0..10, permille ranges nest " +
      "inside their bucket, and the sample is run-deterministic") {
    val d = "/root/testdata/sf0.01"
    val rows = CorpusCuration.lshPrecision(spark, d)
      .as[(Int, Long, Long, Long)].collect()
    assert(rows.nonEmpty, "the sampled audit must keep some pairs")
    rows.foreach { case (bucket, n, lo, hi) =>
      assert(bucket >= 0 && bucket <= 10)
      assert(n > 0 && lo <= hi)
      assert(lo / 100 == bucket && (hi == 1000 || hi / 100 == bucket),
        s"bucket $bucket range [$lo,$hi] outside its bucket")
    }
    val again = CorpusCuration.lshPrecision(spark, d)
      .as[(Int, Long, Long, Long)].collect()
    assert(rows.toSeq == again.toSeq, "md5 sampling must be deterministic")
  }
}
