package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Pins the composed corpus-build pipeline on a planted corpus where
  * every funnel stage's contribution is hand-computable: a
  * quarantined empty doc, an exact-duplicate pair, and 27 distinct
  * low-similarity docs (disjoint vocabularies — jaccard ≈ 0.09, far
  * under the 0.85 confirm) whose split assignment the test
  * recomputes from md5 so stage counts are exact. The oracle gate
  * covers fixture parity; this pins the arithmetic the oracle could
  * only match, not explain. */
class PipelineE2ESpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def split(text: String): String = md5hex(text).head match {
    case 'c' | 'd' => "val"
    case 'e' | 'f' => "test"
    case _         => "train"
  }

  test("planted corpus: quarantine, exact dedup, funnel arithmetic, " +
      "packing invariants") {
    // 14 tokens/doc: 2 stopwords + 12 unique -> score_pm = 142
    // (inside [20,200]), pairwise jaccard 2/26 (below confirm)
    // letters-only words (the tokenizer splits on non-letters, so a
    // digit inside a word would fragment it into shared pieces)
    def alpha(n: Int): String =
      ("" /: Iterator.iterate(n)(_ / 26).takeWhile(_ > 0 || n == 0).take(3)) {
        (acc, v) => acc + ('a' + v % 26).toChar
      } match { case "" => "a"; case x => x }
    def text(i: Int): String =
      "the of " + (0 until 12).map(j => s"w${alpha(i)}x${alpha(j)}q").mkString(" ")
    val docs: Seq[(Long, String, String)] =
      Seq((1L, "", "src0"), (2L, text(99), "src0"), (3L, text(99), "src0")) ++
        (4 to 30).map(i => (i.toLong, text(i), s"src${i % 3}"))
    val dir = java.nio.file.Files.createTempDirectory("pipe").toString
    docs.map { case (id, t, src) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val rows = PipelineE2E.corpusBuild(spark, dir).collect()
    assert(rows.nonEmpty)
    val funnel = rows.head
    assert(funnel.getAs[Long]("n_input") === 30L)
    assert(funnel.getAs[Long]("n_quarantined") === 1L) // the empty doc
    assert(funnel.getAs[Long]("n_after_exact") === 28L) // dup pair -> 1
    // disjoint vocabularies: nothing confirms at jaccard >= 0.85, and
    // no doc has > 16 band-candidates
    assert(funnel.getAs[Long]("n_after_neardup") === 28L)
    assert(funnel.getAs[Long]("n_cand_capped") === 0L)
    // 8-grams contain per-doc-unique words -> no cross-split overlap
    assert(funnel.getAs[Long]("n_contaminated") === 0L)
    // survivors: doc 2 (dup representative) + docs 4..30; quality
    // passes for all (score 142); selection = train-split survivors
    // (126 tokens/source max, under the 250 budget)
    val survivors = Seq(2L -> text(99)) ++
      (4 to 30).map(i => i.toLong -> text(i))
    val expTrain = survivors.count { case (_, t) => split(t) == "train" }
    assert(funnel.getAs[Long]("n_after_quality") === expTrain.toLong)
    assert(funnel.getAs[Long]("n_selected") === expTrain.toLong)
    // packing: per-sequence docs sum back to the selection; budget
    // respected (single-doc overflow is the only allowed excess);
    // (shard, seq_id) keys unique
    assert(rows.map(_.getAs[Long]("n_docs")).sum === expTrain.toLong)
    assert(rows.map(_.getAs[Long]("seq_tokens")).sum === 14L * expTrain)
    rows.foreach { r =>
      val tokens = r.getAs[Long]("seq_tokens")
      assert(tokens <= PipelineE2E.SeqBudget || r.getAs[Long]("n_docs") === 1L)
    }
    val keys = rows.map(r => (r.getAs[Long]("shard"), r.getAs[Long]("seq_id")))
    assert(keys.distinct.length === keys.length)
  }

  test("quality band drops stopword-free and stopword-saturated docs") {
    // doc 40: zero stopwords (score 0 < 20); doc 41: all stopwords
    // (score 1000 > 200); doc 42: in-band
    def uw(i: Int, n: Int) =
      (0 until n).map(j => s"q${('a' + i % 26).toChar}z${('a' + j % 26).toChar}").mkString(" ")
    val docs = Seq(
      (40L, uw(40, 14), "srcA"),
      (41L, "the of and a to the of and a to the of and a", "srcA"),
      (42L, "the of " + uw(42, 12), "srcA"))
    val dir = java.nio.file.Files.createTempDirectory("pipeq").toString
    docs.map { case (id, t, src) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = PipelineE2E.corpusBuild(spark, dir).collect()
    val inBand = Seq(40L -> uw(40, 14),
      41L -> "the of and a to the of and a to the of and a",
      42L -> ("the of " + uw(42, 12)))
      .filter { case (_, t) => split(t) == "train" }
    // only doc 42 can pass quality, and only if it drew train
    val expSel = inBand.count(_._1 == 42L).toLong
    if (expSel == 0L) assert(rows.isEmpty)
    else {
      assert(rows.head.getAs[Long]("n_after_quality") === expSel)
      assert(rows.map(_.getAs[Long]("n_docs")).sum === expSel)
    }
  }
}
