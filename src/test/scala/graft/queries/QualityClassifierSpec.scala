package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Pins text_quality_classifier's frozen-weight integer logit on a
  * hand-computed doc, plus the two behaviors that make it a gate:
  * junk drops, healthy prose keeps, token-less docs never score. */
class QualityClassifierSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def run(rows: Seq[(Long, String)]) = {
    val dir = java.nio.file.Files.createTempDirectory("qc").toString
    rows.map { case (id, t) => (id, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    TextAnalysis.qualityClassifier(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long, Boolean)].collect()
      .sortBy(_._1)
  }

  test("hand-computed logit: every feature and the decision match") {
    // "the cat of": 3 tokens (cap 3), 8 letters -> mtl (1000*8) DIV 3 =
    // 2666, 2 stopwords -> (1000*2) DIV 3 = 666, 2 spaces of 10 chars
    // -> 200; logit = -1100 + 30 + 2664 + 400 - (1834 DIV 2) = 1077
    val out = run(Seq((0L, "the cat of")))
    assert(out.head == (0L, 3L, 2666L, 666L, 200L, 1077L, true))
  }

  test("long-token junk drops, stopword-bearing prose keeps, " +
      "token-less docs are excluded") {
    val junk = ("zzzzzzzzzzzz " * 30).trim // mtl 12000, zero stopwords
    val prose = ("jumping quickly the of elephant and " * 25).trim
    val out = run(Seq((0L, junk), (1L, prose), (2L, "123 456 --")))
    assert(out.map(_._1).toSeq == Seq(0L, 1L),
      "the letter-less doc has no tokens and must not be scored")
    assert(!out(0)._7, "junk must drop")
    assert(out(1)._7, "healthy prose must keep")
  }
}
