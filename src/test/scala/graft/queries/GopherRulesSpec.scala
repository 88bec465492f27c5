package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Pins the Gopher-style rule gate: six planted docs — one clean,
  * five each violating exactly one rule — land in exactly the right
  * per-rule failure column. */
class GopherRulesSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("gr").toString
    rows.map { case (id, t) => (id, t, "en", s"src$id", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("gopher rules: each planted violation trips exactly its rule; " +
      "the clean doc passes") {
    val clean = "the cat sits and waits " + ("word " * 50).trim
    val short = "the and word word"
    val symbol = "the and " + ("word " * 53).trim + " # # # # # #"
    val bullet = "the and " + ("word " * 28).trim + ("\n- word word" * 10)
    val nostop = ("word " * 55).trim
    val meanlen = ("ab " * 53).trim + " the and"
    val d = writeDocs(Seq(1L -> clean, 2L -> short, 3L -> symbol,
      4L -> bullet, 5L -> nostop, 6L -> meanlen))
    val got = Documents.gopherRules(spark, d)
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(got == Seq(
      ("src1", 1L, 0L, 0L, 0L, 0L, 0L, 1L, 1000L),
      ("src2", 1L, 1L, 0L, 0L, 0L, 0L, 0L, 0L),
      ("src3", 1L, 0L, 0L, 1L, 0L, 0L, 0L, 0L),
      ("src4", 1L, 0L, 0L, 0L, 1L, 0L, 0L, 0L),
      ("src5", 1L, 0L, 0L, 0L, 0L, 1L, 0L, 0L),
      ("src6", 1L, 0L, 1L, 0L, 0L, 0L, 0L, 0L)))
  }

  test("a bullet on the FIRST line counts: a 100%-bullet doc trips " +
      "the bullet rule even under the 10-line threshold (ADVICE r9)") {
    // 5 lines, every one a bullet, 60 words, 2 stopwords: before the
    // chr(10)||text prepend fix n_bullet read 4/5 (share 0.8 <= 0.9,
    // no trip); with the first line counted it reads 5/5 and trips
    val line = "- the cat " + ("word " * 10).trim
    val allBullets = Seq.fill(5)(line).mkString("\n")
    val d = writeDocs(Seq(7L -> allBullets))
    val got = Documents.gopherRules(spark, d)
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(got == Seq(("src7", 1L, 0L, 0L, 0L, 1L, 0L, 0L, 0L)))
  }
}
