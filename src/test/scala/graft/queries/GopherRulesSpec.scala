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
}
