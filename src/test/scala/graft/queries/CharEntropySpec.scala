package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Pins text_char_entropy's bit-length integer grid on hand-computable
  * distributions: zero for a one-symbol doc, exactly 1000 millibits for
  * a uniform 2-symbol doc, 2000 for uniform 4 symbols — and the
  * diversity ordering between them. */
class CharEntropySpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  test("uniform k-symbol docs land exactly on the log2(k) grid") {
    val dir = java.nio.file.Files.createTempDirectory("ce").toString
    Seq((0L, "aaaa"), (1L, "abab"), (2L, "abcd"))
      .map { case (id, t) => (id, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextAnalysis.charEntropy(spark, dir)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    // doc 0: one symbol, k=n=4 -> bitlen(4)-bitlen(4)=0 bits
    assert(rows(0) == (0L, 1L, 4L, 0L))
    // doc 1: two symbols k=2 of n=4 -> each char bitlen(4)-bitlen(2)=1
    assert(rows(1) == (1L, 2L, 4L, 1000L))
    // doc 2: four symbols k=1 of n=4 -> each char bitlen(4)-bitlen(1)=2
    assert(rows(2) == (2L, 4L, 4L, 2000L))
    assert(rows.map(_._4).sameElements(rows.map(_._4).sorted),
      "entropy must increase with symbol diversity")
  }
}
