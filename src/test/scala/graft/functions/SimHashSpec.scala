package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class SimHashSpec extends AnyFunSuite {
  import SparkTestSession._

  test("expression agrees with the scalar kernel (codegen path)") {
    import spark.implicits._
    GraftFunctions.registerAll(spark)
    val texts = Seq("the quick brown fox", "the quick brown fox!",
      "completely different words here", "", "123 456", "Älter Über")
    val got = texts.toDF("t")
      .select(GraftFunctions.simhash64(col("t"))).as[Long].collect()
    val exp = texts.map(SimHashImpl.simhash64)
    assert(got.toSeq == exp)
  }

  test("SQL surface: simhash64 callable from spark.sql") {
    GraftFunctions.registerAll(spark)
    val r = spark.sql("SELECT simhash64('hello world') AS h").head.getLong(0)
    assert(r == SimHashImpl.simhash64("hello world"))
  }

  test("cross-engine pin: non-ASCII text matches the DuckDB oracle formula") {
    // expected values computed once with DuckDB 1.x from the exact
    // dedup_simhash oracle SQL (md5-nibble bit votes) and the
    // string_split_regex('[^\p{L}]+') tokenizer — pins both the md5
    // token hash and the Unicode tokenizer against regressions.
    val text = "héllo wörld füü42bar Ärger être naïve 中文字 test"
    assert(SimHashImpl.simhash64(text) == 1590223735106831223L)
    val sparkToks = text.split("[^\\p{L}]+").filter(_.nonEmpty).toSeq
    assert(sparkToks == Seq("héllo", "wörld", "füü", "bar", "Ärger",
      "être", "naïve", "中文字", "test"))
  }

  test("near-identical texts land within the hamming threshold") {
    val a = SimHashImpl.simhash64("the quick brown fox jumps over the lazy dog " * 20)
    val b = SimHashImpl.simhash64(("the quick brown fox jumps over the lazy dog " * 20) + "extra")
    assert(java.lang.Long.bitCount(a ^ b) <= 3)
    val c = SimHashImpl.simhash64("entirely unrelated content about spark plans")
    assert(java.lang.Long.bitCount(a ^ c) > 3)
  }

  test("banded LSH candidates == brute force (completeness guarantee)") {
    val d = "/root/testdata/sf0.001"
    val banded = graft.queries.SimHashDedup.dedupSimhash(spark, d).collect().toSeq
    val brute = graft.queries.SimHashDedup.bruteForce(spark, d).collect().toSeq
    assert(banded.map(r => (r.getLong(0), r.getLong(1), r.getInt(2))) ==
      brute.map(r => (r.getLong(0), r.getLong(1), r.getInt(2))))
  }

  test("bit balance: per-bit ones match the collected signature " +
      "population bit-for-bit") {
    import spark.implicits._
    val d = "/root/testdata/sf0.001"
    val shs = graft.queries.SimHashDedup.signatures(spark, d)
      .select(col("sh")).as[Long].collect()
    val got = graft.queries.SimHashDedup.simhashBitBalance(spark, d)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got.map(_._1) == (0L until 64L))
    got.foreach { case (i, ones, sharePm) =>
      val expected = shs.count(sh => ((sh >>> i.toInt) & 1L) == 1L).toLong
      assert(ones == expected, s"bit $i: $ones != $expected")
      assert(sharePm == ones * 1000 / shs.length)
    }
    assert(got.map(_._2).sum ==
      shs.map(java.lang.Long.bitCount(_).toLong).sum)
  }
}
