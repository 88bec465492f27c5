package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Differential pin for the native char_ngram_counts expression: its
  * count maps must match the composed split("")-explode form exactly —
  * including multibyte codepoints (the byte-packed key path AND the
  * >7-byte boxed fallback), empty/short strings, and NUL bytes. */
class CharNgramSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  GraftFunctions.registerAll(spark)

  private def composed(df: org.apache.spark.sql.DataFrame, n: Int) = {
    val cs = split(col("t"), "")
    val len = greatest(size(cs) - (n - 1), lit(0))
    val grams = (2 to n).foldLeft(slice(cs, lit(1), len)) { (acc, i) =>
      zip_with(acc, slice(cs, lit(i), len), (x, y) => concat(x, y))
    }
    df.select(col("id"), explode(grams).as("g"))
      .filter(length(col("g")) === n) // drop the trailing-"" artifacts
      .groupBy(col("id"), col("g")).agg(count(lit(1)).as("k"))
  }

  private def native(df: org.apache.spark.sql.DataFrame, n: Int) =
    df.select(col("id"),
        explode(GraftFunctions.charNgramCounts(col("t"), n)).as(Seq("g", "k")))

  private def check(rows: Seq[(Long, String)], n: Int): Unit = {
    val df = rows.toDF("id", "t")
    val a = native(df, n).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted.toSeq
    val b = composed(df, n).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted.toSeq
    assert(a == b, s"n=$n mismatch")
  }

  private val fixtures = Seq(
    1L -> "abracadabra",
    2L -> "",
    3L -> "x",
    4L -> "aa",
    5L -> "héllo wörld héllo", // 2-byte codepoints
    6L -> "日本語テキスト日本語",  // 3-byte codepoints
    7L -> ("ab" * 300),
    8L -> "a\u0000b\u0000a\u0000b", // NUL bytes must not collide keys
    9L -> "😀😁😀") // 4-byte (surrogate pairs)

  test("bigram counts equal the composed split-explode form " +
      "(ASCII, 2/3/4-byte codepoints, NULs, empties)") {
    check(fixtures, 2)
  }

  test("unigram and trigram counts equal the composed form") {
    check(fixtures, 1)
    check(fixtures, 3)
  }

  test("4-byte codepoint bigrams exercise the 8-byte boxed-key path") {
    // two consecutive 4-byte codepoints = an 8-byte n-gram key — the
    // one case the long-packed fast path cannot hold
    val got = native(Seq(1L -> "😀😁😀😁").toDF("id", "t"), 2)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(got.values.sum == 3L && got.size == 2)
  }

  test("SQL surface: char_ngram_counts is callable and n must be literal") {
    val one = spark.sql(
      "SELECT char_ngram_counts('abab', 2) AS m").head.getMap[String, Long](0)
    assert(one.size == 2)
  }
}
