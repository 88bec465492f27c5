package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Pins the leakage-safe split's contracts: the cluster scheme can
  * NEVER leak (both endpoints of any candidate pair share a rep, so
  * a split boundary cannot cross a pair); on an exact-duplicate
  * corpus the two schemes coincide (identical text hashes identically
  * whether per-doc or via the rep); and on the real fixture the naive
  * scheme's leak is large and the audit exposes it. */
class LeakageSafeSplitSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("lss").toString
    rows.map { case (id, t) => (id, t, "en", s"src$id", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("real fixture: cluster scheme leaks zero pairs, naive leaks " +
      "thousands, totals agree") {
    val got = Documents.leakageSafeSplit(spark, "/root/testdata/sf0.001")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val c = got("cluster"); val n = got("naive")
    assert(c._5 == 0L, s"cluster scheme leaked: $c")
    assert(n._5 > 0L, "the synthetic near-dup corpus must leak naively")
    assert(c._2 + c._3 + c._4 == n._2 + n._3 + n._4, "doc totals differ")
  }

  test("exact-duplicate corpus: the two schemes coincide (same text " +
      "hash, whether per-doc or via the representative)") {
    // families are token-DISJOINT so LSH cannot band across them —
    // each family is one exact-dup cluster whose rep text is the
    // members' own text
    // LETTER suffixes: the corpus tokenizer splits on non-letters,
    // so a digit suffix would vanish and collapse every family into
    // one identical token set
    val rows = (0L until 24L).map { id =>
      val k = ('a' + (id % 6).toInt).toChar
      (id, s"alpha$k beta$k gamma$k delta$k")
    }
    val d = writeDocs(rows)
    val got = Documents.leakageSafeSplit(spark, d)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    assert(got("cluster") == got("naive"), s"schemes diverged: $got")
    assert(got("cluster")._4 == 0L)
  }
}
