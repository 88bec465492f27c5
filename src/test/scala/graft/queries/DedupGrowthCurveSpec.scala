package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Pins the dedup growth curve's two contracts: the full-corpus level
  * is exact dedup accounting, and the md5-ladder levels nest (each
  * prefix is a subset of the next, so n_docs is monotone and the
  * accounting identity holds at every level). */
class DedupGrowthCurveSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("dgc").toString
    rows.map { case (id, t) => (id, t, "en", s"src$id", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("growth curve: level 4 is exact dedup accounting; levels nest " +
      "monotonically and each row balances") {
    // 40 docs over 30 distinct texts: ids 30..39 repeat texts 0..9.
    val rows = (0L until 40L).map { id =>
      val t = if (id >= 30) s"text ${id - 30}" else s"text ${id}"
      (id, t)
    }
    val d = writeDocs(rows)
    val got = Documents.dedupGrowthCurve(spark, d)
      .as[(Int, Long, Long, Long, Long)].collect().toSeq
    val byLevel = got.map(r => r._1 -> r).toMap
    // full corpus: 40 docs, 30 distinct, 10 dups, 250 permille
    assert(byLevel(4) == (4, 40L, 30L, 10L, 250L))
    // nesting: each level's doc count is <= the next level's
    val sorted = got.sortBy(_._1)
    sorted.sliding(2).foreach {
      case Seq(a, b) => assert(a._2 <= b._2, s"nesting broke: $a -> $b")
      case _ =>
    }
    // per-row accounting: dups = docs - distinct, permille consistent
    got.foreach { case (_, n, dist, dup, pm) =>
      assert(dup == n - dist)
      assert(pm == dup * 1000 / n)
    }
  }
}
