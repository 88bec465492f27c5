package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Pins the LSH recall audit: exact duplicates are J=1000 truth pairs
  * AND guaranteed LSH candidates (identical signatures share every
  * band), so recall must be exactly 1000 at every threshold; the
  * threshold ladder must be monotone. */
class LshRecallSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("lr").toString
    rows.map { case (id, t) => (id, t, "en", s"src$id", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("lsh recall: identical-copy truth pairs are all found (1000 " +
      "permille); the threshold ladder is monotone") {
    val dupText = "alpha beta gamma delta epsilon zeta eta theta"
    val rows = (0L until 30L).map(id => (id, dupText)) ++
      (30L until 60L).map(id =>
        (id, s"unique${id} solitary${id} words${id} only${id} here${id}"))
    val d = writeDocs(rows)
    val got = CorpusCuration.lshRecall(spark, d)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got.map(_._1) == Seq(500L, 700L, 850L, 950L))
    // at least two of the 30 copies land in the md5 sample
    assert(got.head._3 > 0, s"truth set empty: $got")
    got.foreach { case (t, _, nTrue, nHit, rec) =>
      assert(nHit == nTrue, s"threshold $t missed pairs: $got")
      if (nTrue > 0) assert(rec == 1000L)
    }
    // monotone: raising the threshold cannot grow the truth set
    got.map(_._3).sliding(2).foreach {
      case Seq(a, b) => assert(a >= b)
      case _ =>
    }
  }
}
