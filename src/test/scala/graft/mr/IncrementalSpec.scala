package graft.mr

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Incremental (Aggregator) apps must agree with their materializing
  * twins and the sequential oracle. */
class IncrementalSpec extends AnyFunSuite {
  import SparkTestSession._

  private def run(app: IncrementalApp[_]): Seq[String] =
    Incremental.result(spark, app, s"$booksDir/*.txt").collect().toSeq.sorted

  test("incremental wc == materializing wc == oracle") {
    val oracle = MRJob.sequential(Apps.WordCount, booksLocal()).sorted
    assert(run(WordCountInc) == oracle)
    assert(MRJob.sequential(WordCountInc, booksLocal()).sorted == oracle)
  }

  test("incremental indexer == oracle") {
    assert(run(IndexerInc) == MRJob.sequential(Apps.Indexer, booksLocal()).sorted)
  }

  test("incremental credit == oracle over CSV fixtures") {
    val creditFiles = new java.io.File(creditDir).listFiles().sortBy(_.getName)
      .toSeq.map(f => (f.getName,
        new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")))
    val got = Incremental.result(spark, CreditInc, s"$creditDir/*.csv")
      .collect().toSeq.sorted
    assert(got == MRJob.sequential(Apps.Credit, creditFiles).sorted)
  }
}
