package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Semantics of the incremental (new-batch-vs-corpus) dedup join:
  * batch docs that duplicate a corpus doc are flagged with the min
  * matching corpus id, corpus-internal duplicates are NOT re-reported,
  * and unique batch docs stay silent. doc_id % 5 == 4 marks the batch. */
class DedupIncrementalSpec extends AnyFunSuite {
  import graft.SparkTestSession._
  import spark.implicits._

  test("planted batch duplicate is flagged against the corpus, " +
      "corpus-internal and unique docs are not reported") {
    val shared = "alpha beta gamma delta epsilon zeta eta theta " * 5
    val other = "lorem ipsum dolor sit amet consectetur adipiscing elit " * 5
    val rows = Seq(
      (0L, shared),  // corpus
      (1L, shared),  // corpus-internal duplicate of 0 — must NOT appear
      (2L, other),   // corpus
      (4L, shared),  // batch: duplicate of corpus docs 0/1 → dup_of 0
      (9L, "completely unrelated words nothing here matches anything"),
      (14L, other))  // batch: duplicate of corpus doc 2 → dup_of 2
    val dir = java.nio.file.Files.createTempDirectory("inc").toString
    rows.map { case (id, t) => (id, t, "en", s"src$id", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Documents.dedupIncremental(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet == Set(4L, 14L),
      s"only duplicated BATCH docs may be reported, got ${got.keySet}")
    assert(got(4L)._1 == 0L, "dup_of must be the MIN matching corpus doc")
    assert(got(14L)._1 == 2L)
    // identical text ⇒ identical signature ⇒ both bands match both
    // corpus copies, but the disjoint-band union counts each
    // (new, corpus) pair exactly once
    assert(got(4L)._2 == 2L, s"expected 2 candidates (docs 0,1): ${got(4L)}")
    assert(got(14L)._2 == 1L)
  }
}
