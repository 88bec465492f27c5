package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Pins the prefix-filter set-similarity join: planted threshold
  * boundaries, cross-source side discipline, and the NO-MISSED-PAIRS
  * guarantee differentially against the brute-force definition on
  * real fixture data. */
class PrefixFilterJoinSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def docsDF(rows: Seq[(Long, String, String)]) =
    rows.map { case (id, text, src) =>
      (id, text, "en", src, text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")

  test("threshold boundary (self form): J=1 kept, J=2/3 dropped, " +
      "J=4/5 kept (>= is inclusive)") {
    val docs = docsDF(Seq(
      (1L, "alpha beta gamma delta epsilon", "s"),
      (2L, "alpha beta gamma delta epsilon", "s"), // J(1,2)=1
      (3L, "alpha beta gamma delta zeta", "s"),    // J(1,3)=4/6 → out
      (4L, "alpha beta gamma delta", "s")))        // J(1,4)=J(3,4)=4/5
    val got = PrefixFilterJoin.selfPairs(docs)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 1000L), (1L, 4L, 800L), (2L, 4L, 800L),
      (3L, 4L, 800L)))
  }

  test("cross-source form: same-source duplicates are NOT reported; " +
      "only src0 x src1 pairs are") {
    val dir = java.nio.file.Files.createTempDirectory("pf").toString
    docsDF(Seq(
      (1L, "alpha beta gamma delta epsilon", "src0"),
      (2L, "alpha beta gamma delta epsilon", "src0"), // same-source dup
      (3L, "alpha beta gamma delta epsilon", "src1"), // cross dup of 1,2
      (4L, "unrelated words entirely here now", "src1"),
      (5L, "alpha beta gamma delta epsilon", "src9"))) // excluded source
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = PrefixFilterJoin.crossSourcePairs(spark, dir)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 3L, 1000L), (2L, 3L, 1000L)))
  }

  test("no missed pairs: prefix-filtered self form == brute-force " +
      "definition on sf0.001") {
    val d = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, d)
    val got = PrefixFilterJoin.selfPairs(docs)
      .as[(Long, Long, Long)].collect().toSet
    // brute force from the definition: every shared-token pair, exact
    // Jaccard, threshold — no pruning anywhere
    val tok = docs
      .select(col("doc_id"), explode(Documents.tokens(col("text")))
        .as("token")).distinct()
    val sized = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("nt"))
    val brute = tok.as("a").join(tok.as("b"), Seq("token"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("c"))
      .join(sized.select(col("doc_id").as("doc_a"), col("nt").as("na")),
        Seq("doc_a"))
      .join(sized.select(col("doc_id").as("doc_b"), col("nt").as("nb")),
        Seq("doc_b"))
      .withColumn("jaccard_permille", expr("1000 * c DIV (na + nb - c)"))
      .filter(col("jaccard_permille") >= 800)
      .select(col("doc_a"), col("doc_b"), col("jaccard_permille"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == brute,
      s"missed=${(brute -- got).take(5)} extra=${(got -- brute).take(5)}")
    assert(got.nonEmpty, "fixture should contain J>=0.8 pairs")
  }
}
