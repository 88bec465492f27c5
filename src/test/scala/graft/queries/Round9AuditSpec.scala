package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Pins the round-9 audit wave: per-source boilerplate detection on a
  * planted template, packing-sweep consistency with the registered
  * single-budget packer, and the hubness histogram's conservation
  * laws. */
class Round9AuditSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("boilerplate: a 4-gram shared by 3 docs of one source is " +
      "flagged there and nowhere else") {
    val boiler = "alpha beta gamma delta"
    val docs = Seq(
      (1L, s"$boiler unique aaa bbb ccc", "srcA"),
      (2L, s"intro words $boiler ddd eee", "srcA"),
      (3L, s"$boiler fff ggg hhh iii", "srcA"),
      (4L, "totally different text with no repeats at all", "srcA"),
      // same phrase in ONE doc of srcB: no within-source repeat
      (5L, s"$boiler jjj kkk lll", "srcB"),
      (6L, "another singleton document here", "srcB"))
    val dir = java.nio.file.Files.createTempDirectory("boiler").toString
    docs.map { case (id, t, src) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = CorpusCuration.boilerplateShingles(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    val (aDocs, aSh, aMax, aAff, aPm) = got("srcA")
    assert(aDocs == 4L && aSh == 1L && aMax == 3L && aAff == 3L && aPm == 750L)
    val (bDocs, bSh, bMax, bAff, bPm) = got("srcB")
    assert(bDocs == 2L && bSh == 0L && bMax == 0L && bAff == 0L && bPm == 0L)
  }

  test("pack sweep at budget 256 agrees with text_pack_sequences") {
    val sweep = TextPipeline.packEfficiency(spark, sf)
      .filter(col("budget") === 256L).collect().head
    val single = TextPipeline.packSequences(spark, sf)
    val nSeqs = single.select(col("shard"), col("seq_id")).distinct().count()
    val tokens = single.agg(sum(col("n_tokens"))).head.getLong(0)
    assert(sweep.getAs[Long]("n_seqs") === nSeqs)
    assert(sweep.getAs[Long]("packed_tokens") === tokens)
    // utilization + waste are complementary permilles (integer floor:
    // the pair can undershoot 1000 by at most 1)
    val u = sweep.getAs[Long]("util_pm"); val w = sweep.getAs[Long]("waste_pm")
    assert(u + w <= 1000L && u + w >= 998L)
  }

  test("hubness histogram conserves neighbor slots and vectors") {
    val hist = EmbeddingAudit.hubnessAudit(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val e = graft.Tables.embeddings(spark, sf)
    val nVecs = e.count()
    val nQueries =
      e.filter(col("vec_id") % 50 === 0 && col("vec_id") < 51200).count()
    // every vector lands in exactly one occurrence bucket
    assert(hist.map(_._2).sum === nVecs)
    // every query hands out exactly 5 neighbor slots
    assert(hist.map { case (occ, n) => occ * n }.sum === 5L * nQueries)
    assert(hist.exists { case (occ, n) => occ == 0L && n > 0L },
      "a 1k-vector corpus with 20 queries must have antihubs")
  }
}
