package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

/** Invariant pins for the tokenizer-training / LM-scoring / span-
  * removal tier (the DuckDB oracle checks exact rows; these check the
  * PROPERTIES that make the answers right, so a future rewrite can't
  * be accidentally-equal). */
class TokenizerOpsSpec extends AnyFunSuite {
  import SparkTestSession._

  private val d = "/root/testdata/sf0.01"

  test("bpe_merge_round: pair counts match a brute per-occurrence " +
      "recount, ranks are 1..20 and count-descending") {
    import spark.implicits._
    val rows = TokenizerOps.bpeMergeRound(spark, d)
      .as[(Int, String, String, Long)].collect()
    assert(rows.map(_._1).toSeq == (1 to 20))
    assert(rows.map(_._4).toSeq == rows.map(_._4).sorted.reverse.toSeq,
      "rank order must be pair_count-descending")
    // brute recount: explode EVERY word occurrence (not the vocab) —
    // weighted-vocab and per-occurrence counting must agree exactly
    val brute = graft.Tables.documents(spark, d)
      .select(explode(Documents.tokens(col("text"))).as("w"))
      .filter(length(col("w")) >= 2)
      .select(col("w"), explode(sequence(lit(1), length(col("w")) - 1)).as("i"))
      .select(expr("substring(w, i, 1)").as("a"),
        expr("substring(w, i + 1, 1)").as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("c"))
      .as[(String, String, Long)].collect()
      .map { case (a, b, c) => (a, b) -> c }.toMap
    rows.foreach { case (_, a, b, c) =>
      assert(brute((a, b)) == c, s"pair ($a,$b) weighted count diverged")
    }
  }

  test("bigram_perplexity: surprisal is non-negative, zero iff every " +
      "context is deterministic, and matches a brute recount") {
    import spark.implicits._
    val rows = TokenizerOps.bigramPerplexity(spark, d)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (doc, n, bits, milli) =>
      assert(bits >= 0, s"doc $doc negative surprisal")
      assert(milli == 1000 * bits / n, s"doc $doc millibits mismatch")
    }
    // brute: recompute one doc's surprisal from raw corpus counts
    val bi = graft.Tables.documents(spark, d)
      .select(col("doc_id"), Documents.tokens(col("text")).as("ws"))
      .as[(Long, Seq[String])].collect()
      .flatMap { case (id, ws) => ws.sliding(2).collect {
        case Seq(a, b) => (id, a, b) } }
    val ctx = bi.groupBy(_._2).map { case (k, v) => k -> v.length.toLong }
    val bc = bi.groupBy(t => (t._2, t._3))
      .map { case (k, v) => k -> v.length.toLong }
    def bits(x: Long) = 64 - java.lang.Long.numberOfLeadingZeros(x)
    val byDoc = bi.groupBy(_._1)
    rows.take(50).foreach { case (doc, n, got, _) =>
      val mine = byDoc(doc)
        .map { case (_, a, b) => (bits(ctx(a)) - bits(bc((a, b)))).toLong }
        .sum
      assert(byDoc(doc).length == n && mine == got,
        s"doc $doc brute surprisal $mine != $got")
    }
  }

  test("dedup_span_rewrite: kept <= total, rewrite drops EXACTLY the " +
      "cross-doc duplicated 3-gram cover, unique docs are untouched") {
    import spark.implicits._
    val rows = TokenizerOps.spanRewrite(spark, d)
      .as[(Long, Long, Long, String)].collect()
    val emptyMd5 = java.security.MessageDigest.getInstance("MD5")
      .digest(Array.emptyByteArray).map("%02x".format(_)).mkString
    rows.foreach { case (doc, n, kept, md5) =>
      assert(kept <= n, s"doc $doc kept more tokens than it has")
      if (kept == 0) assert(md5 == emptyMd5, s"doc $doc empty-md5 mismatch")
    }
    // a doc whose grams are ALL unique must survive byte-identical
    val docs = graft.Tables.documents(spark, d)
      .select(col("doc_id"), Documents.tokens(col("text")).as("ws"))
      .as[(Long, Seq[String])].collect()
    val gramOwners = docs.flatMap { case (id, ws) =>
      ws.sliding(3).filter(_.size == 3).map(g => (g.mkString(" "), id)) }
      .groupBy(_._1).map { case (g, v) => g -> v.map(_._2).distinct }
    val keptOf = rows.map(r => r._1 -> r._3).toMap
    var untouched = 0
    docs.foreach { case (id, ws) =>
      val sharesAGram = ws.sliding(3).filter(_.size == 3)
        .exists(g => gramOwners(g.mkString(" ")).exists(_ != id))
      if (!sharesAGram && ws.nonEmpty) {
        assert(keptOf(id) == ws.size, s"unique doc $id was rewritten")
        untouched += 1
      }
    }
    // the synthetic corpus is template-heavy: most docs share SOME
    // gram, but the invariant above must have fired at least once to
    // mean anything — if it never does, the assertion is vacuous
    assert(rows.exists(r => r._3 < r._2),
      "no doc lost tokens — dup detection is broken")
  }

  test("rrf_fusion: fused score is the exact integer RRF of the two " +
      "ranked lists, and single-list docs get one term") {
    import spark.implicits._
    val rows = Retrieval.rrfFusion(spark, d)
      .as[(Int, Long, Option[Int], Option[Int], Long)].collect()
    assert(rows.map(_._1).toSeq == (1 to rows.length), "ranks contiguous")
    rows.foreach { case (_, id, lex, sem, rrf) =>
      val expect = lex.map(r => 1000000L / (60 + r)).getOrElse(0L) +
        sem.map(r => 1000000L / (60 + r)).getOrElse(0L)
      assert(rrf == expect, s"doc $id rrf $rrf != $expect")
      assert(lex.nonEmpty || sem.nonEmpty, s"doc $id in neither list")
    }
    assert(rows.map(_._5).toSeq == rows.map(_._5).sorted.reverse.toSeq,
      "output must be fused-score-descending")
  }

  test("bpe_train: distributed 8-round trainer matches sequential BPE " +
      "(mrsequential-style differential)") {
    import spark.implicits._
    // same word counts the distributed trainer starts from
    val wc = graft.Tables.documents(spark, d)
      .select(org.apache.spark.sql.functions.explode(
        Documents.tokens(org.apache.spark.sql.functions.col("text")))
        .as("word"))
      .groupBy("word").count()
      .as[(String, Long)].collect().toSeq
    val expect = TokenizerOps.bpeTrainSequential(wc, rounds = 8)
    val got = TokenizerOps.bpeTrain(spark, d)
      .as[(Int, String, String, Long)].collect().toSeq
    graft.operators.Materialize.freeAll(spark)
    assert(got == expect)
    // merged symbols must actually compound: later rounds may merge a
    // previous round's output (multi-char symbol on either side) —
    // assert the trainer produced 8 rounds and strictly positive counts
    assert(got.map(_._1) == (1 to 8))
    assert(got.forall(_._4 > 0))
  }
}
