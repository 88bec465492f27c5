package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Pins the candidate→gate→confirm funnel of dedup_edit_confirm: LSH
  * candidates only, the n_chars length-ratio gate BEFORE Levenshtein,
  * and the exact integer similarity/confirmation arithmetic. */
class EditConfirmSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val base =
    "alpha beta gamma delta epsilon zeta eta theta"

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("ec").toString
    rows.map { case (id, t) => (id, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("exact dup is confirmed at sim=1000; a same-token-set reorder " +
      "is a candidate but not confirmed; unrelated docs never pair") {
    val reordered = "beta alpha gamma delta epsilon zeta eta theta"
    val dir = writeDocs(Seq(
      (0L, base), (1L, base), (2L, reordered),
      (3L, "completely different words here nothing shared at all")))
    val out = Documents.dedupEditConfirm(spark, dir)
      .as[(Long, Long, Long, Long, Boolean)].collect()
    val byPair = out.map(r => (r._1, r._2) -> r).toMap
    val exact = byPair((0L, 1L))
    assert(exact._3 == 0 && exact._4 == 1000 && exact._5,
      "identical texts: zero distance, sim 1000, confirmed")
    // same token SET => identical MinHash signature => candidate pair,
    // but the 8-char word swap costs >10% of the 46-char prefix
    for (p <- Seq((0L, 2L), (1L, 2L))) {
      val r = byPair(p)
      assert(!r._5 && r._4 < 900,
        s"reordered candidate $p must be rejected by the confirm stage")
      assert(r._5 == (r._4 >= 900), "confirmed must equal sim >= 900")
    }
    assert(!out.exists(r => r._1 == 3L || r._2 == 3L),
      "doc 3 shares no band with anything — never a candidate")
  }

  test("the length-ratio gate drops a same-signature pair before " +
      "Levenshtein ever runs") {
    // tripling the text preserves the token SET (and so the MinHash
    // signature and every band) but fails |ca-cb|*5 <= max(ca, cb)
    val tripled = (base + " ") * 3
    val dir = writeDocs(Seq((0L, base), (1L, tripled.trim)))
    val cand = Documents.dedupLshPairs(spark, dir).collect()
    assert(cand.length == 1, "the pair IS an LSH candidate")
    val out = Documents.dedupEditConfirm(spark, dir).collect()
    assert(out.isEmpty, "but the metadata gate must exclude it")
  }
}
