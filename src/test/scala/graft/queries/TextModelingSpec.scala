package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Pins the LM-estimation tier: Kneser–Ney hand-computed on a 3-doc
  * corpus (including the near-1.0 probability-mass check), novelty's
  * first-occurrence semantics, and count–min's one-sided error
  * guarantee (estimates never undercount). */
class TextModelingSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("tm").toString
    rows.map { case (id, t) => (id, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("kneser-ney: hand-computed probabilities on a 3-bigram corpus; " +
      "per-history mass sums to ~1e9") {
    // bigrams: (a,b) x2, (a,c) x1 → c1(a)=3, N1+(a·)=2,
    // N1+(·b)=N1+(·c)=1, T=2.
    // p(b|a) = (2−.75)/3 + (.75·2/3)(1/2) = .41666… + .25 = .66666…
    // p(c|a) = (1−.75)/3 + .25            = .08333… + .25 = .33333…
    val d = writeDocs(Seq((0L, "a b"), (1L, "a b"), (2L, "a c")))
    val got = TextModeling.kneserNey(spark, d)
      .as[(String, String, Long, Long, Long, Long, Long)]
      .collect().map(r => ((r._1, r._2), r._7)).toMap
    assert(got(("a", "b")) == 666666666L)
    assert(got(("a", "c")) == 333333333L)
    assert(got.values.sum == 999999999L) // mass ≈ 1 (truncation only)
  }

  test("novelty: the first document owns all its grams; an exact " +
      "duplicate scores zero") {
    val d = writeDocs(Seq(
      (0L, "x y z w"),   // grams: "x y z", "y z w" — all first here
      (1L, "x y z w"),   // same grams, later doc_id → nothing novel
      (2L, "x y z q")))  // "x y z" seen; "y z q" new → 500 permille
    val got = TextModeling.ngramNovelty(spark, d)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (0L, 2L, 2L, 1000L),
      (1L, 2L, 0L, 0L),
      (2L, 2L, 1L, 500L)))
  }

  test("count-min: estimates NEVER undercount, and a planted heavy " +
      "word survives the exact confirm") {
    // "heavy" appears 300 times of ~400 tokens → est ≥ 300 ≥ 0.5% bar;
    // 100 distinct rare words provide collision fodder.
    val fill = (0 until 100).map(i => s"w$i").mkString(" ")
    val d = writeDocs(Seq((0L, (Seq.fill(300)("heavy") :+ fill).mkString(" "))))
    val rows = TextModeling.countMinConfirm(spark, d)
      .as[(String, Long, Long, Long, Boolean)].collect().toSeq
    assert(rows.exists(r => r._1 == "heavy" && r._3 == 300L && r._5))
    rows.foreach { r =>
      assert(r._2 >= r._3, s"CMS undercounted ${r._1}: est ${r._2} < ${r._3}")
      assert(r._4 >= 0L)
    }
  }
}
