package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Behavioral pins for the retrieval/quality/chunking tier — the
  * DuckDB oracle already checks values; these pin the SEMANTICS on
  * crafted inputs (term-stuffed docs rank first, repetitive docs are
  * dropped, chunks tile the token stream with the configured
  * overlap). */
class TextAnalysisSpec extends AnyFunSuite {
  import graft.SparkTestSession._
  import spark.implicits._

  private val d = "/root/testdata/sf0.01"

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("ta").toString
    rows.map { case (id, t) => (id, t, "en", s"src$id", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("bm25: a term-stuffed doc outranks a single-mention doc, " +
      "which outranks a no-mention doc") {
    val filler = "alpha beta gamma delta " * 10
    val dir = writeDocs(Seq(
      (1L, s"spark stream vector spark stream vector spark $filler"),
      (2L, s"spark $filler"),
      (3L, s"$filler epsilon zeta")))
    val rows = TextAnalysis.bm25TopK(spark, dir)
      .select(col("doc_id"), col("rank"), col("n_terms_matched"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val byDoc = rows.map(r => r._1 -> r._2).toMap
    assert(byDoc(1L) == 1, "stuffed doc must rank first")
    assert(byDoc(2L) == 2, "single-mention doc must rank second")
    assert(!byDoc.contains(3L), "zero-score docs never enter the top-k")
    assert(rows.find(_._1 == 1L).get._3 == 3L)
    assert(rows.find(_._1 == 2L).get._3 == 1L)
  }

  test("rake: phrase segmentation at stopwords, degree/freq scoring, " +
      "longer co-occurring phrases outrank singletons") {
    // doc 1: "red fish swim of red fish jump" — stopword 'of' splits
    // two phrases: [red fish swim], [red fish jump].
    // freq: red 2, fish 2, swim 1, jump 1; degree: red 6, fish 6,
    // swim 3, jump 3 → scores (pm): red 3000, fish 3000, swim 3000,
    // jump 3000 → both phrases score 9000; tie broken by text:
    // "red fish jump" < "red fish swim".
    // doc 2: "solo and red" → phrases [solo], [red]:
    // corpus recompute: freq red 3 (degree 6+1=7) → red 2333,
    // solo: freq 1 degree 1 → 1000.
    val dir = writeDocs(Seq(
      (1L, "red fish swim of red fish jump"),
      (2L, "solo and red")))
    val got = TextAnalysis.keywordsRake(spark, dir)
      .as[(Long, Int, String, Long)].collect().toSeq.sortBy(t => (t._1, t._2))
    // recompute scores with doc2 in the corpus:
    // freq: red 3, fish 2, swim 1, jump 1, solo 1
    // degree: red = 3+3+1 = 7, fish = 3+3 = 6, swim 3, jump 3, solo 1
    // score_pm: red 2333, fish 3000, swim 3000, jump 3000, solo 1000
    // doc1 phrases: both 2333+3000+3000 = 8333; doc2: [solo]=1000,
    // [red]=2333
    assert(got == Seq(
      (1L, 1, "red fish jump", 8333L),
      (1L, 2, "red fish swim", 8333L),
      (2L, 1, "red", 2333L),
      (2L, 2, "solo", 1000L)))
  }

  test("bm25: ranks are contiguous from 1 and scores non-increasing") {
    val rows = TextAnalysis.bm25TopK(spark, d)
      .select(col("rank"), col("score_e6")).as[(Int, Long)].collect()
    assert(rows.map(_._1).toSeq == (1 to rows.length))
    assert(rows.map(_._2).toSeq == rows.map(_._2).sortBy(-_).toSeq)
  }

  test("tfidf: a document's unique rare term outranks corpus-wide words") {
    val shared = "common words shared by every document here"
    val dir = writeDocs(Seq(
      (1L, s"$shared zyzzyva zyzzyva"),
      (2L, shared), (3L, shared), (4L, shared)))
    val got = TextAnalysis.tfidfTopTerms(spark, dir)
      .filter(col("doc_id") === 1L && col("rank") === 1)
      .select(col("term")).collect().map(_.getString(0))
    assert(got.toSeq == Seq("zyzzyva"),
      "the term appearing only in doc 1 must be its top keyword")
  }

  test("tfidf: exactly (up to) 3 terms per doc, ranks contiguous") {
    val rows = TextAnalysis.tfidfTopTerms(spark, d)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n"), collect_list(col("rank")).as("rs"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(1) <= 3)
      assert(r.getSeq[Int](2).sorted == (1 to r.getLong(1).toInt))
    }
  }

  test("repetition: a one-word loop is dropped, varied text is kept") {
    val dir = writeDocs(Seq(
      (1L, "spam spam spam spam spam spam spam spam spam spam"),
      (2L, "the quick brown fox jumps over a lazy dog near the river bank")))
    val got = TextAnalysis.repetitionQuality(spark, dir)
      .select(col("doc_id"), col("keep"), col("top_word_ratio"))
      .collect().map(r => r.getLong(0) -> (r.getBoolean(1), r.getDouble(2)))
      .toMap
    assert(!got(1L)._1, "pure repetition must be flagged")
    assert(got(1L)._2 == 1.0)
    assert(got(2L)._1, "varied prose must pass")
  }

  test("chunks: windows tile every token with stride overlap, content checks") {
    val n = 150 // 3 windows at W=64/S=48: [0,64) [48,112) [96,150)
    // letter-only words: the tokenizer splits on non-letter runs, so
    // digit suffixes would collapse every word to "w"
    val words = (0 until n).map(i =>
      s"w${('a' + i / 26).toChar}${('a' + i % 26).toChar}")
    val dir = writeDocs(Seq((7L, words.mkString(" "))))
    val rows = TextAnalysis.chunkWindows(spark, dir)
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))
    assert(rows.map(_._1).toSeq == Seq(0, 1, 2))
    assert(rows.map(_._2).toSeq == Seq(0, 48, 96))
    assert(rows.map(_._3).toSeq == Seq(64, 64, 54))
    // every token index is inside at least one window (no gaps)
    val covered = rows.flatMap(r => r._2 until (r._2 + r._3)).toSet
    assert(covered == (0 until n).toSet)
    // content: md5 of the exact token slice, not just offsets
    val expect = org.apache.commons.codec.digest.DigestUtils
      .md5Hex(words.slice(96, 150).mkString(" "))
    assert(rows.last._4 == expect)
  }

  test("surprisal: rare tokens raise a doc's mean surprisal, exactly") {
    // corpus: aa ×7, zz ×1 → N=8. bits(8)=4; info(aa)=4-bits(7)=1,
    // info(zz)=4-bits(1)=3. doc1 = 4·aa → mean 1000 millibits;
    // doc2 = 3·aa + zz → (3·1+3)·1000 DIV 4 = 1500.
    val dir = writeDocs(Seq((1L, "aa aa aa aa"), (2L, "aa aa aa zz")))
    val got = TextAnalysis.unigramSurprisal(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got(1L) == ((4L, 1000L)))
    assert(got(2L) == ((6L, 1500L)))
  }

  test("collocations: a planted adjacent phrase is mined; independent " +
      "co-occurrence is not") {
    // "neural network" adjacent in 6 docs (cab=6 ≥ 5, lift ≫ 1.1);
    // "alpha"/"beta" appear in every doc but never adjacent to each
    // other in the same order more than independence predicts.
    val fillers = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    val dir = writeDocs((0 until 6).map { i =>
      (i.toLong, s"neural network ${fillers(i)} alpha beta")
    })
    val got = TextAnalysis.collocations(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(got.get(("neural", "network")).contains(6L))
    assert(!got.contains(("network", "alpha")) || got(("network", "alpha")) < 5L)
  }

  test("chunks: a short doc yields exactly one window of its full length") {
    val dir = writeDocs(Seq((1L, "a b c"), (2L, ("x " * 64).trim)))
    val rows = TextAnalysis.chunkWindows(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(3)))
    assert(rows.toSeq == Seq((1L, 0, 3), (2L, 0, 64)))
  }

  test("memorization grams: only cross-doc repeated 3-grams rank; " +
      "occurrences count every instance") {
    val dir = writeDocs(Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma epsilon"),
      (3L, "zeta eta theta iota")))
    val got = TextAnalysis.memorizationGrams(spark, dir)
      .as[(Int, String, Long, Long)].collect().toSeq
    // "alpha beta gamma" spans docs 1 and 2; every other gram is
    // single-doc and filtered
    assert(got == Seq((1, "alpha beta gamma", 2L, 2L)))
  }

  test("quality-dup calibration: totals conserve and the duplicated " +
      "docs' bin carries the dup mass") {
    val longUnique = (1 to 60).map(i => s"word$i unique").mkString(" ")
    val dir = writeDocs(Seq(
      (1L, "tiny dup text"), (2L, "tiny dup text"), // exact dups
      (3L, longUnique + " three"),
      (4L, longUnique + " four")))
    val rows = TextAnalysis.qualityDupCalibration(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(rows.map(_._2).sum == 4L, "every doc lands in one bin")
    assert(rows.map(_._4).sum == 2L, "exactly the two dups counted")
    val dupBins = rows.filter(_._4 > 0)
    assert(dupBins.nonEmpty && dupBins.forall(r =>
      r._5 == 1000L * r._4 / r._2))
  }

  test("readability: hand-counted FK grade on the milli grid; " +
      "wordless docs hit the guards, not a division") {
    // doc 1: 2 sentence runs, 8 words, 8 vowel groups →
    // wps=4000, spw=1000, fk = (390*4000 + 11800*1000)/1000 − 15590
    // = −2230. doc 2 ("???"): sentences floored at 1, 0 words →
    // all ratio columns 0.
    val dir = writeDocs(Seq(
      (1L, "See the dog run. The dog runs fast!"),
      (2L, "???")))
    val got = TextAnalysis.readability(spark, dir)
      .as[(String, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(got == Seq(
      ("src1", 1L, 2L, 8L, 8L, 4000L, 1000L, -2230L),
      ("src2", 1L, 1L, 0L, 0L, 0L, 0L, 0L)))
  }

  test("perplexity sweep: anchors at the corpus mean and admits the " +
      "rare-word doc only at the widest offset") {
    // vocab: aa x14 (bits 1), 2 singletons (bits 4), N=16.
    // doc 1 (8x aa): mean 1000 mb; doc 2 (6 aa + 2 rare): 1750 mb.
    // anchor = (8 + 14) * 1000 / 16 = 1375 -> cuts 1375/1500/1625
    // keep doc 1 only; 1875 admits doc 2.
    val dir = writeDocs(Seq(
      (1L, Seq.fill(8)("aa").mkString(" ")),
      (2L, (Seq.fill(6)("aa") ++ Seq("qq", "zz")).mkString(" "))))
    val got = TextAnalysis.perplexityFilterSweep(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1375L, 1L, 500L, 8L, 500L),
      (1500L, 1L, 500L, 8L, 500L),
      (1625L, 1L, 500L, 8L, 500L),
      (1875L, 2L, 1000L, 16L, 1000L)))
  }

  test("ocr noise: shattered letters, vowelless runs, and mid-word " +
      "case flips are counted exactly; clean prose scores zero") {
    // garbled doc: tokens (t,h,e,brwnfxz,tXt,word) -> 3 singles +
    // 1 consonant run + 1 mid-cap = 5 noisy of 6 -> 833 permille
    val dir = writeDocs(Seq(
      (1L, "the quick brown fox jumps over lazy dogs"),
      (2L, "t h e brwnfxz tXt word")))
    val got = TextAnalysis.ocrNoise(spark, dir)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("src1", 1L, 0L, 0L, 0L),
      ("src2", 1L, 1L, 1000L, 833L)))
  }

  test("code ratio: a code snippet's exact structural density flags " +
      "it; prose scores zero") {
    // len 38; braces 2 + semis 2 + two "\n  " indents = 6 struct
    // chars -> 6000 DIV 38 = 157 permille >= 15 -> code.
    val code = "fn main() {\n  let x = 1;\n  print(x);\n}"
    val prose = "the quick brown fox jumps over the lazy dog"
    val dir = writeDocs(Seq((1L, code), (2L, prose)))
    val got = TextAnalysis.codeRatio(spark, dir)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("src1", 1L, 1L, 1000L, 157L),
      ("src2", 1L, 0L, 0L, 0L)))
  }

  test("bm25 tuning sweep: the default cell reproduces ndcg_eval's " +
      "DCG; b=0 vs b=0.75 disagree on a length-skewed fixture") {
    val filler = "alpha beta gamma delta " * 40
    // doc 1: short, one mention — b=0.75 favors it (length-normalized)
    // doc 2: long, term-stuffed — b=0 favors raw tf
    val dir = writeDocs(Seq(
      (1L, "spark stream"),
      (2L, s"spark spark spark spark stream stream vector vector $filler"),
      (3L, s"vector $filler"),
      (4L, "unrelated words only")))
    val sweep = graft.queries.Retrieval.bm25TuningSweep(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(sweep.map(r => (r._1, r._2)) ==
      Seq((900L, 400L), (1200L, 0L), (1200L, 750L), (1500L, 900L)))
    // every cell's nDCG lands on the [0, 1000] milli grid
    sweep.foreach { c => assert(c._5 >= 0L && c._5 <= 1000L, c) }
    // the default cell is bit-consistent with the standalone eval
    val evalDcg = graft.queries.Retrieval.ndcgEval(spark, dir)
      .select(col("dcg_e6")).as[Long].collect().head
    val cellDcg = sweep.find(c => c._1 == 1200L && c._2 == 750L).get._4
    assert(cellDcg == evalDcg,
      s"sweep default cell $cellDcg != ndcg_eval $evalDcg")
  }
}
