package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Pins the corpus-statistics tier: Zipf's OLS on the micro-nat grid
  * recovers a planted exact power law, JS divergence is exactly zero
  * for a single-source corpus (p ≡ q makes every log term cancel
  * BEFORE flooring), Heaps checkpoints count first-occurrences, and
  * the pair-distance histogram's md5 sample is deterministic. */
class CorpusStatsSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def writeDocs(rows: Seq[(Long, String, String, String, Long)])
      : String = {
    val dir = java.nio.file.Files.createTempDirectory("cs").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("zipf: planted 1/rank law fits slope -1000 milli") {
    // freq(rank r) = 1024/r for r=1..8 over distinct words: exact
    // power law with slope -1. Words chosen so count order == plant.
    val words = Seq("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    val text = words.zipWithIndex.flatMap { case (w, i) =>
      Seq.fill(1024 / (i + 1))(w)
    }.mkString(" ")
    val d = writeDocs(Seq((0L, text, "en", "s0", text.length.toLong)))
    val got = CorpusStats.zipfSlope(spark, d)
      .as[(Long, Long, Long)].collect().head
    assert(got._1 == 8L)
    // grid flooring perturbs the fit by < 1 milli-unit around -1.000
    assert(math.abs(got._2 - 1000L) <= 1L,
      s"neg_slope_milli=${got._2} not within 1 of 1000")
  }

  test("JS divergence: single source == corpus, exactly zero") {
    val d = writeDocs(Seq(
      (0L, "alpha beta beta gamma", "en", "only", 21L),
      (1L, "alpha alpha delta", "en", "only", 17L)))
    val got = CorpusStats.jsDivergence(spark, d)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("only", 7L, 0L, 0L, 0L)))
  }

  test("JS divergence: disjoint vocabularies produce symmetric drift") {
    val d = writeDocs(Seq(
      (0L, "aa aa aa aa", "en", "s1", 11L),
      (1L, "bb bb bb bb", "en", "s2", 11L)))
    val got = CorpusStats.jsDivergence(spark, d)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // p=(1,0), q=(.5,.5): m(own)=3/4, m(other)=1/4
    // KL(p||m) = ln(4/3); KL(q||m) = .5 ln(2/3) + .5 ln2 = .5 ln(4/3)
    // per-source identical by symmetry; grid within 2 micro of truth
    val klp = 287682L; val klq = 143841L
    for (s <- Seq("s1", "s2")) {
      assert(math.abs(got(s)._3 - klp) <= 2, s"klp ${got(s)._3}")
      assert(math.abs(got(s)._4 - klq) <= 2, s"klq ${got(s)._4}")
    }
    assert(got("s1")._5 == got("s2")._5)
  }

  test("heaps: vocabulary counted at first occurrence, deciles cover") {
    // 10 docs (ids 0..9): doc i introduces exactly one new word and
    // repeats the base word -> vocab at decile k is exactly k. Words
    // are pure letters (the tokenizer drops digits: "w0" -> "w").
    val rows = (0 until 10).map { i =>
      val w = "w" + ('a' + i).toChar
      val t = if (i == 0) "wa wa" else s"wa $w"
      (i.toLong, t, "en", "s", t.length.toLong)
    }
    val d = writeDocs(rows)
    val got = CorpusStats.heapsCheckpoints(spark, d)
      .as[(Int, Long, Long, Long, Long)].collect().toSeq
    assert(got.size == 10)
    // decile k: thr=k docs -> tokens 2k, vocab = k (w0 + k-1 new)
    got.foreach { case (dec, nDocs, nTok, vocab, _) =>
      assert(nDocs == dec.toLong && nTok == 2L * dec && vocab == dec.toLong)
    }
  }

  test("ttr: all-distinct vs one-word sources hit exact permille grid") {
    // "rich": 4 tokens, 4 types, 4 hapax -> ttr=1000pm, hapax=1000pm
    // "spam": 5 tokens of one word -> ttr=200pm, hapax=0; both have
    // 2-char words so mean_word_len_milli = 2000 for each.
    val d = writeDocs(Seq(
      (0L, "aa bb cc dd", "en", "rich", 11L),
      (1L, "zz zz zz zz zz", "en", "spam", 14L)))
    val got = CorpusStats.ttrBySource(spark, d)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("rich", 4L, 4L, 1000L, 1000L, 2000L),
      ("spam", 5L, 1L, 200L, 0L, 2000L)))
  }

  test("vocab coverage: top-100 mass counted over a 151-type corpus, " +
      "larger checkpoints saturate at 1000") {
    // "aa" x50 + 150 distinct singletons: top-100 = aa + 99 singles
    // = 149 of 200 tokens -> 745 pm; 1k/10k cover everything.
    val singles = (0 until 150).map(i =>
      "" + ('b' + i / 26).toChar + ('a' + i % 26).toChar)
    assert(singles.distinct.size == 150 && !singles.contains("aa"))
    val d = writeDocs(Seq(
      (0L, Seq.fill(50)("aa").mkString(" "), "en", "s", 149L),
      (1L, singles.mkString(" "), "en", "s", 449L)))
    val got = CorpusStats.vocabCoverage(spark, d)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((200L, 151L, 745L, 1000L, 1000L)))
  }

  test("burstiness: a uniform word scores 1000 milli, a one-doc " +
      "spam word shows its concentration; df<5 words are floored out") {
    // "the": once in each of 5 docs -> burst 1000, share 200.
    // "spam": 1,1,1,1,16 -> tf 20, burst 4000, top-doc share 800.
    // "rare" appears in 1 doc -> filtered by df >= 5.
    val rows = (0L until 4L).map(i =>
      (i, "the spam", "en", "s", 8L)) :+
      (4L, "the rare " + Seq.fill(16)("spam").mkString(" "), "en", "s", 88L)
    val d = writeDocs(rows)
    val got = CorpusStats.burstiness(spark, d)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("spam", 20L, 5L, 4000L, 16L, 800L),
      ("the", 5L, 5L, 1000L, 1L, 200L)))
  }

  test("pair-distance hist: md5 sample membership is deterministic") {
    // compute which ids 0..63 pass the 1/8 md5 gate, plant vectors so
    // sampled pair distances are known; with >=2 sampled ids the hist
    // covers all pairs of the sample
    def u16(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 4), 16)
    }
    val ids = (0L until 64L).filter(u16(_) % 8 == 0)
    assert(ids.size >= 2, s"need >=2 sampled ids, got $ids")
    val dir = java.nio.file.Files.createTempDirectory("cs").toString
    val rows = (0L until 64L).map { i =>
      (i, Array(i.toFloat, 0f), i.toInt % 3)
    }
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = EmbeddingAudit.pairDistanceHist(spark, dir)
      .selectExpr("SUM(n_pairs)").as[Long].collect().head
    val expected = ids.size.toLong * (ids.size - 1) / 2
    assert(got == expected)
  }
}
