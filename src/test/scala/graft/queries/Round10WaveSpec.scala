package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Round-10 wave: click→purchase interval join, novelty-effect
  * monitor, conditional char-bigram entropy, degree histogram. */
class Round10WaveSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  test("ev_click_to_purchase: bucketed range join equals the direct " +
      "unbucketed interval join, pair for pair") {
    val got = ProductAnalytics.clickToPurchase(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ev = graft.Tables.events(spark, d)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("pu"),
        col("ts").as("p_ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("cu"),
        col("ts").as("c_ts"))
    val exp = p.join(c, col("pu") === col("cu") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 10 MINUTES") &&
        col("c_ts") < col("p_ts"))
      .select(col("p_id"), col("c_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.nonEmpty && got == exp)
  }

  test("ev_novelty_effect: week cents conserve the purchase total; " +
      "arms partition the active users") {
    val got = ProductAnalytics.noveltyEffect(spark, d)
    val sums = got.agg(
      sum(col("cents_control") + col("cents_treat")).as("c"),
      sum(col("n_control") + col("n_treat")).as("n")).head
    val ev = graft.Tables.events(spark, d)
      .filter(col("event_type") === "purchase")
    val totalCents = ev
      .agg(sum(graft.queries.Relational.cents(col("value")).cast("long")))
      .head.getLong(0)
    assert(sums.getLong(0) == totalCents)
    // n sums (week, arm, user) groups: each active (week,user) counted
    // once in exactly one arm
    val weeks = got.count()
    assert(weeks >= 2 && sums.getLong(1) >= weeks)
    // uplift is the stated integer formula on every row
    got.collect().foreach { r =>
      val (nc, nt) = (r.getLong(1), r.getLong(2))
      val (cc, ct) = (r.getLong(3), r.getLong(4))
      val want =
        if (nc == 0 || nt == 0) 0L
        else ct * 1000000L / nt - cc * 1000000L / nc
      assert(r.getLong(5) == want)
    }
  }

  test("text_bigram_cond_entropy: structured text shows near-zero " +
      "conditional entropy, garble keeps ~H(c1); n_bigram = chars - " +
      "one per doc") {
    val rnd = new scala.util.Random(7)
    val structured = Seq.fill(3)(("ab" * 600)) // H(c2|c1) = 0
    val letters = "abcdefgh"
    val garble = Seq.fill(3)(
      (1 to 1200).map(_ => letters(rnd.nextInt(8))).mkString)
    val dir = java.nio.file.Files.createTempDirectory("bce").toString
    (structured.zipWithIndex.map { case (t, i) =>
      (i.toLong, t, "en", "structured", t.length.toLong)
    } ++ garble.zipWithIndex.map { case (t, i) =>
      (100L + i, t, "en", "garble", t.length.toLong)
    }).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextAnalysis.bigramCondEntropy(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(4))).toMap
    val (nBiS, condS) = rows("structured")
    val (nBiG, condG) = rows("garble")
    // n_bigram = total chars - one per doc (3 docs per source)
    assert(nBiS == 3 * (1200 - 1) && nBiG == 3 * (1200 - 1))
    // "abab...": next char fully determined -> conditional entropy ~0;
    // uniform garble keeps H(c2|c1) ~ H(c1) ~ 3000 millibits
    assert(condS < 200, s"structured cond=$condS")
    assert(condG > 1500, s"garble cond=$condG")
    graft.operators.Materialize.freeAll(spark)
  }

  test("text_lang_id_trigram: confusion mass reconciles with the doc " +
      "count on the fixture (whose lang labels are metadata-only — " +
      "near-uniform confusion IS the audit finding there)") {
    val cells = TextAnalysis.langIdTrigram(spark, d).collect()
    val nDocs = graft.Tables.documents(spark, d).count()
    assert(cells.map(_.getLong(2)).sum == nDocs)
    cells.foreach(r => assert(r.getLong(3) >= 0 && r.getLong(3) <= 1000))
    graft.operators.Materialize.freeAll(spark)
  }

  test("text_lang_id_trigram classifies PLANTED distinct-script docs " +
      "perfectly (incl. a CJK alphabet — the 9-byte boxed-key path)") {
    val rnd = new scala.util.Random(11)
    def salad(letters: String, words: Int): String =
      (1 to words).map(_ =>
        (1 to 2 + rnd.nextInt(5))
          .map(_ => letters(rnd.nextInt(letters.length))).mkString)
        .mkString(" ")
    val latinA = "abcdefghijklm"
    val latinB = "nopqrstuvwxyz"
    val cjk = "数据查询分组排序流窗口合并扫描"
    val docs = (0 until 6).map { i =>
      val (lang, letters) =
        Seq(("aa", latinA), ("bb", latinB), ("cc", cjk))(i % 3)
      val t = salad(letters, 120)
      (i.toLong, t, lang, s"s$i", t.length.toLong)
    }
    val dir = java.nio.file.Files.createTempDirectory("lid").toString
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val cells = TextAnalysis.langIdTrigram(spark, dir).collect()
    cells.foreach { r =>
      assert(r.getString(0) == r.getString(1),
        s"misclassified: $r")
      assert(r.getLong(3) == 1000L)
    }
    graft.operators.Materialize.freeAll(spark)
  }

  test("graph_degree_histogram: node mass and degree mass reconcile " +
      "with the documents table and the pair table") {
    val hist = GraphRank.degreeHistogram(spark, d).collect()
    val nDocs = graft.Tables.documents(spark, d).count()
    assert(hist.map(_.getLong(1)).sum == nDocs)
    val nPairs = Documents.dedupLshPairs(spark, d).count()
    assert(hist.map(_.getLong(4)).sum == 2 * nPairs)
    hist.find(_.getLong(0) == 0L).foreach { r =>
      assert(r.getLong(2) == 0L && r.getLong(3) == 0L)
    }
    // log2 buckets: bucket k holds degrees in [2^(k-1), 2^k)
    hist.filter(_.getLong(0) > 0).foreach { r =>
      val k = r.getLong(0)
      assert(r.getLong(2) >= (1L << (k - 1)) && r.getLong(3) < (1L << k))
    }
    graft.operators.Materialize.freeAll(spark)
  }
}
