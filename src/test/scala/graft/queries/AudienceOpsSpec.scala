package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Pins the audience tier's semantics on planted fixtures: the
  * seasonality permille grid, distinct-before-join overlap counting,
  * survivorship's (n_chars DESC, doc_id ASC) canonical pick, and the
  * PCA power iteration recovering a planted dominant axis. */
class AudienceOpsSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  private def writeEvents(
      rows: Seq[(Long, java.sql.Timestamp, Long, String, Double, String)])
      : String = {
    val dir = java.nio.file.Files.createTempDirectory("au").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("seasonality: per-type hourly counts and the 24x permille index") {
    // type a: 3 events in hour 0, 1 in hour 1; type b: 1 event hour 5
    val d = writeEvents(Seq(
      (1L, ts(60), 1L, "a", 0.0, "{}"),
      (2L, ts(120), 2L, "a", 0.0, "{}"),
      (3L, ts(180), 3L, "a", 0.0, "{}"),
      (4L, ts(3660), 1L, "a", 0.0, "{}"),
      (5L, ts(5 * 3600 + 1), 1L, "b", 0.0, "{}")))
    val got = AudienceOps.seasonalityProfile(spark, d)
      .as[(String, Int, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("a", 0, 3L, 18000L), // 3*24000/4
      ("a", 1, 1L, 6000L),  // 1*24000/4
      ("b", 5, 1L, 24000L)))
  }

  test("audience overlap: duplicate events collapse before the join; " +
      "jaccard permille is exact") {
    // a-users {1,2,3} (user 3 twice), b-users {2,3}
    val d = writeEvents(Seq(
      (1L, ts(0), 1L, "a", 0.0, "{}"),
      (2L, ts(1), 2L, "a", 0.0, "{}"),
      (3L, ts(2), 3L, "a", 0.0, "{}"),
      (4L, ts(3), 3L, "a", 0.0, "{}"),
      (5L, ts(4), 2L, "b", 0.0, "{}"),
      (6L, ts(5), 3L, "b", 0.0, "{}")))
    val got = AudienceOps.audienceOverlap(spark, d)
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    // both=2, |a|=3, |b|=2, union=3 → 2000/3 = 666
    assert(got == Seq(("a", "b", 2L, 3L, 2L, 666L)))
  }

  test("survivorship: canonical is (n_chars DESC, doc_id ASC); drops " +
      "attribute to the loser's source") {
    val dir = java.nio.file.Files.createTempDirectory("au").toString
    Seq(
      (1L, "xx", "en", "s1", 2L),
      (2L, "xx", "en", "s2", 2L), // same text, higher doc_id → dropped
      (3L, "yy", "en", "s1", 2L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = AudienceOps.dedupSurvivorship(spark, dir)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("s1", 2L, 2L, 0L, 0L),
      ("s2", 1L, 0L, 1L, 2L)))
  }

  test("forecast backtest: scores only cells with BOTH predecessors; " +
      "negative improvement when seasonal loses") {
    def at(day: Int, hr: Int, k: Int) = ts(day * 86400L + hr * 3600L + k)
    // type a — day1 hr1 is the only scored cell: naive err 0, seasonal 1
    // type b — day1 hr1 scored: naive err 1, seasonal err 3 (worse)
    var id = 0L
    def burst(n: Int, day: Int, hr: Int, u: Long, t: String) =
      (0 until n).map { k => id += 1; (id, at(day, hr, k), u, t, 0.0, "{}") }
    val d = writeEvents(
      burst(2, 0, 0, 1L, "a") ++ burst(4, 0, 1, 1L, "a") ++
        burst(3, 1, 0, 1L, "a") ++ burst(3, 1, 1, 1L, "a") ++
        burst(1, 0, 0, 2L, "b") ++ burst(5, 0, 1, 2L, "b") ++
        burst(1, 1, 0, 2L, "b") ++ burst(2, 1, 1, 2L, "b"))
    val got = AudienceOps.forecastBacktest(spark, d)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("a", 1L, 0L, 1000L, 0L),       // sn=0 → improvement clamps to 0
      ("b", 1L, 1000L, 3000L, -2000L)))
  }

  test("pca power iteration recovers a planted dominant axis") {
    val dir = java.nio.file.Files.createTempDirectory("au").toString
    val dims = 8
    // 40 vectors hugging +dim2 (value 0.5) with tiny per-dim jitter;
    // all-positive mass so the all-ones start is not orthogonal
    val rows = (0 until 40).map { i =>
      val v = Array.tabulate(dims)(j =>
        if (j == 2) 0.5f else 0.001f * ((i + j) % 3))
      (i.toLong, v, i % 4)
    }
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = EmbeddingAudit.pcaPower(spark, dir)
      .as[(Int, Long)].collect().toMap
    assert(got.size == dims)
    val top = got.maxBy { case (_, l) => math.abs(l) }
    assert(top._1 == 2, s"dominant loading should be dim 2, got $got")
    // renormalized grid: the dominant component sits at ~±1e6 and
    // every other dim is at least 10x smaller on this fixture
    assert(math.abs(top._2) >= 900000L)
    got.filter(_._1 != 2).foreach { case (dim, l) =>
      assert(math.abs(l) < math.abs(top._2) / 10,
        s"dim $dim loading $l not dominated")
    }
  }
}
