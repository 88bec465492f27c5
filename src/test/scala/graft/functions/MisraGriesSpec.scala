package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Pins for the native Misra–Gries TypedImperativeAggregate: the
  * frequency guarantee under adversarial partitioning, exactness when
  * the vocabulary fits in k, and the SQL registration path. */
class MisraGriesSpec extends AnyFunSuite {
  import graft.SparkTestSession._
  import spark.implicits._

  private def candidates(items: Seq[String], k: Int, parts: Int): Set[String] =
    items.toDF("w").repartition(parts)
      .agg(GraftFunctions.misraGries(col("w"), k).as("c"))
      .collect().head.getSeq[String](0).toSet

  test("guarantee: every item with freq > n/(k+1) survives, for any " +
      "partitioning") {
    // 3 heavy items at 300 each + 1100 singletons: n = 2000, k = 10
    // → threshold n/11 ≈ 182; the singletons exist to force the
    // decrement path (vocab 1103 ≫ k)
    val heavy = Seq("h1", "h2", "h3").flatMap(h => Seq.fill(300)(h))
    val noise = (0 until 1100).map(i => s"noise$i")
    val items = scala.util.Random.shuffle(heavy ++ noise)
    for (parts <- Seq(1, 3, 16, 31)) {
      val got = candidates(items, k = 10, parts)
      assert(Set("h1", "h2", "h3").subsetOf(got),
        s"heavy items must survive at $parts partitions, got $got")
      assert(got.size <= 10, "summary may never exceed k entries")
    }
  }

  test("exact when the vocabulary fits in k: candidates = all distinct") {
    val items = Seq("a", "a", "b", "c", "c", "c")
    assert(candidates(items, k = 8, parts = 4) == Set("a", "b", "c"))
  }

  test("SQL registration: misra_gries works in spark.sql with a " +
      "literal k, and rejects a non-literal k") {
    Seq("x", "x", "y").toDF("w").createOrReplaceTempView("mg_in")
    val got = spark.sql("SELECT misra_gries(w, 4) AS c FROM mg_in")
      .collect().head.getSeq[String](0).toSet
    assert(got == Set("x", "y"))
    val e = intercept[Exception] {
      spark.sql("SELECT misra_gries(w, length(w)) FROM mg_in").collect()
    }
    assert(e.getMessage.toLowerCase.contains("literal"))
  }

  test("non-string input takes an implicit cast at analysis time") {
    val got = Seq(7L, 7L, 8L).toDF("id")
      .agg(GraftFunctions.misraGries(col("id"), 4).as("c"))
      .collect().head.getSeq[String](0).toSet
    assert(got == Set("7", "8"))
  }

  test("heavy hitters query: sketch-pruned result equals the plain " +
      "exact computation") {
    val d = "/root/testdata/sf0.01"
    val exact = graft.Tables.documents(spark, d)
      .select(explode(Documents_tokens(col("text"))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("c"))
    val n = exact.agg(sum(col("c")).as("n"))
    val expect = exact.crossJoin(broadcast(n))
      .filter(col("c") * 40 > col("n"))
      .select(col("word"), col("c"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted
    val got = graft.queries.TextAnalysis.heavyHitters(spark, d)
      .select(col("word"), col("n_occurrences"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted
    assert(got.nonEmpty && got.toSeq == expect.toSeq)
  }

  private def Documents_tokens(c: org.apache.spark.sql.Column) =
    graft.queries.Documents.tokens(c)

  test("streaming: per-window candidates are a superset of guaranteed " +
      "heavy users and never exceed k") {
    import graft.streaming.EventStreams
    val path = "/root/testdata/sf0.001/events.parquet"
    val k = 16
    val stream = EventStreams.heavyHitterStream(
      EventStreams.readEventStream(spark, path), k)
    EventStreams.runToMemory(spark, stream, "hh_stream",
      org.apache.spark.sql.streaming.OutputMode.Complete())
    val got = spark.table("hh_stream")
      .collect()
      .map(r => r.getLong(0) -> (r.getSeq[String](1).toSet, r.getLong(2)))
      .toMap
    assert(got.nonEmpty)
    // batch truth: per-hour per-user exact counts over the same file
    val events = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val perUser = events
      .groupBy(window(col("ts"), "1 hour").getField("start").cast("long")
          .as("hour_sec"), col("user_id"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byWindow = perUser.groupBy(_._1)
    got.foreach { case (hour, (cands, nEvents)) =>
      assert(cands.size <= k)
      val rows = byWindow.getOrElse(hour, Array.empty)
      assert(rows.map(_._3).sum == nEvents, s"window $hour count mismatch")
      val guaranteed = rows.filter(_._3 * (k + 1) > nEvents).map(_._2.toString)
      assert(guaranteed.toSet.subsetOf(cands),
        s"window $hour must keep its guaranteed heavy users")
    }
  }
}
