package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.queries.Relational.cents

/** Replayed-batch equivalence (SURVEY.md §7.3): stream output after the
  * source drains == the same aggregation run as a batch query over the
  * same parquet. Uses sf0.001 events (1k rows). */
class StreamingSpec extends AnyFunSuite {
  import SparkTestSession._

  private val eventsPath = "/root/testdata/sf0.001/events.parquet"
  private def batchEvents = graft.Tables.events(spark, "/root/testdata/sf0.001")

  test("tumbling window stream == batch aggregation") {
    val stream = EventStreams.readEventStream(spark, eventsPath)
    EventStreams.runToMemory(spark,
      EventStreams.tumblingHourly(stream), "tumbling", OutputMode.Complete())
    val got = spark.table("tumbling")
      .orderBy("hour_sec", "event_type").collect().toSeq
    val exp = batchEvents
      .groupBy(date_trunc("hour", col("ts")).cast("long").as("hour_sec"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        (sum(cents(col("value"))) / lit(100.0)).as("total_value"))
      .orderBy("hour_sec", "event_type").collect().toSeq
    assert(got == exp)
  }

  test("streaming PSI drift bins == batch recomputation; finisher " +
      "matches the batch device") {
    val baseline = graft.queries.DistributionAudit.psiBaseline(batchEvents)
    val stream = EventStreams.readEventStream(spark, eventsPath)
    EventStreams.runToMemory(spark,
      EventStreams.psiBinnedStream(stream, baseline), "psibins",
      OutputMode.Complete())
    val got = EventStreams
      .psiOfWindows(spark.table("psibins"), baseline)
      .orderBy("hour_sec", "event_type").collect().toSeq
    // batch twin: same baseline edges, same window grid, same finisher
    val edges = baseline.select(col("mn"), col("mx")).distinct()
    val binnedBatch = batchEvents
      .select(date_trunc("hour", col("ts")).cast("long").as("hour_sec"),
        col("event_type"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
      .crossJoin(broadcast(edges))
      .withColumn("bin",
        least(lit(9L), expr("(cents - mn) * 10 DIV (mx - mn + 1)")))
      .groupBy(col("hour_sec"), col("event_type"), col("bin"))
      .agg(count(lit(1)).as("n"))
    val exp = EventStreams.psiOfWindows(binnedBatch, baseline)
      .orderBy("hour_sec", "event_type").collect().toSeq
    assert(got.nonEmpty && got == exp)
    // PSI is a non-negative divergence by construction: each term is
    // (sa−sb)·(ln sa − ln sb), same-sign factors
    got.foreach(r => assert(r.getLong(3) >= 0L))
  }

  test("session window stream == batch sessionization") {
    val stream = EventStreams.readEventStream(spark, eventsPath)
    EventStreams.runToMemory(spark,
      EventStreams.sessionWindows(stream), "sessions", OutputMode.Complete())
    val got = spark.table("sessions")
      .select(col("user_id"), col("session_start_sec"), col("n_events"))
      .orderBy("user_id", "session_start_sec").collect().toSeq
    // batch twin: Events.sessionize gives (user, session_id, start, end, n)
    val exp = graft.queries.Events.sessionize(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), col("session_start_sec"), col("n_events"))
      .orderBy("user_id", "session_start_sec").collect().toSeq
    assert(got == exp)
  }

  test("sliding window stream: each event lands in exactly 2 windows") {
    val stream = EventStreams.readEventStream(spark, eventsPath)
    EventStreams.runToMemory(spark,
      EventStreams.slidingTwoHour(stream), "sliding", OutputMode.Complete())
    val totalN = spark.table("sliding").agg(sum("n")).head.getLong(0)
    val nEvents = batchEvents.count()
    assert(totalN == 2 * nEvents)
  }

  test("stateful dedup stream drops re-delivered events") {
    // simulate at-least-once delivery: union the file with itself via
    // two source dirs is awkward; instead dedup over the single file
    // must keep all rows (ids unique), a second copy must not add rows
    val stream = EventStreams.readEventStream(spark, eventsPath)
    EventStreams.runToMemory(spark,
      EventStreams.dedupStream(stream).select("event_id"), "dedup",
      OutputMode.Append())
    val got = spark.table("dedup").count()
    assert(got == batchEvents.select("event_id").distinct().count())
  }

  test("stream-stream join == the REGISTERED batch twin " +
      "(ev_click_to_purchase), row for row") {
    val stream = EventStreams.readEventStream(spark, eventsPath)
    EventStreams.runToMemory(spark,
      EventStreams.purchaseClickJoin(stream), "ssjoin", OutputMode.Append())
    val got = spark.table("ssjoin")
      .orderBy("p_id", "c_id").collect().toSeq
    // the registered, oracled batch query IS the ground truth — the
    // stream/batch contract is a library surface, not a test fixture
    val exp = graft.queries.ProductAnalytics
      .clickToPurchase(spark, "/root/testdata/sf0.001")
      .collect().toSeq
    assert(got.nonEmpty && got == exp)
  }

  test("INNER interval join state is CLEANED as the watermark advances " +
      "across a multi-batch replay (and output still equals batch)") {
    // four ts-ordered files -> four micro-batches (maxFilesPerTrigger=1):
    // the watermark advances between batches, so both sides' state
    // must EVICT rows older than watermark - range. A single-file
    // replay can never see eviction (one batch, watermark moves after
    // the only data batch) — this is the state-cleanup half of the
    // stream-stream join contract, which at 100 TB is the difference
    // between bounded executor state and OOM on a long-running stream.
    val ev = batchEvents.orderBy("ts")
    val inDir = java.nio.file.Files.createTempDirectory("ssjchunks")
    val rows = ev.collect()
    val n = rows.length
    val schema = ev.schema
    (0 until 4).foreach { k =>
      val slice = rows.slice(k * n / 4, (k + 1) * n / 4)
      spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](
            java.util.Arrays.asList(slice: _*)), schema)
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$inDir/chunk$k")
      // one FILE per chunk dir; stage into the source dir in order
      val part = new java.io.File(s"$inDir/chunk$k").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(part.toPath,
        java.nio.file.Paths.get(s"$inDir/ev$k.parquet"))
    }
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(inDir.toString)
      .where(col("event_id").isNotNull) // no-op; keeps shape identical
    val q = EventStreams.purchaseClickJoin(graft.Tables.normalizeEventTs(stream))
      .writeStream.format("memory").queryName("ssjoin_chunks")
      .outputMode(OutputMode.Append()).start()
    q.processAllAvailable()
    val progress = q.recentProgress.toSeq
      .filter(_.stateOperators.nonEmpty)
    q.stop()
    // output across micro-batches == the one-shot batch join
    val got = spark.table("ssjoin_chunks").orderBy("p_id", "c_id")
      .collect().toSeq
    val p = batchEvents.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
    val c = batchEvents.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
    val exp = p.join(c,
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 10 MINUTES") &&
        col("c_ts") < col("p_ts"))
      .select(col("p_id"), col("c_id"), col("p_user").as("user_id"),
        (col("p_ts").cast("long") - col("c_ts").cast("long")).as("lead_sec"))
      .orderBy("p_id", "c_id").collect().toSeq
    assert(got.nonEmpty && got == exp)
    // state-cleanup assertions: rows were REMOVED (watermark eviction
    // actually ran), and the final state holds a small tail — only
    // events inside watermark + 10-min range can legally remain, a
    // ~20-minute slice of a 30-day stream, NOT the cumulative input
    // (purchases + clicks = ~412 rows entered the join)
    val removed = progress.map(_.stateOperators.map(_.numRowsRemoved).sum).sum
    val finalState = progress.last.stateOperators.map(_.numRowsTotal).sum
    val inputRows = batchEvents
      .filter(col("event_type").isin("purchase", "click")).count()
    assert(removed >= inputRows / 2,
      s"eviction removed only $removed of $inputRows input rows")
    // conservative: even if the trailing no-data batch hasn't evicted
    // the final chunk yet, at most ~one chunk (1/4) can remain
    assert(finalState < inputRows / 2,
      s"final join state $finalState did not shrink vs input $inputRows")
  }

  test("stream-stream LEFT-OUTER interval join: replayed last-touch " +
      "attribution equals the batch query per purchase") {
    val stream = EventStreams.readEventStream(spark, eventsPath)
    EventStreams.runToMemory(spark,
      EventStreams.attributionJoinStream(stream), "ssattr",
      OutputMode.Append())
    val sunk = spark.table("ssattr")
    // winner-take-all reduction of the streamed touchpoint log: max
    // (t_ts, t_id) per purchase, the batch window's tie order
    val won = sunk.filter(col("t_id").isNotNull)
      .groupBy(col("p_id"))
      .agg(max(struct(col("t_ts"), col("t_id"), col("touch_type")))
        .as("w"))
      .select(col("p_id"), col("w.touch_type").as("attributed"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val noneIds = sunk.filter(col("t_id").isNull)
      .select(col("p_id")).collect().map(_.getLong(0)).toSet
    // a purchase is EITHER matched or held-then-nulled, never both
    assert(noneIds.intersect(won.keySet).isEmpty)
    val batchPer = graft.queries.ProductAnalytics
      .attributionPerPurchase(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("attributed"), col("ts").cast("long"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val batchAttr = batchPer.collect {
      case (id, a, _) if a != "none" => id -> a
    }.toMap
    // matched purchases: exact equality, including same-timestamp
    // touch tie-breaks
    assert(won == batchAttr)
    // 'none' purchases surface via the outer side only after the
    // touch watermark (max ts − 1 h) passes their event time; inside
    // that horizon the row is still legitimately in state
    val wmCutoff =
      batchEvents.agg(max(col("ts").cast("long"))).head.getLong(0) - 3600
    val batchNone = batchPer.collect { case (id, "none", ts) => (id, ts) }
    assert(noneIds.subsetOf(batchNone.map(_._1).toSet))
    val due = batchNone.collect { case (id, ts) if ts < wmCutoff => id }
    assert(due.toSet.subsetOf(noneIds))
    assert(won.nonEmpty && noneIds.nonEmpty)
  }

  test("flatMapGroupsWithState custom sessions == batch sessions that closed") {
    val stream = EventStreams.readEventStream(spark, eventsPath)
    val q = EventStreams.customSessions(spark, stream)
      .writeStream.format("memory").queryName("customsess")
      .outputMode(OutputMode.Append()).start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("customsess")
      .orderBy("user_id", "session_start_sec")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // sessions closed by a gap are emitted in batch 1; a user's FINAL
    // session is emitted by the event-time timeout in the trailing
    // no-data batch only if it ended before watermark - gap
    // (watermark = global max ts - 30 min, gap = 30 min)
    val all = graft.queries.Events.sessionize(spark, "/root/testdata/sf0.001")
    val wmCutoff = batchEvents.agg(max(col("ts").cast("long"))).head.getLong(0) - 3600
    val lastPerUser = all.groupBy("user_id")
      .agg(max("session_id").as("session_id"))
      .withColumn("is_last", lit(true))
    val exp = all.join(lastPerUser, Seq("user_id", "session_id"), "left_outer")
      .filter(col("is_last").isNull || col("session_end_sec") < wmCutoff)
      .select("user_id", "session_start_sec", "session_end_sec", "n_events")
      .orderBy("user_id", "session_start_sec")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty && got.sorted.toSeq == exp.sorted.toSeq)
  }

  test("mapGroupsWithState running stats converge to batch group-by") {
    val stream = EventStreams.readEventStream(spark, eventsPath)
    val updates = EventStreams.runningUserStats(spark, stream)
    val q = updates.writeStream.format("memory").queryName("userstats")
      .outputMode(OutputMode.Update()).start()
    q.processAllAvailable(); q.stop()
    // last update per user must equal the batch aggregate
    val got = spark.table("userstats")
      .groupBy("user_id")
      .agg(max("n_events").as("n_events"), max("max_value").as("max_value"))
      .orderBy("user_id").collect().toSeq
    val exp = batchEvents.groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), max("value").as("max_value"))
      .orderBy("user_id").collect().toSeq
    assert(got == exp)
  }

  test("stream-static anomaly flagging == batch z-test on the same stats") {
    val evc = graft.queries.Events.anomalyCents(batchEvents)
    val stats = graft.queries.Events.anomalyStats(evc)
    val stream = EventStreams.readEventStream(spark, eventsPath)
    EventStreams.runToMemory(spark,
      EventStreams.anomalyFlagStream(stream, stats), "anomalies",
      OutputMode.Append())
    val got = spark.table("anomalies").select("event_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    val exp = evc.join(broadcast(stats), "event_type")
      .filter(graft.queries.Events.anomalyPredicate)
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == exp && got.nonEmpty)
  }
}
