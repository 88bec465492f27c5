package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.queries.Relational.cents

/** Structured Streaming surface over the events table: the batch
  * queries in graft.queries.Events re-expressed as streams (readStream
  * → event-time windows + watermark → sink). The reference engine is
  * batch-only (SURVEY.md §2.3 "Streaming: none"), so semantics here are
  * defined by replayed-batch equivalence: stream output after
  * processAllAvailable == the batch query over the same data
  * (StreamingSpec pins this).
  *
  * Scale notes: state store is keyed by (window, type) / (session,
  * user) / event_id — all shuffle-partitioned, no driver state; the
  * watermark bounds state growth for append-mode sinks.
  */
object EventStreams {

  /** Shared file-source plumbing: schema from a batch read, bare files
    * staged into a directory (FileStreamSource requires one; real
    * deployments point at a landing directory), maxFilesPerTrigger=1
    * for deterministic micro-batch replay. */
  private[streaming] def readParquetStream(spark: SparkSession,
      path: String): DataFrame = {
    val schema = spark.read.parquet(path).schema
    val f = new java.io.File(path)
    val dir =
      if (f.isFile) {
        val d = java.nio.file.Files.createTempDirectory("stagedstream")
        java.nio.file.Files.copy(f.toPath, d.resolve(f.getName))
        d.toString
      } else path
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
  }

  /** File-source stream over an events parquet path. The fixture's ts
    * column has shipped as both TIMESTAMP(NANOS) and timestamp[us]
    * across rounds; delegate shape detection + normalization to
    * Tables.normalizeEventTs so stream and batch can never disagree. */
  def readEventStream(spark: SparkSession, path: String): DataFrame = {
    val stream =
      try readParquetStream(spark, path)
      catch {
        case _: Exception =>
          // legacy nanos footer: needs the conf both for the schema
          // probe inside readParquetStream and for the scan itself
          spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          readParquetStream(spark, path)
      }
    graft.Tables.normalizeEventTs(stream)
  }

  /** Tumbling 1-hour event-time window with a 1-hour watermark. */
  def tumblingHourly(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        (sum(cents(col("value"))) / lit(100.0)).as("total_value"))
      .select(col("window.start").cast("long").as("hour_sec"),
        col("event_type"), col("n"), col("total_value"))

  /** Sliding windows: 2-hour window sliding by 1 hour. */
  def slidingTwoHour(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").cast("long").as("win_start_sec"),
        col("event_type"), col("n"))

  /** Session windows with a 30-minute gap (built-in session_window;
    * batch twin is Events.sessionize's lag+cumsum formulation). */
  def sessionWindows(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").cast("long").as("session_start_sec"),
        col("user_id"), col("n_events"))

  /** Stateful exactly-once-per-key dedup on event_id. Must be the
    * WithinWatermark variant: plain dropDuplicates without the event-
    * time column in the key never evicts state (unbounded growth on a
    * long-running stream); this one ages ids out an hour behind the
    * watermark. */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream inner join: each purchase joined to the same user's
    * clicks within the preceding 10 minutes. Both sides watermarked so
    * the join state is bounded (clicks older than the watermark +
    * range are evicted — the production-shape correlated-events join). */
  def purchaseClickJoin(events: DataFrame): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "10 minutes")
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", "10 minutes")
    purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 10 MINUTES") &&
        col("c_ts") < col("p_ts"))
      .select(col("p_id"), col("c_id"), col("p_user").as("user_id"),
        (col("p_ts").cast("long") - col("c_ts").cast("long")).as("lead_sec"))
  }

  /** Stream-stream LEFT-OUTER time-interval join in the attribution
    * shape: every purchase joined to the same user's candidate
    * touches (non-purchase events) in its 48-hour lookback — the
    * streaming half of ev_attribution_last_touch. Unlike
    * [[purchaseClickJoin]] (inner), the OUTER side exercises
    * watermark-held null emission: a purchase with no touch in window
    * surfaces as one null-touch row once the touch-side watermark
    * passes its event time (the 'none' bucket, delivered exactly
    * once, never early).
    *
    * The join condition mirrors the batch window's (ts, event_id)
    * ROW order, not just the timestamps: a touch at the same ts as
    * the purchase counts when its event_id is smaller — without the
    * tie clause the two engines would disagree on same-timestamp
    * touches. State bound: touches are held 48 h of event time past
    * the watermark (the declared lookback), purchases only until the
    * touch watermark passes their own ts.
    *
    * Downstream winner-take-all (max (t_ts, t_id) per purchase) is
    * left to the consumer: chaining another stateful aggregation
    * after an outer interval join inside one streaming query is the
    * one composition Structured Streaming still restricts, so the
    * honest library surface is the join (all candidate touches, the
    * production "touchpoint log"), with the reduction running batch
    * on the sink — asserted replay-equal to the registered batch
    * query, purchase by purchase, in StreamingSpec. */
  def attributionJoinStream(events: DataFrame): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"), col("value"))
      .withWatermark("p_ts", "1 hour")
    val touches = events.filter(col("event_type") =!= "purchase")
      .select(col("event_id").as("t_id"), col("user_id").as("t_user"),
        col("ts").as("t_ts"), col("event_type").as("touch_type"))
      .withWatermark("t_ts", "1 hour")
    // the time RANGE must appear as bare conjuncts (lower and upper
    // bound) for the analyzer to derive the outer side's state
    // watermark — an OR around the upper bound defeats the interval
    // detection, so the (ts, event_id) tie-break rides as a separate
    // non-range conjunct under t_ts <= p_ts
    purchases.join(touches,
      col("t_user") === col("p_user") &&
        col("t_ts") >= col("p_ts") - expr("INTERVAL 48 HOURS") &&
        col("t_ts") <= col("p_ts") &&
        (col("t_ts") < col("p_ts") || col("t_id") < col("p_id")),
      "left_outer")
      .select(col("p_id"), col("p_user").as("user_id"), col("p_ts"),
        col("value"), col("t_id"), col("t_ts"), col("touch_type"))
  }

  /** Custom state via mapGroupsWithState: running per-user event count
    * and running max value — the KeyValueGroupedDataset state surface
    * (update-mode output, one row per user per micro-batch). */
  case class UserState(n: Long, maxValue: Double)
  case class UserUpdate(user_id: Long, n_events: Long, max_value: Double)

  def runningUserStats(spark: SparkSession, events: DataFrame): Dataset[UserUpdate] = {
    import spark.implicits._
    // value is a nullable column; a bare .as[Double] would throw on
    // the first null row — nulls count as events but can't be the max
    events.select(col("user_id").as[Long],
        coalesce(col("value"), lit(Double.MinValue)).as[Double])
      .groupByKey(_._1)
      .mapGroupsWithState[UserState, UserUpdate](GroupStateTimeout.NoTimeout) {
        (user, rows, state: GroupState[UserState]) =>
          val prev = state.getOption.getOrElse(UserState(0L, Double.MinValue))
          var n = prev.n
          var mx = prev.maxValue
          rows.foreach { case (_, v) => n += 1; if (v > mx) mx = v }
          state.update(UserState(n, mx))
          UserUpdate(user, n, mx)
      }
  }

  /** Custom sessionizer on flatMapGroupsWithState: 30-min-gap sessions
    * maintained in explicit per-user state with an event-time timeout —
    * emits one row per CLOSED session (plus the final open one at
    * timeout). The hand-rolled twin of session_window for when session
    * semantics need custom logic (e.g. cap length, carry payloads).
    *
    * Semantics match session_window exactly: microsecond precision,
    * gap-exclusive (an event exactly gap after the last starts a new
    * session). Out-of-order events still above the watermark merge by
    * interval (start = min, last = max); an event more than gap BEFORE
    * the open session is emitted as its own closed session (nothing
    * later can merge with it). */
  case class SessionState(startUs: Long, lastUs: Long, n: Long)
  case class SessionOut(user_id: Long, session_start_sec: Long,
      session_end_sec: Long, n_events: Long)

  def customSessions(spark: SparkSession, events: DataFrame): Dataset[SessionOut] = {
    import spark.implicits._
    val gapUs = 1800L * 1000000L
    def out(user: Long, s: SessionState): SessionOut =
      SessionOut(user, s.startUs / 1000000L, s.lastUs / 1000000L, s.n)
    // keep the watermarked timestamp column itself through the
    // grouping (a cast would strip the watermark tag and fail the
    // event-time-timeout check); microseconds derived in the function
    events
      .withWatermark("ts", "30 minutes")
      .select(col("user_id").as[Long], col("ts").as[java.sql.Timestamp])
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val res = state.getOption.map(s => out(user, s)).iterator
            state.remove()
            res
          } else {
            // micro-batch rows are unordered: sort, then fold.
            // epoch µs = whole seconds (getTime div 1000) + sub-second
            // nanos div 1000 (getTime's ms component is nanos-derived)
            val sorted = rows.map { case (_, t) =>
              (t.getTime / 1000L) * 1000000L + t.getNanos / 1000L
            }.toSeq.sorted
            var open = state.getOption
            val closed = List.newBuilder[SessionOut]
            sorted.foreach { t =>
              open match {
                case Some(s) if t >= s.lastUs + gapUs => // strictly after
                  closed += out(user, s)
                  open = Some(SessionState(t, t, 1))
                case Some(s) if t + gapUs <= s.startUs => // stray, far before
                  closed += SessionOut(user, t / 1000000L, t / 1000000L, 1)
                case Some(s) => // overlaps the open interval: merge
                  open = Some(SessionState(math.min(s.startUs, t),
                    math.max(s.lastUs, t), s.n + 1))
                case None =>
                  open = Some(SessionState(t, t, 1))
              }
            }
            open match {
              case Some(s) =>
                state.update(s)
                state.setTimeoutTimestamp(s.lastUs / 1000L + gapUs / 1000L + 1)
              case None => ()
            }
            closed.result().iterator
          }
      }
  }

  /** Stream-static anomaly flagging: arriving events z-tested against
    * a STATIC per-type stats snapshot (n, Σv, Σv² from
    * queries.Events.anomalyStats over the historical corpus) with the
    * same exact-integer predicate as the batch ev_anomaly_3sigma —
    * shared cents projection + shared predicate, so the stream verdict
    * can never fork from the batch one on the same stats. Stateless:
    * a projection + broadcast join per micro-batch, append mode, no
    * watermark bookkeeping — the production shape, since a global σ
    * over an unbounded stream is undefined; pipelines re-snapshot the
    * stats table periodically and the static side re-plans per batch.
    * Emits one row per anomalous arrival: (event_id, event_type, v). */
  def anomalyFlagStream(events: DataFrame, staticStats: DataFrame): DataFrame =
    graft.queries.Events.anomalyCents(events)
      .join(org.apache.spark.sql.functions.broadcast(staticStats), "event_type")
      .filter(graft.queries.Events.anomalyPredicate)
      .select(col("event_id"), col("event_type"), col("v"))

  /** Streaming PSI drift monitor, corpus-sized half: arriving events
    * are binned against a STATIC baseline's cents edges
    * (queries.DistributionAudit.psiBaseline — edges must come from
    * the baseline, never the unbounded stream) and counted per
    * (event-time window, type, bin) under a watermark. State is ≤ 10
    * bins × |types| per open window — never per-event. The PSI fold
    * itself runs on the SINK ([[psiOfWindows]], ≤ 10 rows per
    * window×type): the production metrics-table shape, and it keeps
    * the plan to one streaming aggregation (chained streaming aggs
    * are unsupported). */
  def psiBinnedStream(events: DataFrame, baseline: DataFrame): DataFrame = {
    val edges = broadcast(
      baseline.select(col("mn"), col("mx")).distinct())
    events
      .select(col("ts"), col("event_type"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"))
      .crossJoin(edges)
      .withColumn("bin",
        least(lit(9L), expr("(cents - mn) * 10 DIV (mx - mn + 1)")))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"), col("bin"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").cast("long").as("hour_sec"),
        col("event_type"), col("bin"), col("n"))
  }

  /** Batch finisher over the binned sink: per (window, type) PSI in
    * micro-nats against the baseline shares — the identical
    * (sa − sb)·(⌊ln sa·1e6⌋ − ⌊ln sb·1e6⌋) DIV 1e6 device as the
    * batch ev_psi_drift, over bins populated on both sides. */
  def psiOfWindows(binned: DataFrame, baseline: DataFrame): DataFrame = {
    // window total, not a self-join: the sink frame joined with an
    // aggregate of itself trips conflicting-attribute resolution on
    // memory-table views, and the ≤10-bin partitions cost nothing
    val wt = org.apache.spark.sql.expressions.Window
      .partitionBy(col("hour_sec"), col("event_type"))
    binned.withColumn("t", sum(col("n")).over(wt))
      .join(baseline.select(col("event_type"), col("bin"), col("base_ppm")),
        Seq("event_type", "bin"))
      .withColumn("sa", expr("1000000 * n DIV t"))
      .withColumn("term",
        when(col("sa") > 0 && col("base_ppm") > 0,
          (col("sa") - col("base_ppm")) *
            (floor(log(col("sa").cast("double")) * lit(1e6)).cast("long") -
             floor(log(col("base_ppm").cast("double")) * lit(1e6))
               .cast("long")))
          .otherwise(lit(0L)))
      .groupBy(col("hour_sec"), col("event_type"))
      .agg(max(col("t")).as("n_events"),
        expr("SUM(term) DIV 1000000").as("psi_micronats"))
  }

  /** Windowed streaming heavy-hitter candidates: which users dominate
    * each event-time hour (the abuse/bot pre-filter) — the native
    * Misra–Gries aggregate running INSIDE a watermarked streaming
    * aggregation. Per-window state is the serialized ≤k-counter
    * summary, merged incrementally across micro-batches, so state
    * size is k entries per open window — never the per-user
    * cardinality a count-based groupBy would hold.
    *
    * Same contract as the batch sketch: candidates are a GUARANTEED
    * SUPERSET of users with > n_window/(k+1) of the window's events
    * (pin in MisraGriesSpec); near-threshold membership depends on
    * arrival order, so downstream exact-confirms against the event
    * log — the streaming half of text_heavy_hitters' pattern. */
  def heavyHitterStream(events: DataFrame, k: Int = 16): DataFrame = {
    // defensive registration for sessions built without GraftExtensions
    graft.functions.GraftFunctions.registerAll(events.sparkSession)
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(graft.functions.GraftFunctions.misraGries(
          col("user_id").cast("string"), k).as("candidates"),
        count(lit(1)).as("n_events"))
      .select(col("window.start").cast("long").as("hour_sec"),
        col("candidates"), col("n_events"))
  }

  /** Run any of the above to an in-memory sink until the source is
    * drained; returns the sink table name. Test/demo harness. */
  def runToMemory(spark: SparkSession, df: DataFrame, name: String,
      mode: OutputMode): Unit = {
    val q = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(mode)
      .start()
    q.processAllAvailable()
    q.stop()
  }
}
