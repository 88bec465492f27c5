package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._
import graft.queries.Relational.{cents, centsSql, moneySum, moneySumSql}

/** Event-stream analytics, batch form. The same transforms run under
  * Structured Streaming in graft.streaming (readStream + watermark);
  * here they are batch queries so the DuckDB oracle can check them.
  */
object Events {

  // ------------------------------------------------ tumbling window
  /** Tumbling 1-hour window counts per event type (date_trunc keeps the
    * expression portable; streaming twin uses window($"ts", "1 hour")). */
  def tumblingHourly(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(date_trunc("hour", col("ts")).cast("long").as("hour_sec"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), moneySum(col("value")).as("total_value"))
      .orderBy(col("hour_sec"), col("event_type"))

  val tumblingHourlySql: String =
    s"""SELECT CAST(FLOOR(EPOCH(DATE_TRUNC('hour', ts))) AS BIGINT) AS hour_sec,
       |  event_type,
       |  COUNT(*) AS n, ${moneySumSql("value")} AS total_value
       |FROM events GROUP BY 1, 2 ORDER BY hour_sec, event_type""".stripMargin

  /** Sliding windows, batch form: every event lands in the two 2-hour
    * windows (hour-aligned, sliding 1 h) that contain it — explode the
    * window starts, then aggregate. Streaming twin: slidingTwoHour. */
  def slidingTwoHourBatch(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(col("event_type"),
        explode(array(
          date_trunc("hour", col("ts")).cast("long") - lit(3600L),
          date_trunc("hour", col("ts")).cast("long"))).as("win_start_sec"))
      .groupBy(col("win_start_sec"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("win_start_sec"), col("event_type"))

  val slidingTwoHourBatchSql: String =
    """SELECT win_start_sec, event_type, COUNT(*) AS n
      |FROM (
      |  SELECT event_type,
      |    CAST(FLOOR(EPOCH(DATE_TRUNC('hour', ts))) AS BIGINT) - 3600 AS win_start_sec
      |  FROM events
      |  UNION ALL
      |  SELECT event_type,
      |    CAST(FLOOR(EPOCH(DATE_TRUNC('hour', ts))) AS BIGINT) AS win_start_sec
      |  FROM events) t
      |GROUP BY 1, 2 ORDER BY win_start_sec, event_type""".stripMargin

  // ------------------------------------------------ daily user stats
  /** Daily per-user activity rollup (the funnel-building block). */
  def dailyUserStats(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .groupBy(date_trunc("day", col("ts")).cast("long").as("day_sec"),
        col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("event_type")).as("n_types"),
        sum(when(col("event_type") === "purchase", 1).otherwise(0)).as("n_purchases"))
      .orderBy(col("day_sec"), col("user_id"))

  val dailyUserStatsSql: String =
    """SELECT CAST(FLOOR(EPOCH(DATE_TRUNC('day', ts))) AS BIGINT) AS day_sec,
      |  user_id,
      |  COUNT(*) AS n_events,
      |  COUNT(DISTINCT event_type) AS n_types,
      |  SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS n_purchases
      |FROM events GROUP BY 1, 2 ORDER BY day_sec, user_id""".stripMargin

  // ------------------------------------------------- sessionization
  /** Batch sessionization: 30-min-gap sessions per user via the
    * lag + cumulative-sum-of-boundaries idiom; one row per session.
    * Streaming twin: session_window($"ts", "30 minutes"). */
  def sessionize(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    events(s, d)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          col("ts").cast("long") - col("prev_ts").cast("long") > 1800, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        min(col("ts")).cast("long").as("session_start_sec"),
        max(col("ts")).cast("long").as("session_end_sec"),
        count(lit(1)).as("n_events"))
      .orderBy(col("user_id"), col("session_id"))
  }

  val sessionizeSql: String =
    """WITH marked AS (
      |  SELECT user_id, event_id, ts,
      |    CASE WHEN LAG(ts) OVER w IS NULL
      |           OR FLOOR(EPOCH(ts)) - FLOOR(EPOCH(LAG(ts) OVER w)) > 1800
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sess AS (
      |  SELECT user_id, ts,
      |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM marked)
      |SELECT user_id, session_id,
      |  CAST(FLOOR(EPOCH(MIN(ts))) AS BIGINT) AS session_start_sec,
      |  CAST(FLOOR(EPOCH(MAX(ts))) AS BIGINT) AS session_end_sec,
      |  COUNT(*) AS n_events
      |FROM sess GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin

  // ---------------------------------------------- JSON extraction
  /** Semi-structured props column: extract a JSON field and aggregate. */
  def jsonExtract(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy(col("event_type"))
      .agg(count(col("k")).as("n_with_k"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  val jsonExtractSql: String =
    """SELECT event_type,
      |  COUNT(k) AS n_with_k, SUM(k) AS sum_k,
      |  MIN(k) AS min_k, MAX(k) AS max_k
      |FROM (SELECT event_type,
      |        CAST(json_extract_string(props, '$.k') AS INT) AS k
      |      FROM events) t
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ev_tumbling_hourly" -> tumblingHourly,
    "ev_sliding_2h" -> slidingTwoHourBatch,
    "ev_daily_user_stats" -> dailyUserStats,
    "ev_sessionize" -> sessionize,
    "ev_json_extract" -> jsonExtract)

  val oracle: Map[String, String] = Map(
    "ev_tumbling_hourly" -> tumblingHourlySql,
    "ev_sliding_2h" -> slidingTwoHourBatchSql,
    "ev_daily_user_stats" -> dailyUserStatsSql,
    "ev_sessionize" -> sessionizeSql,
    "ev_json_extract" -> jsonExtractSql)
}
