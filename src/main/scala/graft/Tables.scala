package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided parquet star schema (TESTDATA.md).
  *
  * All queries take an `sfDir` so the same code runs at any scale factor;
  * on a real cluster the dir would be an object-store prefix and these
  * reads would be partition-pruned parquet scans.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = t(s, d, "lineitem")
  /** The events fixture has shipped `ts` in two physical parquet shapes
    * across driver rounds: TIMESTAMP(NANOS) — which Spark's vectorized
    * reader rejects unless `nanosAsLong=true`, surfacing it as int64
    * nanoseconds — and plain `timestamp[us]` with no timezone, which
    * surfaces as TIMESTAMP_NTZ. Normalize either to session-zone
    * TimestampType (session TZ is UTC, so the NTZ cast is value-
    * preserving) so downstream queries and the DuckDB oracle see the
    * same microsecond instants. IOSpec pins both shapes. */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // nanos-as-long: truncate to µs (same truncation DuckDB applies)
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }

  /** Id-width insurance (the r6 lesson generalized): a regenerated
    * fixture could ship event_id/user_id as int32, which would break
    * the LongType contract of the native as-of join while every other
    * query silently narrowed. Normalize to LONG here — Catalyst
    * removes the cast when the column is already LONG, so the current
    * fixtures pay nothing. The DuckDB oracle is unaffected (the
    * checker canonicalizes integer widths before comparing). */
  def normalizeEventIds(df: DataFrame): DataFrame =
    Seq("event_id", "user_id").foldLeft(df)((d, c) =>
      if (d.columns.contains(c)) d.withColumn(c, col(c).cast("long")) else d)

  def events(s: SparkSession, d: String): DataFrame =
    normalizeEventIds(normalizeEventTs {
    try t(s, d, "events")
    catch {
      case _: Exception =>
        // schema inference rejected the footer — the legacy
        // TIMESTAMP(NANOS) shape; the conf must stay set for the scan
        // itself to execute, so it is only ever set on this path
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        t(s, d, "events")
    }
  })
  /** Same id-width insurance for the other driver-regenerated tables:
    * no-op casts on the current fixtures, survival if a future
    * regeneration narrows the ids (doc_id feeds the *2/+1 node
    * encoding in GraphRank and typed CC columns; vec_id feeds typed
    * index joins). */
  def documents(s: SparkSession, d: String): DataFrame = {
    val df = t(s, d, "documents")
    Seq("doc_id", "n_chars").foldLeft(df)((x, c) =>
      if (x.columns.contains(c)) x.withColumn(c, col(c).cast("long")) else x)
  }
  def embeddings(s: SparkSession, d: String): DataFrame = {
    val df = t(s, d, "embeddings")
    if (df.columns.contains("vec_id"))
      df.withColumn("vec_id", col("vec_id").cast("long"))
    else df
  }
}
