package graft.mr

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator

/** Incremental twin of the MRApp surface (SURVEY.md §7.3): the plain
  * `reduce(key, values)` contract materializes every group in memory
  * (like the reference, /root/reference/mr/worker.go:109) — fine for
  * parity, wrong for unbounded groups at 100 TB. Apps whose reduce is
  * a monoid implement this trait instead and run through a typed
  * Aggregator: Spark then does map-side partial aggregation and never
  * holds a whole group anywhere.
  */
trait IncrementalApp[B] extends MRApp {
  def zero: B
  def lift(value: String): B
  def combine(a: B, b: B): B
  def finish(key: String, buf: B): String
  def bufferEncoder: Encoder[B]

  /** The non-incremental contract, derived — keeps every incremental
    * app runnable through plain MRJob and the sequential oracle. */
  final def reduce(key: String, values: Seq[String]): String =
    finish(key, values.map(lift).foldLeft(zero)(combine))
}

object Incremental {
  /** runJob with partial aggregation: flatMap → groupByKey →
    * Aggregator (map-side combine before the shuffle — the paper's
    * §4.3 combiner refinement the reference never implemented). */
  def result[B](spark: SparkSession, app: IncrementalApp[B],
      inputGlob: String): Dataset[String] = {
    import spark.implicits._
    val agg = new Aggregator[KV, B, B] {
      def zero: B = app.zero
      def reduce(b: B, kv: KV): B = app.combine(b, app.lift(kv.value))
      def merge(a: B, b: B): B = app.combine(a, b)
      def finish(b: B): B = b // key-aware finish applied after the agg
      def bufferEncoder: Encoder[B] = app.bufferEncoder
      def outputEncoder: Encoder[B] = app.bufferEncoder
    }
    MRJob.mapped(spark, app, inputGlob)
      .groupByKey(_.key)
      .agg(agg.toColumn)
      .map { case (k, b) => s"$k ${app.finish(k, b)}" }
  }
}

/** Incremental word count: buffer = running count. */
object WordCountInc extends IncrementalApp[Long] {
  def map(filename: String, contents: String): Seq[KV] =
    Apps.WordCount.map(filename, contents)
  def zero: Long = 0L
  def lift(v: String): Long = 1L
  def combine(a: Long, b: Long): Long = a + b
  def finish(key: String, buf: Long): String = buf.toString
  def bufferEncoder: Encoder[Long] = Encoders.scalaLong
}

/** Incremental credit count-by-agency. */
object CreditInc extends IncrementalApp[Long] {
  def map(filename: String, contents: String): Seq[KV] =
    Apps.Credit.map(filename, contents)
  def zero: Long = 0L
  def lift(v: String): Long = 1L
  def combine(a: Long, b: Long): Long = a + b
  def finish(key: String, buf: Long): String = buf.toString
  def bufferEncoder: Encoder[Long] = Encoders.scalaLong
}

/** Incremental indexer: buffer = distinct doc set (bounded by corpus
  * doc count, not values count). */
object IndexerInc extends IncrementalApp[Set[String]] {
  def map(filename: String, contents: String): Seq[KV] =
    Apps.Indexer.map(filename, contents)
  def zero: Set[String] = Set.empty
  def lift(v: String): Set[String] = Set(v)
  def combine(a: Set[String], b: Set[String]): Set[String] = a union b
  def finish(key: String, buf: Set[String]): String =
    s"${buf.size} ${buf.toSeq.sorted.mkString(",")}"
  def bufferEncoder: Encoder[Set[String]] =
    org.apache.spark.sql.Encoders.kryo[Set[String]]
}
