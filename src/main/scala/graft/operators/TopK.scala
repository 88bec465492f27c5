package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Top-k-per-key as a partial aggregation instead of a window.
  *
  * `row_number().over(partitionBy(key).orderBy(ord))` + filter sorts
  * every group in full; at 100 TB the sort of the hot keys dominates.
  * This operator keeps a bounded k-element buffer per key inside a
  * typed Aggregator, so Spark combines map-side (each task ships at
  * most k rows per key) and never materializes or sorts a whole group.
  * Output rows equal the window formulation exactly (same oracle SQL
  * pins both — see SparkEntry "topk_per_key_agg").
  */
object TopK {

  /** Per-key top-k orders by (totalprice desc, orderkey asc). Row =
    * (orderkey, totalprice); key = custkey. */
  private type Row = (Long, Double)

  private def better(a: Row, b: Row): Boolean =
    a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)

  private class Agg(k: Int) extends Aggregator[(Long, Row), List[Row], List[Row]] {
    def zero: List[Row] = Nil
    private def insert(buf: List[Row], r: Row): List[Row] = {
      // bounded insertion into a k-sorted list (k is small, e.g. 3)
      val (pre, post) = buf.span(better(_, r))
      val merged = pre ::: (r :: post)
      if (merged.length > k) merged.take(k) else merged
    }
    def reduce(buf: List[Row], in: (Long, Row)): List[Row] = insert(buf, in._2)
    def merge(a: List[Row], b: List[Row]): List[Row] = b.foldLeft(a)(insert)
    def finish(buf: List[Row]): List[Row] = buf
    def bufferEncoder: Encoder[List[Row]] = Encoders.kryo[List[Row]]
    def outputEncoder: Encoder[List[Row]] = Encoders.kryo[List[Row]]
  }

  /** Top-k orders per customer; schema matches the window variant:
    * (o_custkey, o_orderkey, o_totalprice, rn). */
  def topOrdersPerCustomer(s: SparkSession, d: String, k: Int = 3): DataFrame = {
    import s.implicits._
    graft.Tables.orders(s, d)
      .select(col("o_custkey").as[Long],
        struct(col("o_orderkey"), col("o_totalprice")).as[Row])
      .groupByKey(_._1)
      .agg(new Agg(k).toColumn.name("top"))
      .flatMap { case (cust, top) =>
        top.iterator.zipWithIndex.map { case ((ok, price), i) =>
          (cust, ok, price, i + 1)
        }
      }
      .toDF("o_custkey", "o_orderkey", "o_totalprice", "rn")
      .orderBy(col("o_custkey"), col("rn"))
  }
}
