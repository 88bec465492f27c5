package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Pins for the snapshot/CDC tier beyond the DuckDB oracle: the diff's
  * change classes must tie out against closed-form counts from the raw
  * table, and incremental maintenance must reproduce the direct
  * recompute EXACTLY — the whole point of the IVM algebra. */
class SnapshotOpsSpec extends AnyFunSuite {
  import graft.SparkTestSession._

  private val d = "/root/testdata/sf0.001"

  test("snapshot diff classes tie out against closed-form counts " +
      "from the raw documents table") {
    val docs = graft.Tables.documents(spark, d)
    val byClass = SnapshotOps.snapshotDiff(spark, d)
      .groupBy(col("change_type")).agg(sum(col("n_docs")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def cnt(cond: org.apache.spark.sql.Column): Long =
      docs.filter(cond).count()
    val id = col("doc_id")
    assert(byClass("insert") == cnt(id % 10 === 9),
      "inserts = docs only in the new snapshot")
    assert(byClass("delete") == cnt(id % 10 === 0),
      "deletes = docs only in the old snapshot")
    assert(byClass("update") ==
      cnt(id % 10 =!= 9 && id % 10 =!= 0 && id % 7 === 3),
      "updates = surviving docs that carry the re-crawl edit")
    assert(byClass.values.sum == docs.count(),
      "every doc lands in exactly one change class")
  }

  test("update rows move chars by exactly the edit size, " +
      "inserts/deletes by their full doc size") {
    val diff = SnapshotOps.snapshotDiff(spark, d)
      .groupBy(col("change_type")).agg(sum(col("chars_delta")).as("dc"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val docs = graft.Tables.documents(spark, d)
    val id = col("doc_id")
    val updates = docs.filter(id % 10 =!= 9 && id % 10 =!= 0 && id % 7 === 3)
    assert(diff("update") == 8L * updates.count(),
      "each edit appends ' revised' = 8 chars")
    val ins = docs.filter(id % 10 === 9)
      .agg(sum(when(id % 7 === 3, col("n_chars") + 8).otherwise(col("n_chars"))))
      .collect()(0).getLong(0)
    assert(diff("insert") == ins)
    val del = docs.filter(id % 10 === 0)
      .agg(sum(col("n_chars"))).collect()(0).getLong(0)
    assert(diff("delete") == -del)
    assert(diff("unchanged") == 0L)
  }

  test("incremental maintenance == direct recompute over the new " +
      "snapshot, per source, exactly") {
    val ivm = SnapshotOps.incrementalStats(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val direct = graft.Tables.documents(spark, d)
      .filter(col("doc_id") % 10 =!= 0)
      .select(col("source"),
        when(col("doc_id") % 7 === 3, col("n_chars") + 8)
          .otherwise(col("n_chars")).as("nc"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nc")).as("total_chars"))
      .orderBy(col("source"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(ivm.toSeq == direct.toSeq,
      "COUNT/SUM delta maintenance must be bit-exact")
  }
}
