package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The audit must measure what it claims: a clustered write yields
  * disjoint row-group ranges (point lookups touch one group), a
  * hash-shuffled write of the SAME data yields overlapping ones, and
  * the per-group row counts tie out against the table size. */
class ParquetLayoutAuditSpec extends AnyFunSuite {
  import graft.SparkTestSession._

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString

  // small parquet.block.size forces many row groups from little data
  private def writeSmallGroups(df: org.apache.spark.sql.DataFrame,
      path: String): Unit =
    df.write.mode("overwrite")
      .option("parquet.block.size", (32 * 1024).toString)
      .parquet(path)

  private lazy val docs =
    graft.Tables.documents(spark, "/root/testdata/sf0.01")
      .select(col("doc_id"), col("text"))

  test("clustered layout: multiple row groups, disjoint doc_id ranges, " +
      "rows tie out") {
    val out = tmp("pla_c")
    writeSmallGroups(docs.repartitionByRange(2, col("doc_id"))
      .sortWithinPartitions(col("doc_id")), out)
    val stats = ParquetLayoutAudit.rowGroupStats(spark, out, "doc_id")
    val rows = stats.collect()
    assert(rows.length >= 4, s"expected several row groups, got ${rows.length}")
    assert(rows.map(_.getLong(2)).sum == docs.count(), "row counts tie out")
    assert(rows.forall(r => !r.isNullAt(4) && !r.isNullAt(5)),
      "footer stats present for doc_id")
    val rep = ParquetLayoutAudit.overlapReport(stats).collect()
    assert(rep.forall(_.getLong(5) == 0L),
      "clustered write must produce disjoint ranges (0 overlaps)")
  }

  test("hash-shuffled layout of the same data: overlapping ranges — " +
      "the audit detects skipping-hostile layout") {
    val out = tmp("pla_h")
    // hash-repartition scatters doc_id across files: every group's
    // range spans ~the whole id domain
    writeSmallGroups(docs.repartition(4, col("text")), out)
    val stats = ParquetLayoutAudit.rowGroupStats(spark, out, "doc_id")
    val rep = ParquetLayoutAudit.overlapReport(stats).collect()
    assert(rep.length >= 4)
    assert(rep.exists(_.getLong(5) > 0L),
      "shuffled write must show range overlap")
    // and the summary signal a compaction planner would use:
    val worst = rep.map(_.getLong(5)).max
    assert(worst >= rep.length / 2,
      s"hash layout should overlap broadly (worst=$worst of ${rep.length})")
  }

  test("missing column stats come back null, not a crash") {
    val out = tmp("pla_m")
    writeSmallGroups(docs, out)
    val stats = ParquetLayoutAudit.rowGroupStats(spark, out, "no_such_col")
    assert(stats.collect().forall(r => r.isNullAt(4) && r.isNullAt(5)))
  }
}
