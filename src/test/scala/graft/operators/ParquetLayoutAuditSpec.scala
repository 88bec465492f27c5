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

  test("z-ordered write bounds BOTH dimensions' row-group spans; " +
      "1-D clustering leaves the second dimension unpruned") {
    import spark.implicits._
    // a full 256x256 grid: every (x, y) cell exactly once
    val grid = spark.range(65536L)
      .select((col("id") % 256).as("x"), (col("id") / 256).cast("long").as("y"))
    def spans(path: String, column: String): Seq[Long] =
      ParquetLayoutAudit.rowGroupStats(spark, path, column).collect()
        .map(r => r.getLong(5) - r.getLong(4)).toSeq
    val oneD = tmp("pla_1d"); val zord = tmp("pla_z")
    graft.sources.IO.writeClustered(grid, oneD, "x", 8, 2048L)
    graft.sources.IO.writeZOrdered(grid, zord, "x", "y", 8, 2048L)
    // 1-D on x: x-groups are tight but y spans the whole domain
    assert(spans(oneD, "y").forall(_ > 200L),
      "x-clustered layout cannot prune on y")
    // z-order: a <=2048-cell curve segment stays inside a small tile
    // EXCEPT when it straddles a high-order quadrant boundary (an
    // unaligned file boundary can span the domain in one dim there) —
    // the skipping win is statistical, so pin the distribution:
    // typical group ≤ a half-domain tile in BOTH dims, and the mean
    // span far below the 1-D layout's constant ~255
    val zx = spans(zord, "x"); val zy = spans(zord, "y")
    assert(zx.nonEmpty && zy.size == zx.size)
    def tight(s: Seq[Long]) = s.count(_ <= 128L) * 4 >= s.size * 3
    assert(tight(zx) && tight(zy),
      s"≥3/4 of z-order groups must stay within a half-domain tile " +
        s"(x spans ${zx.sorted}, y spans ${zy.sorted})")
    assert(zx.sum / zx.size <= 100L && zy.sum / zy.size <= 100L,
      "mean z-order span must be a fraction of the 255 domain")
  }

  test("missing column stats come back null, not a crash") {
    val out = tmp("pla_m")
    writeSmallGroups(docs, out)
    val stats = ParquetLayoutAudit.rowGroupStats(spark, out, "no_such_col")
    assert(stats.collect().forall(r => r.isNullAt(4) && r.isNullAt(5)))
  }
}
