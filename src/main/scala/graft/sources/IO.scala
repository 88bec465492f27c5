package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Source/sink coverage: every format the engine reads and writes,
  * plus the layout patterns that matter at scale (hive-partitioned
  * directories for partition pruning, bucketed tables for shuffle-free
  * joins). The reference's only formats are whole-file text and
  * hand-parsed CSV (SURVEY.md §2.3); parquet/json/orc come with the
  * platform.
  */
object IO {

  def readParquet(s: SparkSession, path: String): DataFrame =
    s.read.parquet(path)

  def readCsv(s: SparkSession, path: String, schema: String): DataFrame =
    s.read.option("header", "true").option("mode", "DROPMALFORMED")
      .schema(schema).csv(path)

  def readJsonl(s: SparkSession, path: String, schema: String): DataFrame =
    s.read.schema(schema).json(path)

  def readWholeText(s: SparkSession, glob: String): DataFrame = {
    import s.implicits._
    s.sparkContext.wholeTextFiles(glob).toDF("path", "contents")
  }

  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  def readOrc(s: SparkSession, path: String): DataFrame = s.read.orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  /** Hive-style partitioned layout: one directory per partition value;
    * a reader filtering on the partition column scans only those dirs
    * (partition pruning — the 100 TB table layout). */
  def writePartitioned(df: DataFrame, path: String, cols: String*): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(cols: _*).parquet(path)

  /** Bucketed + sorted table: co-locates join keys at write time so
    * equi-joins between co-bucketed tables skip the shuffle entirely. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      nBuckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, bucketCol).sortBy(bucketCol)
      .format("parquet").saveAsTable(table)

  /** Tolerant JSONL ingest with corrupt-row quarantine. At 100 TB some
    * lines WILL be malformed; FAILFAST kills a 6-hour job on one bad
    * byte and DROPMALFORMED silently loses data — this returns
    * (parsed, quarantine): every input line lands in exactly one of
    * the two, so `count(parsed) + count(quarantine) = lines` is an
    * auditable invariant.
    *
    * Built as text-source + `from_json` rather than the json reader's
    * `_corrupt_record` column: the reader's internal corrupt column
    * can't be referenced without caching the whole parse (Spark
    * disallows corrupt-column-only queries since 2.3), and caching a
    * 100 TB read is not a plan. from_json with an explicit corrupt
    * slot in its schema is a plain projection — both outputs stream.
    * STRICT good: a line whose fields merely fail to cast (PERMISSIVE
    * partial parse) also quarantines — partial rows are how silent
    * nulls leak into a corpus. */
  def readJsonlQuarantine(s: SparkSession, path: String, schema: String)
      : (DataFrame, DataFrame) = {
    import org.apache.spark.sql.functions._
    val corrupt = "_corrupt_record"
    val parsed = s.read.text(path)
      // blank lines (null/empty value) are ingestion noise, not data
      .filter(length(trim(col("value"))) > 0)
      .withColumn("j", from_json(col("value"), s"$schema, $corrupt string",
        Map("columnNameOfCorruptRecord" -> corrupt)))
    // the literal line `null` is valid JSON, so from_json yields a
    // NULL struct WITHOUT setting the corrupt slot — without the
    // j.isNotNull guard it would sail into `good` as an all-null row,
    // the exact silent-null leak this function exists to prevent
    val good = parsed
      .filter(col("j").isNotNull && col(s"j.$corrupt").isNull)
      .select(col("j.*")).drop(corrupt)
    val quarantine = parsed
      .filter(col("j").isNull || col(s"j.$corrupt").isNotNull)
      .select(col("value").as("corrupt_line"))
    (good, quarantine)
  }

  /** Clustered, size-bounded file layout — the compaction pass that
    * keeps a 100 TB table scannable: `repartitionByRange` on the
    * cluster key gives globally range-partitioned files (parquet
    * min/max footer stats then prune row groups for key-range
    * predicates, the poor-man's z-order for a single key), the
    * in-partition sort tightens those stats, and `maxRecordsPerFile`
    * caps file size so no task or downstream reader ever faces a
    * multi-GB straggler file. `nFiles` sizes the layout: target
    * ~128–512 MB per file at real scale. */
  def writeClustered(df: DataFrame, path: String, clusterCol: String,
      nFiles: Int, maxRecordsPerFile: Long): Unit = {
    import org.apache.spark.sql.functions.col
    df.repartitionByRange(nFiles, col(clusterCol))
      .sortWithinPartitions(col(clusterCol))
      .write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(path)
  }

  /** Z-ordered rewrite: cluster a table along TWO columns at once so
    * filters on EITHER prune most files — the multi-dimension
    * counterpart of [[writeClustered]] (which perfects one dimension
    * at the cost of the other). Both columns are normalized onto a
    * 21-bit integer grid (exact integer scaling by the column max, so
    * the curve adapts to any data scale), interleaved into a 42-bit
    * Morton key — queries.DataLayout.mortonKey, the SAME definition
    * layout_zorder_stats audits — then range-partitioned and sorted
    * by the key. No global sort: repartitionByRange samples the key,
    * each task sorts its range. ParquetLayoutAuditSpec proves the
    * payoff on the written files: both dimensions' per-row-group
    * spans stay bounded for the TYPICAL group (a segment straddling a
    * high-order curve boundary can still span one dim — z-order
    * skipping is statistical, not worst-case), where a 1-D clustered
    * write leaves the second dimension spanning the full domain in
    * EVERY group.
    * Columns must be non-negative integers (ids, bucketed values,
    * epoch days) — the normalization is integer algebra. */
  def writeZOrdered(df: DataFrame, path: String, colX: String,
      colY: String, nFiles: Int, maxRecordsPerFile: Long): Unit = {
    import org.apache.spark.sql.functions._
    val mx = df.agg(max(col(colX)).cast("long").as("xm"),
      max(col(colY)).cast("long").as("ym"))
    df.crossJoin(broadcast(mx))
      .withColumn("__zx", expr(s"(CAST($colX AS BIGINT) * 2097152) DIV (xm + 1)"))
      .withColumn("__zy", expr(s"(CAST($colY AS BIGINT) * 2097152) DIV (ym + 1)"))
      .withColumn("__zkey",
        graft.queries.DataLayout.mortonKey(col("__zx"), col("__zy")))
      .repartitionByRange(nFiles, col("__zkey"))
      .sortWithinPartitions(col("__zkey"))
      .drop("xm", "ym", "__zx", "__zy", "__zkey")
      .write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(path)
  }

  /** MERGE/upsert for plain-parquet corpora — the snapshot-refresh
    * pass of a living training set (re-crawled docs replace their old
    * versions, takedowns delete) without a table format: the new
    * snapshot is computed functionally and written to a NEW directory,
    * so readers of the old snapshot are never disturbed (swap = point
    * the next pipeline run at the new path; lineage stays auditable).
    * `outDir` must be new or empty — a non-empty outDir (e.g. the
    * current snapshot) is refused loudly instead of being clobbered
    * mid-read.
    *
    * Semantics per key: update row wins over target row; an update row
    * with `tombstoneCol = true` (when the column is present) deletes
    * the key from the snapshot. Duplicate keys WITHIN each input are a
    * contract violation and fail loudly under the count check rather
    * than silently picking a survivor.
    *
    * Scale shape: one union + one hash-shuffle on the key (the
    * row_number window's partition key) — the same single-shuffle
    * topology as a shuffle join; no broadcast of either side is
    * assumed, no driver-side state. At 100 TB pair it with
    * [[writeClustered]] on the key so successive snapshots stay
    * range-laid-out. */
  def upsertSnapshot(target: DataFrame, updates: DataFrame, key: String,
      outDir: String, tombstoneCol: String = "deleted"): Unit = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // the tombstone name is control metadata: a target DATA column of
    // that name would be clobbered by the lit(false) below and dropped
    // from the snapshot — refuse instead of silently destroying it
    if (target.columns.contains(tombstoneCol))
      throw new IllegalArgumentException(
        s"upsertSnapshot: target already has a '$tombstoneCol' column — " +
          "pass a non-colliding tombstoneCol")
    // NULL tombstone (nullable CDC feeds) means "not deleted", not
    // "drop the row": an un-coalesced !NULL filter would silently
    // delete the key
    val u = if (updates.columns.contains(tombstoneCol))
      updates.withColumn(tombstoneCol,
        coalesce(col(tombstoneCol), lit(false)))
      else updates.withColumn(tombstoneCol, lit(false))
    val merged = target.withColumn(tombstoneCol, lit(false))
      .withColumn("__src", lit(0))
      .unionByName(u.withColumn("__src", lit(1)))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(key)).orderBy(col("__src").desc)))
      .withColumn("__nk", count(lit(1)).over(
        Window.partitionBy(col(key), col("__src"))))
    // per-input key uniqueness: a key appearing twice on ONE side makes
    // "update wins" ambiguous — fail, don't guess. limit(1) keeps the
    // probe cheap; it is a second pass over the union, the price of a
    // loud contract (callers that pre-dedup can see it as a no-op scan).
    if (merged.filter(col("__nk") > 1).limit(1).count() > 0)
      throw new IllegalArgumentException(
        s"upsertSnapshot: duplicate '$key' values within one input — " +
          "latest-wins is ambiguous; dedup inputs first")
    // The documented contract is "readers of the old snapshot are
    // never disturbed" — a blind Overwrite would let a caller who
    // passes the CURRENT snapshot dir as outDir destroy it mid-read.
    // New-dir-per-snapshot is the contract: refuse any NON-EMPTY
    // outDir (an empty pre-created dir is fine — mkdir-then-write is
    // common), then Overwrite is safe on what remains.
    val outPath = new org.apache.hadoop.fs.Path(outDir)
    val fs = outPath.getFileSystem(target.sparkSession.sparkContext.hadoopConfiguration)
    if (fs.exists(outPath) && fs.listStatus(outPath).nonEmpty)
      throw new IllegalArgumentException(
        s"upsertSnapshot: outDir '$outDir' is non-empty — snapshots are " +
          "written to a NEW directory; refusing to clobber existing data")
    merged.filter(col("__rn") === 1 && !col(tombstoneCol))
      .drop("__src", "__rn", "__nk", tombstoneCol)
      .write.mode(SaveMode.Overwrite).parquet(outDir)
  }

  /** Small-file compaction — the standing maintenance pass of any
    * incrementally-written 100 TB corpus: streaming sinks and
    * per-batch appends leave thousands of KB-sized files, and every
    * downstream scan then pays one task schedule + one footer read +
    * one open PER FILE (at 100k files the scheduler overhead dwarfs
    * the I/O). Rewrites the table into ~`targetRecordsPerFile`-row
    * files, preserving a hive-style partition layout when
    * `partitionCols` is given.
    *
    * Same new-directory contract as [[upsertSnapshot]]: the compacted
    * table lands in a NEW dir and the caller swaps readers over —
    * compact-in-place would destroy the table under concurrent
    * readers, so a non-empty `outDir` is refused loudly.
    *
    * Scale shape: ONE shuffle. Partitioned tables hash-shuffle on the
    * partition columns, so each partition's rows land in exactly one
    * task → one output file per partition dir, split only by
    * `maxRecordsPerFile` (= target) for oversized partitions. A
    * heavily skewed giant partition serializes on its one writer task
    * by design — per-partition-dir file count is the thing being
    * minimized; tables needing parallel rewrite of one huge partition
    * want [[writeClustered]] on a data column instead.
    * Unpartitioned tables round-robin into ceil(rows / target) tasks
    * (row count comes from parquet footers — metadata, not a scan). */
  def compact(s: SparkSession, inDir: String, outDir: String,
      targetRecordsPerFile: Long,
      partitionCols: Seq[String] = Nil): Unit = {
    import org.apache.spark.sql.functions.col
    require(targetRecordsPerFile > 0, "targetRecordsPerFile must be > 0")
    val outPath = new org.apache.hadoop.fs.Path(outDir)
    val fs = outPath.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(outPath) && fs.listStatus(outPath).nonEmpty)
      throw new IllegalArgumentException(
        s"compact: outDir '$outDir' is non-empty — compacted tables are " +
          "written to a NEW directory; refusing to clobber existing data")
    val df = s.read.option("basePath", inDir).parquet(inDir)
    if (partitionCols.isEmpty) {
      val n = math.max(1,
        math.ceil(df.count().toDouble / targetRecordsPerFile).toInt)
      df.repartition(n)
        .write.mode(SaveMode.Overwrite)
        .option("maxRecordsPerFile", targetRecordsPerFile)
        .parquet(outDir)
    } else {
      df.repartition(partitionCols.map(col): _*)
        .write.mode(SaveMode.Overwrite)
        .option("maxRecordsPerFile", targetRecordsPerFile)
        .partitionBy(partitionCols: _*)
        .parquet(outDir)
    }
  }
}
