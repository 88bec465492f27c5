package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout audit over parquet row-group footers — the
  * metadata layer that decides whether data skipping works at 100 TB.
  *
  * A filter on a clustered column prunes every row group whose
  * [min, max] range misses the predicate; pruning effectiveness is
  * exactly the OVERLAP structure of those ranges. This operator reads
  * the footers (metadata only — never row data), emits per-row-group
  * stats, and scores each group by how many other groups' ranges
  * intersect it: 0 overlaps everywhere = a point lookup touches one
  * group; n overlaps = it touches n+1. [[graft.sources.IO
  * .writeClustered]] exists to drive that number to zero; the spec
  * pins both directions (clustered ⇒ 0, hash-shuffled ⇒ > 0).
  *
  * Scale shape: footer reads are distributed — the file list is
  * parallelized and each task opens only its files' footers (a few KB
  * each), the same access pattern a table-format metadata layer uses.
  * The overlap self-join runs on one row per ROW GROUP (a 100 TB
  * table at 128 MB groups is ~800 K rows — a broadcast-sized frame),
  * never on data rows.
  */
object ParquetLayoutAudit {

  /** Per-row-group footer stats for a long-typed column.
    * @return (file, rg_idx, n_rows, bytes, col_min, col_max) — one row
    *         per row group, ordered by (file, rg_idx); col_min/max are
    *         the footer's column statistics for `column` (null when
    *         the writer recorded no stats). */
  def rowGroupStats(spark: SparkSession, path: String, column: String)
      : DataFrame = {
    import spark.implicits._
    import org.apache.hadoop.fs.Path
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = (if (fs.getFileStatus(p).isDirectory)
      fs.listStatus(p).filter(_.isFile).map(_.getPath)
        .filter(_.getName.endsWith(".parquet"))
      else Array(p)).map(_.toString).sorted.toSeq
    spark.createDataset(files)
      .repartition(math.min(files.size,
        spark.sparkContext.defaultParallelism))
      .mapPartitions { it =>
        // a fresh Configuration per task: testdata-style paths carry
        // their scheme, so no session conf is needed to resolve them
        val conf = new org.apache.hadoop.conf.Configuration()
        it.flatMap { f =>
          val in = org.apache.parquet.hadoop.util.HadoopInputFile
            .fromPath(new Path(f), conf)
          val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try {
            val blocks = reader.getFooter.getBlocks
            (0 until blocks.size()).map { i =>
              val b = blocks.get(i)
              val cc = b.getColumns.asScala
                .find(_.getPath.toDotString == column)
              val (mn, mx) = cc.map(_.getStatistics) match {
                case Some(st) if st != null && st.hasNonNullValue =>
                  (st.genericGetMin, st.genericGetMax) match {
                    case (a: java.lang.Long, b2: java.lang.Long) =>
                      (Option(a.longValue), Option(b2.longValue))
                    case (a: java.lang.Integer, b2: java.lang.Integer) =>
                      (Option(a.longValue), Option(b2.longValue))
                    case _ => (None, None)
                  }
                case _ => (None, None)
              }
              (f.split('/').last, i, b.getRowCount, b.getTotalByteSize,
                mn, mx)
            }
          } finally reader.close()
        }
      }
      .toDF("file", "rg_idx", "n_rows", "bytes", "col_min", "col_max")
      .orderBy(col("file"), col("rg_idx"))
  }

  /** Overlap score per row group + the point-lookup cost it implies:
    * n_overlaps = how many OTHER groups' [col_min, col_max] ranges
    * intersect this one. Perfectly clustered data scores 0 everywhere.
    * Runs entirely on the (tiny) stats frame. */
  def overlapReport(stats: DataFrame): DataFrame = {
    val a = stats.select(col("file").as("f_a"), col("rg_idx").as("i_a"),
      col("col_min").as("mn_a"), col("col_max").as("mx_a"))
    val b = stats.select(col("file").as("f_b"), col("rg_idx").as("i_b"),
      col("col_min").as("mn_b"), col("col_max").as("mx_b"))
    val overlaps = a.join(broadcast(b),
        (col("f_a") =!= col("f_b") || col("i_a") =!= col("i_b")) &&
          col("mn_a") <= col("mx_b") && col("mn_b") <= col("mx_a"))
      .groupBy(col("f_a"), col("i_a"))
      .agg(count(lit(1)).as("n_overlaps"))
    stats.join(overlaps,
        col("file") === col("f_a") && col("rg_idx") === col("i_a"),
        "left")
      .select(col("file"), col("rg_idx"), col("n_rows"),
        col("col_min"), col("col_max"),
        coalesce(col("n_overlaps"), lit(0L)).as("n_overlaps"))
      .orderBy(col("file"), col("rg_idx"))
  }

  private implicit class JListOps[T](l: java.util.List[T]) {
    def asScala: Seq[T] = {
      val b = Seq.newBuilder[T]
      val it = l.iterator()
      while (it.hasNext) b += it.next()
      b.result()
    }
  }
}
