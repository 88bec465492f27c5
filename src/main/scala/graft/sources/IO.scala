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
}
