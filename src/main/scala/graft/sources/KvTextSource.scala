package graft.sources

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 connector for the reference engine's shuffle-
  * intermediate format: text lines `key|value` (one file per map task
  * × reduce bucket, /root/reference/mr/worker.go:72-96). Lines that
  * don't split into exactly two parts are dropped, mirroring the
  * reference's parser (worker.go:128-129).
  *
  * Connector shape for scale: one InputPartition per file (the
  * reference's own parallelism unit), column pruning pushed into the
  * reader (SupportsPushDownRequiredColumns) so `select(key)` never
  * materializes values.
  *
  * Usage: spark.read.format("graft.sources.KvTextSource").load(dir)
  */
class KvTextSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KvTextSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new KvTextTable(properties.get("path"))
  override def supportsExternalMetadata(): Boolean = false
}

object KvTextSource {
  val schema: StructType = StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("value", StringType, nullable = false)))
}

class KvTextTable(path: String) extends Table with SupportsRead {
  require(path != null, "kvtext requires a path: .load(dir)")
  override def name(): String = s"kvtext($path)"
  override def schema(): StructType = KvTextSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new KvTextScanBuilder(path)
}

class KvTextScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = KvTextSource.schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new KvTextScan(path, required)
}

class KvTextScan(path: String, required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"kvtext $path readSchema=${required.fieldNames.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] = {
    val f = new java.io.File(path)
    if (!f.exists())
      throw new IllegalArgumentException(s"kvtext: path does not exist: $path")
    val files =
      if (f.isDirectory) {
        val listed = f.listFiles() // null on IO/permission failure
        if (listed == null)
          throw new java.io.IOException(s"kvtext: cannot list directory $path")
        listed.filter(_.isFile).map(_.getPath).sorted
      } else Array(path)
    files.map(p => KvTextPartition(p): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new KvTextReaderFactory(required.fieldNames)
}

case class KvTextPartition(file: String) extends InputPartition

class KvTextReaderFactory(fields: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[KvTextPartition].file
    // projection resolved once, not per line: parts index per output field
    val fieldIdx = fields.map { case "key" => 0; case "value" => 1 }
    new PartitionReader[InternalRow] {
      private val lines = scala.io.Source.fromFile(file, "UTF-8")
      private val it = lines.getLines()
      private var current: InternalRow = _

      override def next(): Boolean = {
        while (it.hasNext) {
          val parts = it.next().split('|')
          if (parts.length == 2) { // malformed lines dropped (worker.go:129)
            val values = new Array[Any](fieldIdx.length)
            var i = 0
            while (i < fieldIdx.length) {
              values(i) = UTF8String.fromString(parts(fieldIdx(i)))
              i += 1
            }
            current = new org.apache.spark.sql.catalyst.expressions
              .GenericInternalRow(values)
            return true
          }
        }
        false
      }
      override def get(): InternalRow = current
      override def close(): Unit = lines.close()
    }
  }
}
