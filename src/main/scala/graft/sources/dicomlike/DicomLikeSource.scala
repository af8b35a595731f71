package graft.sources.dicomlike

import java.util
import scala.jdk.CollectionConverters._
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 for the DICOM-shaped binary format (fixed-offset
  * header at byte 128, see graft.ingest.DicomLike) with **projection
  * pushdown into the file reader**: when the `content` column is not in
  * the required schema, each file read stops after the 154-byte header —
  * the reference's `stop_before_pixels` (Exam_info.py:130) enforced at
  * the source instead of hoped-for in a UDF.
  *
  * Usage: `spark.read.format("graft.sources.dicomlike").load(dir)`.
  * Non-DICOM files (bad magic) are skipped at read time (S5 sniff).
  *
  * Scale notes: one input partition per file group (files are
  * split-resistant little blobs); the driver only lists paths, all
  * parsing happens in executors. `BytesReadCounter` exists for tests to
  * prove the payload was never read.
  */
class DicomLikeSource extends TableProvider
  with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "dicomlike"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    DicomLikeSource.fullSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new DicomLikeTable(properties.get("path"))
}

object DicomLikeSource {
  val fullSchema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("series_uid", StringType, nullable = false),
    StructField("instance_number", IntegerType, nullable = false),
    StructField("echo", StringType, nullable = false),
    StructField("expected_count", IntegerType, nullable = false),
    StructField("length", LongType, nullable = false),
    StructField("content", BinaryType, nullable = true)))

  final val HeaderLen = 154
}

/** Test hook: bytes actually read from disk by this source. */
object BytesReadCounter {
  val bytes = new java.util.concurrent.atomic.AtomicLong(0)
  def reset(): Unit = bytes.set(0)
}

class DicomLikeTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"dicomlike($path)"
  override def schema(): StructType = DicomLikeSource.fullSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder = new DicomLikeScanBuilder(path)
}

class DicomLikeScanBuilder(path: String)
  extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = DicomLikeSource.fullSchema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new DicomLikeScan(path, required)
}

class DicomLikeScan(path: String, required: StructType)
  extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val conf = new org.apache.hadoop.conf.Configuration()
    val fs = FileSystem.get(new java.net.URI(path match {
      case p if p.contains("://") => p
      case p => s"file://$p"
    }), conf)
    val it = fs.listFiles(new Path(path), true)
    val files = scala.collection.mutable.ArrayBuffer[(String, Long)]()
    while (it.hasNext) {
      val f = it.next()
      if (f.isFile) files += ((f.getPath.toUri.getPath, f.getLen))
    }
    files.map(f => DicomLikeInputPartition(f._1, f._2): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new DicomLikeReaderFactory(required)
}

case class DicomLikeInputPartition(file: String, len: Long)
  extends InputPartition

class DicomLikeReaderFactory(required: StructType)
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] =
    new DicomLikeReader(
      partition.asInstanceOf[DicomLikeInputPartition], required)
}

class DicomLikeReader(part: DicomLikeInputPartition, required: StructType)
  extends PartitionReader[InternalRow] {

  private val needContent = required.fieldNames.contains("content")
  private var row: InternalRow = _
  private var done = false

  override def next(): Boolean = {
    if (done) return false
    done = true
    val p = java.nio.file.Paths.get(part.file)
    val bytes =
      if (needContent) java.nio.file.Files.readAllBytes(p)
      else { // header-only read: the pushdown payoff
        val ch = java.nio.file.Files.newByteChannel(p)
        try {
          val buf = java.nio.ByteBuffer.allocate(DicomLikeSource.HeaderLen)
          var n = 0
          while (n >= 0 && buf.hasRemaining) n = ch.read(buf)
          buf.array().take(buf.position())
        } finally ch.close()
      }
    BytesReadCounter.bytes.addAndGet(bytes.length.toLong)
    if (bytes.length < DicomLikeSource.HeaderLen ||
        new String(bytes, 128, 4) != "DICM") {
      return false // sniff: not a DICOM-shaped file → skip
    }
    def str(off: Int, len: Int) = new String(bytes, off, len)
    val values: Array[Any] = required.fieldNames.map {
      case "path" => UTF8String.fromString(part.file)
      case "series_uid" => UTF8String.fromString(str(132, 10))
      case "instance_number" => str(142, 4).trim.toInt
      case "echo" => UTF8String.fromString(str(146, 4))
      case "expected_count" => str(150, 4).trim.toInt
      case "length" => part.len
      case "content" => bytes
    }
    row = InternalRow.fromSeq(values.toIndexedSeq)
    true
  }

  override def get(): InternalRow = row
  override def close(): Unit = ()
}
