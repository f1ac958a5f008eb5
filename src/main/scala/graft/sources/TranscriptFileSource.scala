package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.ingest.TranscriptFiles

/** DataSource V2 for the reference's transcript inbox format
  * (add_transcripts.py) — `spark.read.format("transcript-inbox")
  * .load(dir)` yields parsed rows, making the inbox a first-class
  * table instead of an ad-hoc wholeTextFiles pass.
  *
  * V2 surface implemented: TableProvider → SupportsRead →
  * ScanBuilder with column pruning (SupportsPushDownRequiredColumns —
  * a projection of (video_id, valid) never materializes transcript
  * bodies) → Batch with size-binned file partitions (small files pack
  * together; the planner sees one InputPartition per bin, so executor
  * fan-out matches data volume, not file count — the small-files
  * problem is the real 100 TB hazard for inbox-shaped ingest).
  */
class TranscriptFileSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "transcript-inbox"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TranscriptFileSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new TranscriptTable(properties.get("path"))

  override def supportsExternalMetadata(): Boolean = false
}

object TranscriptFileSource {
  val schema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("video_id", StringType, nullable = true),
    StructField("title", StringType, nullable = true),
    StructField("url", StringType, nullable = true),
    StructField("transcript", StringType, nullable = true),
    StructField("valid", BooleanType, nullable = false),
    StructField("reject_reason", StringType, nullable = true)))

  val Extensions: Set[String] = Set("txt", "srt", "vtt")
}

final class TranscriptTable(path: String) extends Table with SupportsRead {
  require(path != null, "transcript-inbox requires a path (use .load(dir))")
  override def name(): String = s"transcript-inbox(`$path`)"
  override def schema(): StructType = TranscriptFileSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TranscriptScanBuilder(path)
}

final class TranscriptScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = TranscriptFileSource.schema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new TranscriptScan(path, required)
}

final class TranscriptScan(path: String, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"TranscriptScan(path=$path, columns=${required.fieldNames.mkString(",")})"

  /** Size-binned partitions: files pack greedily into ~`binBytes`
    * bins so tiny inbox files don't each become a task. */
  override def planInputPartitions(): Array[InputPartition] = {
    val binBytes = 4L * 1024 * 1024
    val files = Files.list(Paths.get(path)).iterator().asScala
      .filter(p => Files.isRegularFile(p))
      .filter { p =>
        val n = p.getFileName.toString
        val i = n.lastIndexOf('.')
        i >= 0 && TranscriptFileSource.Extensions.contains(n.substring(i + 1))
      }
      .map(p => (p.toString, Files.size(p)))
      .toSeq.sortBy(_._1)
    val bins = scala.collection.mutable.ArrayBuffer[scala.collection.mutable.ArrayBuffer[String]]()
    var curSize = 0L
    files.foreach { case (f, sz) =>
      if (bins.isEmpty || curSize + sz > binBytes) {
        bins += scala.collection.mutable.ArrayBuffer(f); curSize = sz
      } else { bins.last += f; curSize += sz }
    }
    bins.map(b => TranscriptFilesPartition(b.toArray): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new TranscriptReaderFactory(required)
}

final case class TranscriptFilesPartition(files: Array[String]) extends InputPartition

final class TranscriptReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new TranscriptReader(
      partition.asInstanceOf[TranscriptFilesPartition].files, required)
}

final class TranscriptReader(files: Array[String], required: StructType)
    extends PartitionReader[InternalRow] {
  private var i = 0
  private var current: InternalRow = _

  private def utf8(o: Option[String]): Any =
    o.map(UTF8String.fromString).orNull

  override def next(): Boolean = {
    if (i >= files.length) return false
    val f = files(i); i += 1
    val content = new String(Files.readAllBytes(Paths.get(f)), StandardCharsets.UTF_8)
    val p = TranscriptFiles.parseContent(f, content)
    val full = Map[String, Any](
      "path" -> UTF8String.fromString(p.path),
      "video_id" -> utf8(p.video_id),
      "title" -> utf8(p.title),
      "url" -> utf8(p.url),
      "transcript" -> utf8(p.transcript),
      "valid" -> p.valid,
      "reject_reason" -> utf8(p.reject_reason))
    current = InternalRow.fromSeq(required.fieldNames.toIndexedSeq.map(full))
    true
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
