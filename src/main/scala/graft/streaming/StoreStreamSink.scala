package graft.streaming

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.hadoop.{ParquetFileWriter, ParquetWriter}
import org.apache.parquet.hadoop.api.WriteSupport
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{DataWriter, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.StructType

import graft.ops.ParquetTableStore

/** One staged partition file of a streaming epoch (null path = the
  * task saw zero rows and staged nothing). */
final case class StagedFileMessage(path: String, rows: Long)
  extends WriterCommitMessage

/** The store as a STREAMING SINK through the V2 catalog —
  * `df.writeStream.toTable("<cat>.<t>")` ([[graft.sources.GraftTable]]
  * answers `STREAMING_WRITE` with this; st18's tail stream is the
  * source half of the same loop).
  *
  * Shape: executors stage each epoch's partitions as plain parquet
  * under the table's `tmp-stream-<queryId>/epoch=<n>` dir (written
  * with Spark's own `ParquetWriteSupport` — `InternalRow` in, no row
  * conversion, no driver relay of data); the driver-side epoch commit
  * reads EXACTLY the staged paths named in the commit messages back
  * as one frame and folds it through the store protocol — the keyed
  * LWW [[ParquetTableStore.upsertBucketed]] (Append/Update mode) or
  * [[ParquetTableStore.replaceBucketed]] (Complete mode), under
  * [[ParquetTableStore.withCommitRetries]] like any other committer.
  *
  * Exactly-once: Spark re-delivers the last epoch after a restart
  * whose store commit landed but whose checkpoint commit log did not.
  * Two guards make the replay a no-op: the per-query epoch watermark
  * ([[ParquetTableStore.recordStreamEpoch]], CAS-protected) skips a
  * re-delivered epoch outright, and the LWW merge itself is
  * idempotent on replayed content — which is also WHY streaming
  * writes require a bucketed keyed table: a snapshot append replay
  * would duplicate rows with no key to converge on
  * ([[graft.sources.GraftTable]] refuses those at plan time).
  *
  * At 100 TB the shape holds: staging is embarrassingly parallel
  * executor-local parquet I/O on the table's (shared) filesystem, the
  * epoch fold is the same O(touched-buckets) bucketed upsert every
  * batch writer pays, and a crashed query's staging is reclaimed by
  * [[ParquetTableStore.gc]]'s age-gated `tmp-*` sweep. */
final class StoreStreamWrite(store: ParquetTableStore, table: String,
    schema: StructType, queryId: String, replaceEach: Boolean,
    keys: Seq[String], numBuckets: Int) extends StreamingWrite {

  private val stagingBase: String =
    store.streamStagingDir(table, queryId, 0L).getParent.toString

  /** The keys `ParquetWriteSupport.init` (and its schema converter)
    * resolve with no default — pinned here rather than snapshotted
    * from the session so executor staging is deterministic: micros
    * timestamps, no legacy layout, no Julian rebase (the store never
    * holds pre-Gregorian data, same stance as the store's own
    * writes), field ids and variant annotation at their session
    * defaults. */
  private val confPairs: Map[String, String] = Map(
    SQLConf.PARQUET_WRITE_LEGACY_FORMAT.key -> "false",
    SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE.key -> "TIMESTAMP_MICROS",
    SQLConf.PARQUET_REBASE_MODE_IN_WRITE.key -> "CORRECTED",
    SQLConf.PARQUET_INT96_REBASE_MODE_IN_WRITE.key -> "CORRECTED",
    SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED.key -> "true",
    SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE.key -> "true")

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new StoreStagingWriterFactory(stagingBase, schema, confPairs)

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val paths = messages.collect {
      case m: StagedFileMessage if m.path != null => m.path
    }
    if (store.lastStreamEpoch(table, queryId).exists(_ >= epochId)) {
      // replayed epoch (restart re-delivered it): already folded
      dropEpochDir(epochId)
      return
    }
    val s = SparkSession.active
    if (paths.nonEmpty || replaceEach) {
      // nullable-relaxed read schema: a parquet RELATION is always
      // relaxed (arrays containsNull=true regardless of footer), so a
      // strict schema here would demand a narrowing cast Spark
      // refuses — and the store's merge aligns against the canonical
      // schema anyway
      val readSchema = graft.ops.SchemaEvolution.relax(schema)
        .asInstanceOf[StructType]
      val df =
        if (paths.isEmpty)
          s.createDataFrame(java.util.Collections.emptyList[Row](),
            readSchema)
        else s.read.schema(readSchema).parquet(paths.toIndexedSeq: _*)
      store.withCommitRetries() {
        if (replaceEach) store.replaceBucketed(s, table, df, keys, numBuckets)
        else store.upsertBucketed(s, table, df, keys)
      }
    }
    store.recordStreamEpoch(table, queryId, epochId)
    dropEpochDir(epochId)
  }

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit =
    dropEpochDir(epochId)

  private def dropEpochDir(epochId: Long): Unit = {
    val dir = store.streamStagingDir(table, queryId, epochId)
    if (Files.exists(dir)) {
      val s = Files.walk(dir)
      try s.sorted(java.util.Comparator.reverseOrder[Path]())
        .iterator().asScala.foreach(Files.deleteIfExists(_))
      finally s.close()
    }
  }
}

/** Serializable executor half: builds one staging writer per task.
  * Carries only strings + the schema — the Hadoop `Configuration` is
  * rebuilt per writer from the pinned pairs. */
final class StoreStagingWriterFactory(stagingBase: String,
    schema: StructType, confPairs: Map[String, String])
  extends StreamingDataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] = {
    val dir = Paths.get(stagingBase, s"epoch=$epochId")
    Files.createDirectories(dir)
    new StoreStagingDataWriter(
      dir.resolve(s"part-$partitionId-$taskId.parquet").toString,
      schema, confPairs)
  }
}

/** Stages one partition's rows as one parquet file via Spark's
  * `ParquetWriteSupport` (InternalRow straight to parquet pages — the
  * same write path `ParquetFileFormat` uses, minus the committer
  * machinery the store protocol replaces). Opens lazily so an empty
  * partition stages nothing at all. */
final class StoreStagingDataWriter(path: String, schema: StructType,
    confPairs: Map[String, String]) extends DataWriter[InternalRow] {

  private var writer: ParquetWriter[InternalRow] = _
  private var rows = 0L

  private def open(): ParquetWriter[InternalRow] = {
    val conf = new Configuration()
    ParquetWriteSupport.setSchema(schema, conf)
    confPairs.foreach { case (k, v) => conf.set(k, v) }
    new StoreStagingDataWriter.Builder(new HPath(path))
      .withConf(conf)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .withWriteMode(ParquetFileWriter.Mode.OVERWRITE)
      .build()
  }

  override def write(row: InternalRow): Unit = {
    if (writer == null) writer = open()
    writer.write(row)
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    if (writer != null) writer.close()
    StagedFileMessage(if (rows > 0) path else null, rows)
  }

  override def abort(): Unit = {
    if (writer != null) writer.close()
    Files.deleteIfExists(Paths.get(path))
  }

  override def close(): Unit = ()
}

object StoreStagingDataWriter {
  private final class Builder(p: HPath)
    extends ParquetWriter.Builder[InternalRow, Builder](p) {
    override def self(): Builder = this
    override def getWriteSupport(conf: Configuration)
        : WriteSupport[InternalRow] = new ParquetWriteSupport
  }
}
