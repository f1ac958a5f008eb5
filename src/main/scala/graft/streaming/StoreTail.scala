package graft.streaming

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.example.data.Group
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.ops.ParquetTableStore

/** A store table's publish sequence as a Structured Streaming OFFSET:
  * micro-batch N..M is "what versions N+1..M added". JSON shape is
  * pinned (checkpoints must survive library upgrades). version = -1
  * is the pre-snapshot origin: the next batch delivers the whole
  * current version. */
final case class StoreVersionOffset(version: Long) extends Offset {
  override val json: String = s"""{"version":$version}"""
}

object StoreVersionOffset {
  private val Re = """\{"version":(-?\d+)\}""".r
  def parse(json: String): StoreVersionOffset = json.trim match {
    case Re(v) => StoreVersionOffset(v.toLong)
    case other => throw new IllegalArgumentException(
      s"not a store tail offset: $other")
  }
}

/** THE STORE AS A STREAMING SOURCE — `spark.readStream.table(
  * "<cat>.<t>")` over a [[graft.sources.GraftCatalog]] table:
  *
  *  - **Offsets are store versions** (the CAS publish sequence): the
  *    exactly-once contract costs nothing extra because the store
  *    already has a total commit order. Batch (v1, v2] = the files
  *    version v2's manifest names that v1's does not — hard links
  *    preserve file names, so an untouched bucket provably
  *    contributes nothing and the diff is two driver-side sidecar
  *    parses, no Spark job and no listing.
  *  - **First batch = the current snapshot** (offset −1 → head), the
  *    Delta-style initial load; subsequent batches are deltas.
  *  - **Append-only tail contract**: a span that REMOVED files (an
  *    upsert/delete/compaction rewrote buckets) refuses loudly —
  *    new-file rows on a rewrite span are NOT the row-level change
  *    feed, and serving them would double-count every cohabitant row
  *    in a rewritten bucket. Rewrite consumers belong on
  *    [[graft.ops.ParquetTableStore.changesBetween]] +
  *    `applyChangesBucketed` (the st15/st16 loops); this source is
  *    the ingest-tail shape (append-bucketed inboxes, pinned-append
  *    ledgers) where additions ARE the inserts.
  *  - **Retention protection**: every committed batch re-registers a
  *    consumer cursor at the batch's end version, so a live stream's
  *    read base cannot be pruned out from under its next planning
  *    cycle (the u18/u22 machinery; the debt a stalled stream pins is
  *    visible in `cursorLag` under its consumer id). A stream that
  *    stalls past `protectCap` loses the race by design and restarts
  *    from a fresh snapshot via the typed
  *    [[graft.ops.RetentionLostException]].
  *
  * The executor-side reader is row-based (parquet example `Group`s) —
  * deliberately: batches are DELTA-sized, and a delta reader that
  * needs no session state serializes trivially; the bulk/batch path
  * keeps Spark's vectorized parquet reader through the V2 scan. */
final class StoreTailStream(store: ParquetTableStore, table: String,
    readSchema: StructType, consumer: String)
  extends MicroBatchStream with SupportsTriggerAvailableNow {

  override def initialOffset(): Offset = StoreVersionOffset(-1L)

  /** `Trigger.AvailableNow` contract: the endpoint is FROZEN when the
    * run starts — versions published while the run drains are the
    * NEXT run's work, never a moving goalpost. */
  private var availableNowCap: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(store.currentVersion(table).getOrElse(-1L))

  private def head: Long = availableNowCap.getOrElse(
    store.currentVersion(table).getOrElse(-1L))

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(start, limit) — this stream does admission control")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    StoreVersionOffset(head)

  override def reportLatestOffset(): Offset = StoreVersionOffset(head)

  override def deserializeOffset(json: String): Offset =
    StoreVersionOffset.parse(json)

  private def filesOf(version: Long): Seq[(String, String, Long)] = {
    val spec = store.scanSpecAt(table, Some(version))
    spec.files.map { case (rel, bytes) =>
      (rel, spec.rootDir.stripSuffix("/") + "/" + rel, bytes)
    }
  }

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val from = start.asInstanceOf[StoreVersionOffset].version
    val to = end.asInstanceOf[StoreVersionOffset].version
    if (to < 0 || to == from) return Array.empty
    val toFiles = filesOf(to)
    val added =
      if (from < 0) toFiles
      else {
        val fromFiles = filesOf(from)
        val fromNames = fromFiles.map(_._1).toSet
        val removed = fromNames -- toFiles.map(_._1).toSet
        if (removed.nonEmpty) throw new IllegalStateException(
          s"store tail of $table: span v$from→v$to removed " +
            s"${removed.size} file(s) — an upsert/delete/compaction " +
            "rewrote buckets, and new-file rows on a rewrite span are " +
            "not the change feed (cohabitant rows would double-count). " +
            "Consume rewrites via changesBetween/applyChangesBucketed, " +
            "or restart the stream to re-snapshot.")
        toFiles.filterNot(f => fromNames.contains(f._1))
      }
    // register the consumer cursor at the batch END as part of
    // PLANNING, not only in commit(): `to` is the next batch's diff
    // base, and Spark only calls commit() when a subsequent batch
    // runs — a Trigger.AvailableNow one-shot would otherwise leave
    // the base unprotected between runs and a publish burst could
    // prune it (forcing a re-snapshot where a delta sufficed). Plan
    // -time registration over-protects by at most one failed batch,
    // bounded by protectCap and visible in cursorLag.
    store.registerCursor(table, consumer, to)
    added.map(f => TailFilePartition(f._2): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new TailReaderFactory(readSchema.json)

  /** A committed batch advances the stream's consumer cursor — the
    * at-least-this-fresh floor retention must respect (u18). */
  override def commit(end: Offset): Unit = {
    val v = end.asInstanceOf[StoreVersionOffset].version
    if (v >= 0) store.registerCursor(table, consumer, v)
  }

  override def stop(): Unit = ()
}

final case class TailFilePartition(path: String) extends InputPartition

final class TailReaderFactory(readSchemaJson: String)
  extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new TailFileReader(p.asInstanceOf[TailFilePartition].path,
      DataType.fromJson(readSchemaJson).asInstanceOf[StructType])
}

/** Row-based parquet reader for ONE tail file: projects `schema`'s
  * fields by NAME from each record (a file predating an add-only
  * schema evolution simply reads the evolved columns as null — the
  * store's canonical-schema contract), converting to Catalyst
  * internal values. Flat + array-of-primitive schemas only — exactly
  * what store tables hold; anything else refuses typed rather than
  * corrupting silently. */
final class TailFileReader(path: String, schema: StructType)
  extends PartitionReader[InternalRow] {

  private val reader: ParquetReader[Group] =
    ParquetReader.builder(new GroupReadSupport(),
      new org.apache.hadoop.fs.Path(path))
      .withConf(new Configuration()).build()
  private var row: InternalRow = _

  override def next(): Boolean = {
    val g = reader.read()
    if (g == null) false
    else { row = convert(g); true }
  }

  override def get(): InternalRow = row
  override def close(): Unit = reader.close()

  private def convert(g: Group): InternalRow = {
    val gt = g.getType
    val vals = new Array[Any](schema.length)
    var i = 0
    while (i < schema.length) {
      val f = schema.fields(i)
      vals(i) =
        if (!gt.containsField(f.name)) null
        else {
          val idx = gt.getFieldIndex(f.name)
          if (g.getFieldRepetitionCount(idx) == 0) null
          else value(g, idx, f.dataType)
        }
      i += 1
    }
    new GenericInternalRow(vals)
  }

  private def value(g: Group, idx: Int, dt: DataType): Any = dt match {
    case LongType => g.getLong(idx, 0)
    case IntegerType => g.getInteger(idx, 0)
    case DoubleType => g.getDouble(idx, 0)
    case FloatType => g.getFloat(idx, 0)
    case BooleanType => g.getBoolean(idx, 0)
    case StringType => UTF8String.fromBytes(g.getBinary(idx, 0).getBytes)
    case BinaryType => g.getBinary(idx, 0).getBytes
    case DateType => g.getInteger(idx, 0)
    case TimestampType =>
      g.getType.getType(idx).asPrimitiveType().getPrimitiveTypeName match {
        case org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT64 =>
          g.getLong(idx, 0) // micros (TIMESTAMP_MICROS writer)
        case org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT96 =>
          int96Micros(g.getInt96(idx, 0).getBytes)
        case other => throw new UnsupportedOperationException(
          s"store tail: timestamp stored as $other is not supported")
      }
    case ArrayType(et, _) =>
      // Spark's standard 3-level list: f (LIST) > repeated list > element
      val list = g.getGroup(idx, 0)
      val n = list.getFieldRepetitionCount(0)
      val out = new Array[Any](n)
      var i = 0
      while (i < n) {
        val e = list.getGroup(0, i)
        out(i) = if (e.getFieldRepetitionCount(0) == 0) null
          else value(e, 0, et)
        i += 1
      }
      new GenericArrayData(out)
    case other => throw new UnsupportedOperationException(
      s"store tail: column type $other is not supported by the tail " +
        "reader (flat + array-of-primitive schemas only)")
  }

  /** Legacy INT96 timestamp: 8 bytes nanos-of-day + 4 bytes julian
    * day, little-endian — to epoch micros. */
  private def int96Micros(b: Array[Byte]): Long = {
    val buf = java.nio.ByteBuffer.wrap(b)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val nanosOfDay = buf.getLong
    val julianDay = buf.getInt
    (julianDay - 2440588L) * 86400000000L + nanosOfDay / 1000L
  }
}
