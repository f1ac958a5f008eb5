package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.connector.expressions.aggregate.Aggregation
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.metric.{CustomMetric, CustomTaskMetric}
import org.apache.spark.sql.connector.read.{Batch, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownRequiredColumns, SupportsPushDownVariantExtractions, VariantExtraction}
import org.apache.spark.sql.connector.read.streaming.MicroBatchStream
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.types.StructType

/** [[ParquetScanBuilder]] with a micro-batch face: every pushdown
  * interface forwards VERBATIM to the wrapped builder (batch planning
  * — filters, pruning, aggregates, the manifest-fed file index
  * underneath — is bit-identical to the unwrapped one), and the built
  * scan additionally answers `toMicroBatchStream` with the store's
  * tail stream, which Spark's own `ParquetScan` refuses. This is what
  * lets ONE `Table.newScanBuilder` serve both `SELECT` and
  * `spark.readStream.table(...)` over a store table.
  *
  * Lives inside Spark's namespace ONLY because
  * `SupportsPushDownCatalystFilters` (the interface V2 pushdown
  * actually drives file sources through) is `private[sql]` — the same
  * access seam as [[bridge]]; all tail-stream logic stays in
  * `graft.streaming`. */
final class StreamCapableScanBuilder(val inner: ParquetScanBuilder,
    mkStream: (StructType, String) => MicroBatchStream)
  extends ScanBuilder
    with SupportsPushDownCatalystFilters
    with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates
    with SupportsPushDownVariantExtractions {

  override def pushFilters(filters: Seq[Expression]): Seq[Expression] =
    inner.pushFilters(filters)
  override def pushedFilters(): Array[Predicate] = inner.pushedFilters
  override def pruneColumns(requiredSchema: StructType): Unit =
    inner.pruneColumns(requiredSchema)
  override def supportCompletePushDown(agg: Aggregation): Boolean =
    inner.supportCompletePushDown(agg)
  override def pushAggregation(agg: Aggregation): Boolean =
    inner.pushAggregation(agg)
  override def pushVariantExtractions(
      extractions: Array[VariantExtraction]): Array[Boolean] =
    inner.pushVariantExtractions(extractions)

  override def build(): Scan = new StreamCapableScan(inner.build(), mkStream)
}

/** Forward for `SupportsStreamingUpdateAsAppend` (`private[sql]`):
  * a `WriteBuilder` mixing this in tells Spark's streaming planner
  * that Update output mode may ride the sink's append path — exactly
  * right for a store table whose "append" IS a keyed LWW upsert
  * ([[graft.streaming.StoreStreamWrite]]). Same access seam as
  * [[StreamCapableScanBuilder]]; no logic lives here. */
trait StreamUpdateAsAppendBuilder
  extends org.apache.spark.sql.internal.connector.SupportsStreamingUpdateAsAppend

/** The built twin of [[StreamCapableScanBuilder]]: batch members
  * delegate to the wrapped `ParquetScan` (same Batch, same columnar
  * mode, same metrics), `toMicroBatchStream` is the added face. */
final class StreamCapableScan(val inner: Scan,
    mkStream: (StructType, String) => MicroBatchStream) extends Scan {
  override def readSchema(): StructType = inner.readSchema()
  override def toBatch: Batch = inner.toBatch
  override def toMicroBatchStream(
      checkpointLocation: String): MicroBatchStream =
    mkStream(readSchema(), checkpointLocation)
  override def description(): String = inner.description()
  override def supportedCustomMetrics(): Array[CustomMetric] =
    inner.supportedCustomMetrics()
  override def reportDriverMetrics(): Array[CustomTaskMetric] =
    inner.reportDriverMetrics()
  override def columnarSupportMode(): Scan.ColumnarSupportMode =
    inner.columnarSupportMode()
}
