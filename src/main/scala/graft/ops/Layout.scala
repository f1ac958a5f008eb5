package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-ORDER data layout: co-cluster rows on the space-filling curve of
  * two numeric columns so parquet min/max statistics prune on BOTH —
  * a single-column sort gives perfect pruning on one column and none
  * on the other; the z-curve gives useful pruning on each. This is
  * the lakehouse write-path optimization (Delta/Iceberg's OPTIMIZE
  * ZORDER) for the multi-predicate scan patterns the catalog's P
  * rows represent — at 100 TB, file skipping is the difference
  * between touching 1% and 100% of the lake.
  *
  * Mechanics: each column min/max-normalizes to a 16-bit rank (the
  * 1-row bounds frame broadcasts), ranks bit-interleave into a
  * 32-bit z-value (codegen'd shift/mask terms), and the write
  * repartitionByRange's on z — the ONE total-order exchange any
  * clustered write needs — with rows z-sorted within each file.
  * Content is untouched (layout only), which is what the spec pins,
  * along with the measured pruning proxy: mean per-file normalized
  * span shrinks on BOTH columns vs the unordered layout. */
object Layout {

  /** 16-bit min-max rank (0..65535); constant columns rank 0. */
  private def rank16(c: Column, mn: Column, mx: Column): Column =
    when(mx === mn, lit(0L)).otherwise(
      least(floor((c.cast("double") - mn.cast("double"))
        / (mx.cast("double") - mn.cast("double")) * 65536.0), lit(65535.0))
        .cast("long"))

  /** Bit-interleave two 16-bit ranks: x in even bits, y in odd. */
  private def interleave16(x: Column, y: Column): Column =
    (0 until 16).foldLeft(lit(0L)) { (acc, i) =>
      acc +
        shiftright(x, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(y, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }

  /** The input plus a `__z` curve position. */
  def zValue(df: DataFrame, cx: String, cy: String): DataFrame = {
    val bounds = df.agg(
      min(col(cx)).as("__mnx"), max(col(cx)).as("__mxx"),
      min(col(cy)).as("__mny"), max(col(cy)).as("__mxy"))
    df.crossJoin(broadcast(bounds))
      .withColumn("__z", interleave16(
        rank16(col(cx), col("__mnx"), col("__mxx")),
        rank16(col(cy), col("__mny"), col("__mxy"))))
      .drop("__mnx", "__mxx", "__mny", "__mxy")
  }

  /** Write `df` z-clustered on (cx, cy) into ~numFiles files. */
  def zorderWrite(df: DataFrame, cx: String, cy: String, path: String,
      numFiles: Int): Unit = {
    require(numFiles >= 1, s"numFiles must be positive, got $numFiles")
    zValue(df, cx, cy)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** MAINTENANCE/PUBLISH: commit `target` as the z-clustered snapshot
    * of the live `source` table — the "publish a scan-optimized
    * artifact" step a curation pipeline runs after its ingest loop:
    * the ingest-side table stays bucketed-by-key for O(delta)
    * upserts, while analytic consumers read the published layout
    * whose parquet min/max stats prune on BOTH curve columns.
    * Content is untouched (layout only — the u10 gate pins the
    * semantic no-op through a DuckDB oracle); the commit is an
    * ordinary CAS-versioned publish, and since the target derives
    * from the SOURCE's snapshot (not from the target's own prior
    * content) a lost pointer race needs no pin — the retry re-reads
    * the source and re-publishes. */
  def zorderPublish(spark: org.apache.spark.sql.SparkSession,
      store: ParquetTableStore, source: String, target: String,
      cx: String, cy: String, numFiles: Int): DataFrame = {
    require(numFiles >= 1, s"numFiles must be positive, got $numFiles")
    store.withCommitRetries() {
      store.commit(spark, target,
        zValue(store.read(spark, source), cx, cy)
          .repartitionByRange(numFiles, col("__z"))
          .sortWithinPartitions("__z")
          .drop("__z"))
    }
  }
}
