package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers — the shuffle-free-join technique for the
  * joins that dominate at 100 TB (memberships ⋈ videos, lineitem ⋈
  * orders shapes).
  *
  * Writing both sides bucketed by the join key into the same bucket
  * count lets Spark plan a SortMergeJoin with NO Exchange on either
  * side: each bucket pairs off directly. The write cost is paid once;
  * every subsequent join, aggregation, or window partitioned by the
  * key reuses the layout. This is the batch analogue of co-located
  * storage and the default physical design for the engine's big fact
  * tables.
  */
object Bucketing {

  /** Persist `df` as a bucketed (and bucket-sorted) catalog table at
    * an explicit location. Sorting within buckets additionally lets
    * SMJ skip the sort. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int, path: String): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .option("path", path)
      .mode("overwrite")
      .saveAsTable(table)

  /** True when the physical plan of `df` contains no shuffle
    * (Exchange) — the property bucketing buys. */
  def isShuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString().contains("Exchange")

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
