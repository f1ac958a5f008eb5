package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided synthetic tables (TESTDATA.md).
  *
  * Each table is one parquet file under `\$dir/`. Reads are plain
  * `spark.read.parquet` so Catalyst owns column pruning and predicate
  * pushdown — callers `select`/`filter` and the scan narrows itself
  * (verify with `.explain`: `ReadSchema` / `PushedFilters`).
  *
  * At 100 TB these would be partitioned/ bucketed tables in a catalog;
  * the loader is the single seam where `spark.table(name)` would replace
  * the path read, so nothing else in the engine changes.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** events.ts normalized to TimestampType regardless of the fixture's
    * physical encoding — the driver has regenerated events.parquet with
    * different parquet types across rounds, so the loader branches on
    * what actually loaded instead of assuming one encoding:
    *   - TIMESTAMP(NANOS): Spark 4 refuses it natively; with
    *     spark.sql.legacy.parquet.nanosAsLong=true (set by every graft
    *     session) it arrives as nanos-since-epoch LongType. Convert with
    *     integer `div` — double division would lose precision above
    *     2^53 (~9e15, vs ~1.7e18 ns here). A raw int64 micros column
    *     would also land here; nanos is the only long encoding the
    *     driver has shipped, so that's the conversion applied.
    *   - timestamp[us] without UTC adjustment: loads as TimestampNTZType
    *     (inferTimestampNTZ default-on). Cast to TimestampType — the
    *     session TZ is pinned UTC, so the instant is unchanged.
    *   - timestamp[us/ms] UTC-adjusted: already TimestampType, as-is. */
  def events(s: SparkSession, d: String): DataFrame = {
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _: org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** The catalog seam, exercised: register every table under its name
    * so `spark.table(name)` / `spark.sql` serve the same frames the
    * path loaders do (events keeps its nanos→timestamp conversion).
    * In a metastore deployment the views become real catalog tables
    * and [[fromCatalog]] is the only loader the queries need —
    * partition pruning and pushdown work identically through either
    * path (CatalogSeamSpec compares the plans). */
  def registerViews(s: SparkSession, dir: String): Unit =
    all.foreach {
      case "events" => events(s, dir).createOrReplaceTempView("events")
      case n        => load(s, dir, n).createOrReplaceTempView(n)
    }

  /** Catalog-backed loader — the drop-in replacement for the path
    * loaders once tables live in a metastore. */
  def fromCatalog(s: SparkSession, name: String): DataFrame = s.table(name)
}
