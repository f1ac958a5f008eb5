package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot-key joins and aggregations.
  *
  * AQE's skewedJoin handles moderate skew automatically (enabled in
  * graft sessions); explicit salting is for the pathological cases a
  * 100 TB corpus actually has — the transcript of a viral video, the
  * boilerplate dedup bucket, the null-key pile-up — where one key
  * carries orders of magnitude more rows than the median and AQE's
  * partition splitting still leaves a single build-side hot row
  * replicated everywhere.
  */
object Skew {

  /** Salted equi-join on `key`: the skewed (large, hot-keyed) side
    * gets a random salt in [0, parts); the small side is exploded
    * `parts`× so every salted key finds its match. Correct for any
    * join the caller could express on the raw key with these join
    * types (inner/left on the skewed side), because salting only
    * splits rows of the same key across partitions.
    *
    * rand(seed) keeps runs reproducible; the salt column never leaks
    * into the output.
    */
  def saltedJoin(skewed: DataFrame, small: DataFrame, key: String,
      parts: Int = 16, joinType: String = "inner", seed: Long = 42L): DataFrame = {
    val saltedBig = skewed.withColumn("__salt",
      (rand(seed) * parts).cast("int"))
    val explodedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(parts - 1))))
    saltedBig.join(explodedSmall, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }

  /** Two-phase skew-safe grouped count: pre-aggregate on
    * (key, salt), then final-aggregate on key. groupBy's map-side
    * partial aggregation already does this for counts/sums — this
    * shape is for aggregates whose partials explode on hot keys
    * (collect_list/distinct-heavy), where the salt bounds any single
    * task's state. */
  def saltedGroupCount(df: DataFrame, key: String, parts: Int = 16,
      seed: Long = 42L): DataFrame =
    df.withColumn("__salt", (rand(seed) * parts).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("n"))
}
