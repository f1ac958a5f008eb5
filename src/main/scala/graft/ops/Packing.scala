package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Sequence PACKING — the last step of a pretraining data pipeline:
  * concatenate chunks into fixed-token-budget training examples
  * ("stream packing": the chunk stream is cut every `budgetTokens`
  * tokens; a chunk straddling a boundary belongs to the pack where it
  * starts, so a pack may overrun by < max-chunk-tokens and the
  * trainer truncates or pads — the standard concat-and-split style).
  *
  * Determinism + parallelism: a global greedy pack order would be a
  * single sequential stream; instead the stream is sharded by the
  * portable hash of the chunk key into `numShards` independent
  * streams packed in parallel — assignment is a pure function of
  * (key set, budget, shards, salt): reproducible across runs,
  * engines, and cluster sizes, like every sampler in [[Sampling]].
  *
  * Scale shape: ONE exchange (the shard key), then a running-sum
  * window and arithmetic — no joins, no second shuffle; `numShards`
  * is the parallelism dial (shards ≫ executors at 100 TB). */
object Packing {

  /** The shard and the deterministic within-shard order key. */
  private def shardOf(key: Column, numShards: Int, salt: String): Column =
    pmod(TextFunctions.portableHash64(concat(lit(salt), key.cast("string"))),
      lit(numShards.toLong))

  /** Adds (shard, pack_no, pack_tok_start): rows keep their input
    * columns. `keyCol` must be unique per row (the chunk identity). */
  def assignPacks(df: DataFrame, keyCol: String, tokenCol: String,
      budgetTokens: Int, numShards: Int, salt: String = ""): DataFrame = {
    require(budgetTokens >= 1, "budgetTokens must be >= 1")
    require(numShards >= 1, "numShards must be >= 1")
    val shard = shardOf(col(keyCol), numShards, salt)
    val w = Window.partitionBy(col("shard"))
      .orderBy(TextFunctions.portableHash64(
        concat(lit(salt), col(keyCol).cast("string"))).asc,
        col(keyCol).asc)
    df.withColumn("shard", shard)
      .withColumn("__before",
        coalesce(sum(col(tokenCol)).over(
          w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("pack_no",
        floor(col("__before") / budgetTokens).cast("long"))
      .withColumn("pack_tok_start",
        (col("__before") % budgetTokens).cast("long"))
      .drop("__before")
  }

  /** Per-pack rollup: chunk count, token count, fill ratio against
    * the budget (> 1.0 = boundary overrun, trainer-truncated). */
  def packSummary(df: DataFrame, keyCol: String, tokenCol: String,
      budgetTokens: Int, numShards: Int, salt: String = ""): DataFrame =
    assignPacks(df, keyCol, tokenCol, budgetTokens, numShards, salt)
      .groupBy("shard", "pack_no")
      .agg(count(lit(1)).as("n_chunks"),
        sum(col(tokenCol)).cast("long").as("n_tokens"))
      .withColumn("fill",
        round(col("n_tokens").cast("double") / budgetTokens, 6))
}
