package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private val budget = 100
  private val maxChunk = 30

  private def chunks = (1 to 500).map { i =>
    (s"c$i", (i % maxChunk) + 1L) // 1..30 tokens
  }.toDF("ck", "n_tokens")

  test("stream packing: boundary rule bounds every non-final pack") {
    val packs = Packing.packSummary(chunks, "ck", "n_tokens",
      budgetTokens = budget, numShards = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    val byShard = packs.groupBy(_._1)
    byShard.foreach { case (shard, ps) =>
      val last = ps.map(_._2).max
      ps.filter(_._2 < last).foreach { case (_, no, toks) =>
        // pack p spans prefix band [p·B, (p+1)·B); it starts up to
        // the previous pack's overrun (< maxChunk) into its band and
        // closes crossing the next boundary, so its total lies in
        // (B - maxChunk, B + maxChunk)
        assert(toks > budget - maxChunk && toks < budget + maxChunk,
          s"shard $shard pack $no has $toks tokens")
      }
    }
    // conservation: packs partition the chunk stream
    assert(packs.map(_._3).sum == chunks.agg(sum("n_tokens")).head.getLong(0))
  }

  test("assignment is deterministic and a pure function of the key set") {
    val a = Packing.assignPacks(chunks, "ck", "n_tokens", budget, 4)
      .select("ck", "shard", "pack_no")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val b = Packing.assignPacks(chunks.repartition(13), "ck", "n_tokens",
      budget, 4)
      .select("ck", "shard", "pack_no")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(a == b, "partitioning layout must not change pack assignment")
    // salt re-deals shards
    val salted = Packing.assignPacks(chunks, "ck", "n_tokens", budget, 4,
      salt = "v2:")
      .select("ck", "shard")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val plain = a.map(x => x._1 -> x._2).toMap
    assert(salted.exists { case (k, s) => plain(k) != s })
  }

  test("one exchange: the plan shuffles only on the shard key") {
    val plan = Packing.assignPacks(chunks, "ck", "n_tokens", budget, 4)
      .queryExecution.executedPlan.toString
    assert(plan.split("Exchange hashpartitioning").length - 1 == 1,
      s"expected exactly one hash exchange:\n$plan")
  }
}
