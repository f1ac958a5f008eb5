package graft.app

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.{Dedup, Packing, ParquetTableStore, TextAnalysis}

/** The pack-transcripts CLI command end-to-end: store → exact-dedup
  * survivors → chunk → pack, over string video ids. */
class MainPackSpec extends SparkSpec {
  import spark.implicits._

  test("pack-transcripts wires dedup->chunk->pack over the store") {
    val root = tmpDir("mainpack")
    val store = new ParquetTableStore(root)
    val long = (1 to 50).map(i => s"tok$i").mkString(" ")
    store.commit(spark, "transcripts", Seq(
      ("vid_aaa", long),
      ("vid_bbb", long),                // exact dup — must collapse
      ("vid_ccc", (1 to 20).map(i => s"alt$i").mkString(" ")),
      ("vid_ddd", null)                 // ignored
    ).toDF("video_id", "transcript"))

    // the CLI command itself must run clean
    Main.run(spark, Array("pack-transcripts", root, "16", "32"))

    // conservation through the same wiring: the packed token total is
    // the survivors' chunk-token total (dup collapsed, null dropped)
    val tx = store.read(spark, "transcripts")
      .select(col("video_id"), col("transcript"))
      .filter(col("transcript").isNotNull)
    val survivors = Dedup.dropExactDuplicates(tx, "video_id", "transcript")
    val chunks = TextAnalysis.chunk(survivors, "video_id", "transcript",
      windowTokens = 16, stride = 12)
      .withColumn("ck", concat_ws(":", col("video_id"), col("chunk_no")))
    val packs = Packing.packSummary(chunks, "ck", "n_tokens",
      budgetTokens = 32, numShards = 8)
    val packedTokens = packs.agg(sum("n_tokens")).head.getLong(0)
    val chunkTokens = chunks.agg(sum("n_tokens")).head.getLong(0)
    assert(packedTokens == chunkTokens)
    // 50-token doc at window 16/stride 12: starts 0,12,24,36,48 — the
    // dup contributes nothing
    val aaaChunks = chunks.filter(col("video_id") === "vid_aaa").count()
    assert(aaaChunks == 5, s"got $aaaChunks")
    assert(chunks.filter(col("video_id") === "vid_bbb").count() == 0)
  }
}
