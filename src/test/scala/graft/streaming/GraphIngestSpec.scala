package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.{PageRank, ParquetTableStore}

/** The streaming graph-maintenance loop ([[Streams.graphIngest]]):
  * per micro-batch the edge delta folds into BOTH stored artifacts —
  * triangle counts (additive, anti-join idempotent) and warm-started
  * PageRank (fixpoint, delta anti-join early-outs a replay). */
class GraphIngestSpec extends SparkSpec {
  import spark.implicits._

  private def runOnce(in: String, ckpt: String,
      store: ParquetTableStore): Unit = {
    val q = Streams.graphIngest(spark, in, ckpt, store)
    try q.awaitTermination(180000) finally if (q.isActive) q.stop()
  }

  // two batches over a small fixed graph: batch 2 adds edges that
  // close triangles with 1, 2, and 3 new edges (the three fold cases)
  private val batch1 = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
  private val batch2 = Seq((1L, 3L), (2L, 4L), (5L, 1L), (5L, 2L),
    (6L, 7L), (7L, 8L), (8L, 6L))

  test("streamed folds equal from-scratch triangles and the batch fold's ranks") {
    val in = tmpDir("gi-in")
    val ckpt = tmpDir("gi-ckpt")
    val store = new ParquetTableStore(tmpDir("gi-store"))

    batch1.toDF("src", "dst").coalesce(1).write.mode("append").parquet(in)
    runOnce(in, ckpt, store)
    batch2.toDF("src", "dst").coalesce(1)
      .write.mode("append").parquet(in)
    runOnce(in, ckpt, store)

    // triangle side: identical to the from-scratch counts over all
    // edges (integer counts — exact equality)
    val streamed = store.read(spark, "tri_counts")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = PageRank.triangleCounts(
      (batch1 ++ batch2).toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed == full)

    // rank side: the same two-fold recurrence run through the batch
    // API lands the same vector (double aggregation order can differ
    // across plans — compare within float-fold tolerance)
    val store2 = new ParquetTableStore(tmpDir("gi-store2"))
    PageRank.pageRankAppend(batch1.toDF("src", "dst"), "src", "dst",
      store2, iterations = 3)
    PageRank.pageRankAppend(batch2.toDF("src", "dst"), "src", "dst",
      store2, iterations = 2)
    val rs = store.read(spark, "pr_ranks")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val rb = store2.read(spark, "pr_ranks")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rs.keySet == rb.keySet)
    rs.foreach { case (id, r) =>
      assert(math.abs(r - rb(id)) < 1e-12, s"rank mismatch at $id")
    }

    // meta records the per-batch iteration policy (3 build, 2 fold)
    assert(store.read(spark, "pr_meta").head.getAs[Int]("iters") == 2)

    // a third AvailableNow run with no new files must change nothing
    val vs = Seq("tri_edges", "tri_counts", "tri_meta", "pr_edges",
      "pr_ranks", "pr_meta").map(t => store.currentVersion(t))
    runOnce(in, ckpt, store)
    assert(Seq("tri_edges", "tri_counts", "tri_meta", "pr_edges",
      "pr_ranks", "pr_meta").map(t => store.currentVersion(t)) == vs)
  }

  test("a replayed batch no-ops both families (edge anti-join)") {
    val in = tmpDir("gr-in")
    val ckpt = tmpDir("gr-ckpt")
    val store = new ParquetTableStore(tmpDir("gr-store"))
    batch1.toDF("src", "dst").coalesce(1).write.mode("append").parquet(in)
    runOnce(in, ckpt, store)
    val tri0 = store.read(spark, "tri_counts")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // same edges again through a FRESH checkpoint — the stream replays
    // the whole feed as a new batch; the stored folds must absorb it
    runOnce(in, tmpDir("gr-ckpt2"), store)
    val tri1 = store.read(spark, "tri_counts")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tri0 == tri1)
  }
}
