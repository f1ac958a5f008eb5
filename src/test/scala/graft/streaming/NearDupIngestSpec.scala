package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.ParquetTableStore

/** The streaming incremental-dedup ingest loop
  * ([[Streams.nearDupIngest]]): the store is the streaming state —
  * each AvailableNow pass collapses in-batch near-dups, probes the
  * stored index, appends survivors (O(delta) bucketed commits), and
  * records rejects with their best corpus match. */
class NearDupIngestSpec extends SparkSpec {
  import spark.implicits._

  // ~20 shared tokens + a distinct tail per doc family: families are
  // near-dups of each other only under the leading-token perturbation
  private def text(tail: String): String =
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet " +
      "kilo lima mike november oscar papa quebec romeo sierra tango " + tail

  private def runOnce(in: String, ckpt: String,
      store: ParquetTableStore): Unit = {
    val q = Streams.nearDupIngest(spark, in, ckpt, store, threshold = 0.5)
    try q.awaitTermination(120000) finally if (q.isActive) q.stop()
  }

  test("in-batch dups collapse, cross-batch dups reject, survivors append") {
    val in = tmpDir("ndi-in")
    val ckpt = tmpDir("ndi-ckpt")
    val store = new ParquetTableStore(tmpDir("ndi-store"))

    // batch 1: two distinct docs + an in-batch near-dup of doc 1
    // (its text minus the leading token)
    Seq((1L, text("one ocean eleven twelve thirteen")),
        (2L, "completely different short unrelated content entirely " +
          "separate vocabulary nothing shared with others at all here"),
        (3L, text("one ocean eleven twelve thirteen").dropWhile(_ != ' ').trim))
      .toDF("id", "text").write.mode("append").parquet(in)
    runOnce(in, ckpt, store)
    val corpus1 = store.read(spark, "corpus").select("id")
      .collect().map(_.getLong(0)).toSet
    assert(corpus1.size == 2 && corpus1.contains(2L),
      s"in-batch near-dup should collapse to one survivor: $corpus1")
    assert(store.read(spark, "lsh_signatures").count() == 2)

    // batch 2: a near-dup of doc 1 (cross-batch) + a fresh doc
    Seq((10L, text("one ocean eleven twelve thirteen extra")),
        (11L, "fresh document speaking about gardens tomatoes rainfall " +
          "harvest seasons crop rotation soil compost seedlings pruning"))
      .toDF("id", "text").write.mode("append").parquet(in)
    runOnce(in, ckpt, store)

    val corpus2 = store.read(spark, "corpus").select("id")
      .collect().map(_.getLong(0)).toSet
    assert(corpus2 == corpus1 + 11L,
      s"cross-batch dup must reject, fresh doc must append: $corpus2")
    val rejects = store.read(spark, "near_dup_rejects")
    val r10 = rejects.filter(col("id") === 10L).collect()
    assert(r10.length == 1, "one best-match reject row per matched doc")
    assert(corpus1.contains(r10.head.getAs[Long]("matched_id")))
    assert(r10.head.getAs[Double]("jaccard") >= 0.5)

    // the index grew with the accepted doc: its band rows are there
    assert(store.read(spark, "lsh_band_index")
      .filter(col("id") === 11L).count() > 0)

    // nothing new → third pass is a no-op (checkpointed source)
    runOnce(in, ckpt, store)
    assert(store.read(spark, "corpus").count() == 3)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "batch persist must not outlive the micro-batch")

    // crash-replay convergence: lose the source checkpoint (the
    // at-least-once worst case — EVERY batch replays against a store
    // that already absorbed them) and re-run. Replayed docs match
    // only their own committed copy (same id — skipped by the
    // self-id guard), re-accept, and the keyed upserts absorb them:
    // same corpus, same rejects, exactly-once effect.
    val corpusBefore = store.read(spark, "corpus")
      .collect().map(_.toString).sorted.toSeq
    val rejectsBefore = store.read(spark, "near_dup_rejects")
      .select("id", "matched_id").collect().map(_.toString).sorted.toSeq
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(ckpt))
    runOnce(in, ckpt, store)
    assert(store.read(spark, "corpus")
      .collect().map(_.toString).sorted.toSeq == corpusBefore)
    assert(store.read(spark, "near_dup_rejects")
      .select("id", "matched_id").collect()
      .map(_.toString).sorted.toSeq == rejectsBefore)
  }

  test("clusterIngest: keep-and-label policy maintains the cluster map across batches") {
    val in = tmpDir("ci-in")
    val ckpt = tmpDir("ci-ckpt")
    val store = new ParquetTableStore(tmpDir("ci-store"))
    def run(): Unit = {
      val q = Streams.clusterIngest(spark, in, ckpt, store, threshold = 0.5)
      try q.awaitTermination(120000) finally if (q.isActive) q.stop()
    }
    def clusterMap(): Map[Long, Long] =
      store.read(spark, "dup_clusters").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap

    // batch 1: docs 1~3 are in-batch near-dups; 2 is distinct
    Seq((1L, text("one ocean eleven twelve thirteen")),
        (2L, "completely different short unrelated content entirely " +
          "separate vocabulary nothing shared with others at all here"),
        (3L, text("one ocean eleven twelve thirteen").dropWhile(_ != ' ').trim))
      .toDF("id", "text").write.mode("append").parquet(in)
    run()
    // EVERY doc is kept (the policy difference vs nearDupIngest)
    assert(store.read(spark, "corpus").count() == 3)
    assert(clusterMap() == Map(1L -> 1L, 3L -> 1L), clusterMap())

    // batch 2: doc 10 near-dups doc 1 (cross-batch) → joins cluster 1;
    // doc 11 is fresh and unpaired (implicit singleton)
    Seq((10L, text("one ocean eleven twelve thirteen extra")),
        (11L, "fresh document speaking about gardens tomatoes rainfall " +
          "harvest seasons crop rotation soil compost seedlings pruning"))
      .toDF("id", "text").write.mode("append").parquet(in)
    run()
    assert(store.read(spark, "corpus").count() == 5)
    assert(clusterMap() == Map(1L -> 1L, 3L -> 1L, 10L -> 1L), clusterMap())

    // the streamed map must equal from-scratch clustering of the
    // WHOLE corpus — the d12 identity, end-to-end through the store
    val full = graft.ops.ConnectedComponents.duplicateClusters(
      graft.ops.Dedup.minhashLshPairs(
        store.read(spark, "corpus"), "id", "text", threshold = 0.5)
        .select("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusterMap() == full)
    // hygiene: the loop leaves no retained blocks behind
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }
}
