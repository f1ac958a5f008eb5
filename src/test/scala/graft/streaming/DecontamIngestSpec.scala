package graft.streaming

import graft.SparkSpec
import graft.ops.{Decontamination, ParquetTableStore}

/** The streaming decontamination screen ([[Streams.decontamIngest]]):
  * per-batch probes against the stored benchmark gram index accumulate
  * a (doc_id, bench_id)-keyed pairs table that equals the one-shot
  * pairs over the concatenated corpus. */
class DecontamIngestSpec extends SparkSpec {
  import spark.implicits._

  private val bench = Seq(
    (10L, "c d e f g h i j k l"),
    (20L, "p q r s t u v w x y")
  ).toDF("bench_id", "text")

  private val b1 = Seq(
    (1L, "a b c d e f g h i j k l"),      // leaks into 10
    (2L, "nothing shared with any bench suite at all here"))
  private val b2 = Seq(
    (3L, "o p q r s t u v w x y z"))      // leaks into 20

  private def runOnce(in: String, ckpt: String,
      store: ParquetTableStore): Unit = {
    val q = Streams.decontamIngest(spark, in, ckpt, store,
      bench, "bench_id", "text", minShared = 2)
    try q.awaitTermination(120000) finally if (q.isActive) q.stop()
  }

  test("streamed per-batch screening equals one-shot pairs; replay no-ops") {
    val in = tmpDir("dci-in")
    val ckpt = tmpDir("dci-ckpt")
    val store = new ParquetTableStore(tmpDir("dci-store"))

    b1.toDF("id", "text").coalesce(1).write.mode("append").parquet(in)
    runOnce(in, ckpt, store)
    b2.toDF("id", "text").coalesce(1).write.mode("append").parquet(in)
    runOnce(in, ckpt, store)

    val streamed = store.read(spark, "contamination")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val oneShot = Decontamination.contaminationPairs(
      (b1 ++ b2).toDF("id", "text"), "id", "text",
      bench, "bench_id", "text", minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == oneShot && streamed.nonEmpty)

    // a full-feed replay through a fresh checkpoint recomputes the
    // same keyed rows — the upsert replaces them, count unchanged
    runOnce(in, tmpDir("dci-ckpt2"), store)
    assert(store.read(spark, "contamination").count() == streamed.size)
  }

  test("a fully clean feed still creates the (empty) pairs table") {
    val in = tmpDir("dci-clean-in")
    val store = new ParquetTableStore(tmpDir("dci-clean-store"))
    Seq((2L, "nothing shared with any bench suite at all here"))
      .toDF("id", "text").coalesce(1).write.mode("append").parquet(in)
    runOnce(in, tmpDir("dci-clean-ckpt"), store)
    // the artifact a training job anti-joins against must EXIST after
    // screening ran, even when the feed found nothing — downstream
    // reads are unconditional
    assert(store.exists("contamination"))
    assert(store.read(spark, "contamination").count() == 0)
    assert(store.read(spark, "contamination").columns.toSet ==
      Set("doc_id", "bench_id", "n_shared"))
  }
}
