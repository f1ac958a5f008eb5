package graft.streaming

import java.sql.Timestamp
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.ParquetTableStore

/** Executor closures mutate static state — local-mode tests share one
  * JVM, so fetch-call counts are observable directly. */
object ScrapeLoopSpec {
  val calls = new ConcurrentHashMap[String, Integer]()
  def reset(): Unit = calls.clear()
  def fetchFn(id: String): String = {
    calls.merge(id, 1, (a, b) => a + b)
    if (id == "dead1") throw new RuntimeException("boom")
    s"payload-$id"
  }
}

/** End-to-end incremental scrape: checkpointed feed → U7 freshness
  * gate → rate-limited/retrying fan-out → bucketed-store merge +
  * dead-letter table. */
class ScrapeLoopSpec extends SparkSpec {
  import ScrapeLoopSpec._
  import spark.implicits._

  test("gate → fetch → merge with a dead-lettered row, incrementally across runs") {
    reset()
    val inputDir = tmpDir("scrape-in")
    val ckpt = tmpDir("scrape-ckpt")
    val store = new ParquetTableStore(tmpDir("scrape-store"))
    val now = to_timestamp(lit("2026-03-01 00:00:00"))

    // pre-seeded table: fresh1 scraped yesterday (inside the 7-day
    // gate → must be skipped), stale1 scraped a month ago (→ due)
    store.upsertBucketed(spark, "videos", Seq(
      ("fresh1", "old-fresh", Timestamp.valueOf("2026-02-28 00:00:00")),
      ("stale1", "old-stale", Timestamp.valueOf("2026-01-30 00:00:00")))
      .toDF("id", "payload", "scraped_at"), Seq("id"))

    Seq("fresh1", "stale1", "new1", "dead1").toDF("id")
      .coalesce(1).write.mode("append").parquet(inputDir)
    Streams.incrementalScrape(spark, inputDir, ckpt, store, "videos",
      "dead_letters", fetchFn, now, days = 7,
      ratePerSecPerPartition = 0, maxAttempts = 2, backoffMs = 1,
      sleeper = _ => ()).awaitTermination()

    val got = store.read(spark, "videos").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got("fresh1") == "old-fresh", "gated id must keep its payload")
    assert(calls.get("fresh1") == null, "gated id must never reach the network")
    assert(got("stale1") == "payload-stale1")
    assert(got("new1") == "payload-new1")
    assert(!got.contains("dead1"), "failed fetch must not merge")
    val dead = store.read(spark, "dead_letters").collect()
    assert(dead.length == 1 && dead(0).getString(0) == "dead1"
      && dead(0).getInt(2) == 2, s"got ${dead.mkString(",")}")
    // the fetch stage is materialized once: store planning actions
    // (touched-bucket probe, write) must not re-trigger fetches
    assert(calls.get("stale1") == 1 && calls.get("new1") == 1
      && calls.get("dead1") == 2, s"calls=$calls")

    // second invocation, new work file: the checkpoint admits only the
    // new file, and stale1 (just re-scraped at `now`) is gate-skipped
    Seq("new2", "stale1").toDF("id")
      .coalesce(1).write.mode("append").parquet(inputDir)
    Streams.incrementalScrape(spark, inputDir, ckpt, store, "videos",
      "dead_letters", fetchFn, now, days = 7,
      ratePerSecPerPartition = 0, maxAttempts = 2, backoffMs = 1,
      sleeper = _ => ()).awaitTermination()
    assert(store.read(spark, "videos").count() == 4) // +new2
    assert(calls.get("new2") == 1)
    assert(calls.get("stale1") == 1, "freshly-scraped id re-fetched")
    assert(calls.get("new1") == 1, "checkpoint re-processed an old file")
    // the per-batch persist must be unpersisted when the batch ends —
    // a leaked block here degrades every later query in the session
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "scrape loop leaked persisted blocks past the micro-batch")
  }
}
