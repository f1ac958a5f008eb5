package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.ops.ParquetTableStore

/** The store as a streaming SOURCE (`spark.readStream.table` over the
  * V2 catalog): versions-as-offsets, snapshot-then-deltas,
  * exactly-once across restarts, the append-only refusal, and the
  * consumer-cursor retention handshake. */
class StoreTailSpec extends SparkSpec {

  // parquet sink (the memory sink cannot recover from a checkpoint,
  // and checkpoint recovery IS what the exactly-once pin needs)
  private def runTail(): org.apache.spark.sql.DataFrame = {
    val q = spark.readStream.table("tailcat.inbox")
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    spark.read.parquet(out)
  }

  private var ckpt: String = _
  private var out: String = _

  test("store tail: snapshot, then deltas exactly-once; rewrite refuses; cursor pins") {
    import spark.implicits._
    val root = tmpDir("tail-store")
    ckpt = tmpDir("tail-ckpt")
    out = tmpDir("tail-out")
    val store = new ParquetTableStore(root)
    def rows(r: Range) = r.map(i => (i.toLong, s"doc $i",
      Array(i.toFloat, 2f * i))).toDF("id", "txt", "emb")
      .withColumn("ts", to_timestamp(lit("2024-01-01 00:00:00")))
    store.appendBucketed(spark, "inbox", rows(1 to 100), Seq("id"),
      numBuckets = 4)
    spark.conf.set("spark.sql.catalog.tailcat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.tailcat.root", root)

    // run 1: the first batch is the WHOLE current snapshot — and the
    // row-based tail reader round-trips every column type (long,
    // string, array<float>, INT96 timestamp)
    val got1 = runTail()
    assert(got1.count() == 100L)
    val r42 = got1.filter(col("id") === 42L).head
    assert(r42.getString(1) == "doc 42")
    assert(r42.getSeq[Float](2) == Seq(42f, 84f))
    // INT96 timestamp round-trip: streamed value ≡ the batch read's
    val batch42 = store.read(spark, "inbox")
      .filter(col("id") === 42L).select("ts").head.getTimestamp(0)
    assert(r42.getTimestamp(3) == batch42,
      s"timestamp drift: streamed ${r42.getTimestamp(3)} vs batch $batch42")

    // run 1 already registered the consumer cursor at its batch end
    // (plan-time registration — an AvailableNow one-shot never gets a
    // commit() call for its last batch), so the append burst below
    // cannot prune the delta base out from under run 2
    assert(store.cursorFloor("inbox").contains(0L),
      s"tail cursor not at the run-1 base: ${store.cursorFloor("inbox")}")
    // two more append versions, then a RESTART from the same
    // checkpoint: the new run's memory table receives ONLY the delta
    // (files added since the committed offset) — exactly-once, no
    // re-delivery of the snapshot
    store.appendBucketed(spark, "inbox", rows(101 to 130), Seq("id"))
    store.appendBucketed(spark, "inbox", rows(131 to 150), Seq("id"))
    val got2 = runTail()
    assert(got2.count() == 150L,
      s"restart must deliver ONLY the delta (saw ${got2.count()} total)")
    assert(got2.select("id").distinct().count() == 150L,
      "a row was re-delivered across the restart")

    // the committed batch registered the stream's consumer cursor —
    // the u18/u22 retention handshake (debt visible under its id)
    val cursors = store.cursorLag(spark, "inbox")
      .select("consumer").collect().map(_.getString(0))
    assert(cursors.exists(_.startsWith("tail-")),
      s"no tail cursor registered: ${cursors.mkString(",")}")

    // a rewrite span (upsert rewrote a bucket → files removed)
    // refuses loudly: new-file rows are not the change feed
    store.upsertBucketed(spark, "inbox",
      Seq((42L, "rewritten")).toDF("id", "txt"), Seq("id"))
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException](
      runTail())
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(ex).exists(c => c.isInstanceOf[IllegalStateException] &&
      c.getMessage.contains("removed")),
      s"expected the append-only refusal, got: $ex")

    // time-travel tables are bounded snapshots, not streams: no
    // MICRO_BATCH_READ capability (the planner refuses them as
    // streaming sources)
    val cat = spark.sessionState.catalogManager.catalog("tailcat")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
    val tt = cat.loadTable(
      org.apache.spark.sql.connector.catalog.Identifier.of(
        Array.empty, "inbox"),
      store.currentVersion("inbox").get.toString)
    assert(!tt.capabilities().contains(
      org.apache.spark.sql.connector.catalog.TableCapability
        .MICRO_BATCH_READ),
      "a pinned version must not offer a streaming face")
  }
}
