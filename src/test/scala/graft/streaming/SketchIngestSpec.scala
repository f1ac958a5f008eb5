package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.{ParquetTableStore, Sketches}

/** The streaming sketch-maintenance loop ([[Streams.sketchIngest]]):
  * one count-min row per micro-batch keyed by batchId, the queryable
  * sketch is their merge — exactly the sketch of the concatenated
  * stream, because counter addition commutes. */
class SketchIngestSpec extends SparkSpec {
  import spark.implicits._

  private def runOnce(in: String, ckpt: String,
      store: ParquetTableStore): Unit = {
    val q = Streams.sketchIngest(spark, in, ckpt, store)
    try q.awaitTermination(120000) finally if (q.isActive) q.stop()
  }

  test("merged stored sketch equals a one-shot sketch of the full corpus") {
    val in = tmpDir("ski-in")
    val ckpt = tmpDir("ski-ckpt")
    val store = new ParquetTableStore(tmpDir("ski-store"))

    Seq((1L, "spark spark engine catalyst"),
        (2L, "spark engine tungsten"))
      .toDF("id", "text").write.mode("append").parquet(in)
    runOnce(in, ckpt, store)
    Seq((3L, "spark catalyst catalyst shuffle"))
      .toDF("id", "text").write.mode("append").parquet(in)
    runOnce(in, ckpt, store)

    // two micro-batches -> two keyed rows
    val ids = store.read(spark, "token_cms").select("batch_id")
      .collect().map(_.getLong(0)).toSet
    assert(ids.size == 2, s"expected one row per batch, got $ids")

    val merged = Sketches.mergedFromStore(spark, store)
    val full = Sketches.cmsBuild(
      Seq("spark spark engine catalyst", "spark engine tungsten",
        "spark catalyst catalyst shuffle")
        .toDF("text")
        .select(explode(split(col("text"), " ")).as("item")), "item")
    val vocab = Seq("spark", "engine", "catalyst", "tungsten", "shuffle")
    vocab.foreach { t =>
      assert(merged.estimateCount(t) == full.estimateCount(t),
        s"merged != one-shot for '$t'")
    }
    assert(merged.totalCount() == full.totalCount())
    // tiny vocab, no collisions: the estimates ARE the exact counts
    assert(merged.estimateCount("spark") == 4L)
    assert(merged.estimateCount("catalyst") == 3L)

    // a third AvailableNow run with no new files must change nothing
    runOnce(in, ckpt, store)
    assert(store.read(spark, "token_cms").count() == 2)
  }

  test("compactSketchRows folds all but the latest row, estimates unchanged") {
    val in = tmpDir("skc-in")
    val ckpt = tmpDir("skc-ckpt")
    val store = new ParquetTableStore(tmpDir("skc-store"))
    (1 to 3).foreach { b =>
      Seq((b.toLong, s"tok$b common common")).toDF("id", "text")
        .write.mode("append").parquet(in)
      runOnce(in, ckpt, store)
    }
    assert(store.read(spark, "token_cms").count() == 3)
    val before = Sketches.mergedFromStore(spark, store)
    val folded = Sketches.compactSketchRows(spark, store)
    assert(folded == 1)
    assert(store.read(spark, "token_cms").count() == 2)
    val after = Sketches.mergedFromStore(spark, store)
    Seq("tok1", "tok2", "tok3", "common").foreach { t =>
      assert(after.estimateCount(t) == before.estimateCount(t))
    }
    assert(after.estimateCount("common") == 6L)
    // nothing left to fold below the latest
    assert(Sketches.compactSketchRows(spark, store) == 0)
  }
}
