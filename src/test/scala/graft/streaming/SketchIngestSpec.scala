package graft.streaming

import java.nio.file.Path

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.{ParquetTableStore, PosixStoreIo, Sketches, StoreIo}

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

  private def sketchBytes(tokens: Seq[String]): Array[Byte] = {
    val sk = Sketches.cmsBuild(tokens.toDF("item"), "item")
    val out = new java.io.ByteArrayOutputStream()
    sk.writeTo(out)
    out.toByteArray
  }

  test("compactSketchRows racing a concurrent batch upsert never drops the batch") {
    // The lost-update the pinned commit exists to prevent: a
    // sketchIngest batch landing between compaction's row read and its
    // publish. The racing StoreIo lets a REAL competing upsert publish
    // first at exactly the CAS instant — the pinned publish must fail
    // cleanly and the retry must re-fold INCLUDING the winner's row.
    val root = tmpDir("skr-store")
    val seed = new ParquetTableStore(root)
    (0 to 3).foreach { b =>
      seed.upsert(spark, "token_cms",
        Seq((b.toLong, sketchBytes(Seq(s"tok$b", "common"))))
          .toDF("batch_id", "sketch"), Seq("batch_id"))
    }
    var raced = false
    val racingIo: StoreIo = new StoreIo {
      override def swapPointer(p: Path, c: String): Unit =
        PosixStoreIo.swapPointer(p, c)
      override def shareFile(s: Path, d: Path): Unit =
        PosixStoreIo.shareFile(s, d)
      override def deletePointerIfCurrent(p: Path, e: String): Unit =
        PosixStoreIo.deletePointerIfCurrent(p, e)
      override def swapPointerIfCurrent(p: Path, c: String,
          exp: Option[String]): Unit = {
        if (!raced && exp.isDefined) {
          raced = true
          seed.upsert(spark, "token_cms",
            Seq((4L, sketchBytes(Seq("late", "common"))))
              .toDF("batch_id", "sketch"), Seq("batch_id"))
        }
        PosixStoreIo.swapPointerIfCurrent(p, c, exp)
      }
    }
    val store = new ParquetTableStore(root, io = racingIo)
    Sketches.compactSketchRows(spark, store)
    assert(raced, "the race never fired — the harness is broken")
    // the winner's batch row survived the compaction rewrite
    val merged = Sketches.mergedFromStore(spark, store)
    assert(merged.estimateCount("late") == 1L,
      "concurrently-landed batch was silently dropped by compaction")
    assert(merged.estimateCount("common") == 5L)
    (0 to 3).foreach(b => assert(merged.estimateCount(s"tok$b") == 1L))
  }
}
