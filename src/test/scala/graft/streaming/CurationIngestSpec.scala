package graft.streaming

import graft.SparkSpec
import graft.ops.ParquetTableStore

/** The streaming corpus-curation loop ([[Streams.curationIngest]]):
  * quality cut → stored-ledger exact dedup → stored-gram
  * decontamination, per batch, with batch order as the dedup
  * tie-break and full replay idempotence. */
class CurationIngestSpec extends SparkSpec {
  import spark.implicits._

  // long stopword-rich sentences pass the ts2 quality cut; the digit
  // soup fails it
  private val good =
    "the project is a story of the people and the land that it is for " +
      "and the water of the river is a part of that story in the end"
  private val good2 =
    "it is the case that the review of the plan is in the hands of the " +
      "board and that the board is sure to act on it for the good of all"
  private val soup = "4 8 15 16 23 42 108 4 8 15 16 23 42 108 314 271"

  private val bench = Seq((50L, good2)).toDF("bench_id", "text")

  private def runOnce(in: String, ckpt: String,
      store: ParquetTableStore): Unit = {
    val q = Streams.curationIngest(spark, in, ckpt, store,
      bench, "bench_id", "text", minShared = 2)
    try q.awaitTermination(180000) finally if (q.isActive) q.stop()
  }

  test("quality cut, cross-batch dedup (earlier batch wins), decontam") {
    val in = tmpDir("cu-in")
    val ckpt = tmpDir("cu-ckpt")
    val store = new ParquetTableStore(tmpDir("cu-store"))

    // batch 1: a keeper copy of `good` at a HIGH id, digit soup, and
    // the contaminated doc (= bench text, shares every 8-gram)
    Seq((30L, good), (31L, soup), (32L, good2))
      .toDF("id", "text").coalesce(1).write.mode("append").parquet(in)
    runOnce(in, ckpt, store)
    // batch 2: a LOWER-id copy of `good` (must lose to batch 1's
    // claim) plus a fresh survivor
    Seq((3L, good), (40L, good + " and that is the whole of it truly"))
      .toDF("id", "text").coalesce(1).write.mode("append").parquet(in)
    runOnce(in, ckpt, store)

    val clean = store.read(spark, "corpus_clean")
      .select("id").collect().map(_.getLong(0)).toSet
    // 30 kept (batch-1 claim), 31 failed quality, 32 contaminated,
    // 3 lost the fingerprint to 30 despite the lower id, 40 kept
    assert(clean == Set(30L, 40L), s"got $clean")

    // digest ledger recorded the quality-passed winners (30, 32, 40 —
    // the contaminated doc still claims its fingerprint)
    assert(store.read(spark, "corpus_digests").count() == 3)

    // full-feed replay through a fresh checkpoint: same rows, no
    // membership change (keeper_id == id re-admits own claims)
    runOnce(in, tmpDir("cu-ckpt2"), store)
    val clean2 = store.read(spark, "corpus_clean")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(clean2 == clean)
    assert(store.read(spark, "corpus_digests").count() == 3)
  }

  test("writer crash between member commits and the marker swap: replay converges") {
    import graft.ops.{PosixStoreIo, StoreIo}
    import java.nio.file.Path
    // the group-commit crash shape the marker's scaladoc argues and
    // this pins: the process dies AFTER commitInParallel landed both
    // member tables but BEFORE the marker CAS. Readers must keep the
    // PREVIOUS consistent vector (stale by one span, never mixed),
    // and the checkpoint replay must re-derive idempotently and swap
    // then — reader-visible vector never regresses.
    val in = tmpDir("cu-crash-in")
    val ckpt = tmpDir("cu-crash-ckpt")
    val root = tmpDir("cu-crash-store")
    val store = new ParquetTableStore(root)

    // batch 1: a clean full pass establishes the marker
    Seq((30L, good), (32L, good2))
      .toDF("id", "text").coalesce(1).write.mode("append").parquet(in)
    runOnce(in, ckpt, store)
    val v1 = store.groupVersions("corpus_clean-pair").getOrElse(
      fail("batch 1 committed no group marker"))

    // batch 2 runs against a store whose io DIES at the marker swap
    // (after the member CASes — _CURRENT pointers — succeeded)
    val crashIo: StoreIo = new StoreIo {
      override def swapPointer(p: Path, c: String): Unit =
        PosixStoreIo.swapPointer(p, c)
      override def shareFile(s: Path, d: Path): Unit =
        PosixStoreIo.shareFile(s, d)
      override def deletePointerIfCurrent(p: Path, e: String): Unit =
        PosixStoreIo.deletePointerIfCurrent(p, e)
      override def swapPointerIfCurrent(p: Path, c: String,
          exp: Option[String]): Unit = {
        if (p.toString.contains("_groups/"))
          throw new RuntimeException("injected crash before marker swap")
        PosixStoreIo.swapPointerIfCurrent(p, c, exp)
      }
    }
    Seq((3L, good), (40L, good + " and that is the whole of it truly"))
      .toDF("id", "text").coalesce(1).write.mode("append").parquet(in)
    val crashed = Streams.curationIngest(spark, in, ckpt,
      new ParquetTableStore(root, io = crashIo),
      bench, "bench_id", "text", minShared = 2)
    val died = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      crashed.awaitTermination(180000); ()
    }
    if (crashed.isActive) crashed.stop()
    assert(died.getMessage.contains("injected crash") ||
      Option(died.getCause).exists(_.getMessage.contains("injected crash")))
    // members advanced (the batch's upserts landed) but the marker
    // still names batch 1's whole vector — stale, never mixed
    val midMarker = store.groupVersions("corpus_clean-pair").get
    assert(midMarker == v1, s"marker moved under a crashed swap: $midMarker")
    assert(store.currentVersion("corpus_clean").get > v1("corpus_clean"),
      "test premise: the member commit must land before the crash")
    val mid = store.readGroup(spark, "corpus_clean-pair")
    assert(mid("corpus_clean")._2 == v1("corpus_clean"),
      "group read regressed or mixed under the crash")

    // restart with a healthy store handle: the checkpoint replays the
    // batch (idempotent re-upserts), then the marker swaps — the
    // reader-visible vector converges forward, never backward
    runOnce(in, ckpt, store)
    val fin = store.groupVersions("corpus_clean-pair").get
    assert(fin("corpus_clean") >= midMarker("corpus_clean") &&
      fin("corpus_digests") >= midMarker("corpus_digests"),
      s"vector regressed: $midMarker -> $fin")
    assert(fin("corpus_clean") == store.currentVersion("corpus_clean").get &&
      fin("corpus_digests") == store.currentVersion("corpus_digests").get,
      s"replay did not converge the marker to the replayed commits: $fin")
    val clean = store.read(spark, "corpus_clean")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(clean == Set(30L, 40L), s"replayed content drifted: $clean")
  }
}
