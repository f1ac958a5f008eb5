package graft.app

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.ParquetTableStore

/** The ingest-docs CLI command end-to-end: two invocations over a
  * growing inbox — the checkpoint under the store dir makes the
  * second run process only the new files, and the incremental probe
  * keeps the corpus near-dup-free across them. */
class MainIngestSpec extends SparkSpec {
  import spark.implicits._

  private def text(tail: String): String =
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet " +
      "kilo lima mike november oscar papa quebec romeo sierra tango " + tail

  test("ingest-docs: incremental across CLI invocations") {
    val root = tmpDir("mainingest")
    val inbox = tmpDir("mainingest-in")
    val store = new ParquetTableStore(root)

    Seq((1L, text("original first document here")),
        (2L, "entirely different words about sailing knots weather " +
          "tides anchors harbors lighthouses navigation charts"))
      .toDF("id", "text").write.mode("append").parquet(inbox)
    Main.run(spark, Array("ingest-docs", root, inbox, "0.5"))
    assert(store.read(spark, "corpus").count() == 2)

    // second invocation: one near-dup of doc 1, one genuinely new doc
    Seq((10L, text("original first document here extended")),
        (11L, "unrelated prose on pottery kilns glazes clay wheels " +
          "firing temperatures ceramic traditions craft"))
      .toDF("id", "text").write.mode("append").parquet(inbox)
    Main.run(spark, Array("ingest-docs", root, inbox, "0.5"))

    val ids = store.read(spark, "corpus").select("id")
      .collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 2L, 11L), s"got $ids")
    val rej = store.read(spark, "near_dup_rejects").collect()
    assert(rej.length == 1 && rej.head.getAs[Long]("id") == 10L
      && rej.head.getAs[Long]("matched_id") == 1L)
  }

  test("curate-docs: incremental screen across CLI invocations") {
    val root = tmpDir("maincurate")
    val inbox = tmpDir("maincurate-in")
    val benchDir = tmpDir("maincurate-bench")
    val store = new ParquetTableStore(root)
    // stopword-rich text passes the ts2 quality cut; digit soup fails
    val good = "the story of the people is that it is for the land " +
      "and the water and the long river is a part of it in the end"
    val leak = "it is the case that the review of the plan is in the " +
      "hands of the board and the board is sure to act on it for all"
    Seq((100L, leak)).toDF("id", "text")
      .write.mode("overwrite").parquet(benchDir)

    Seq((1L, good), (2L, "7 13 21 99 404 7 13 21 99 404 808 101 303"),
        (3L, leak))
      .toDF("id", "text").write.mode("append").parquet(inbox)
    Main.run(spark, Array("curate-docs", root, inbox, benchDir))
    val first = store.read(spark, "corpus_clean").select("id")
      .collect().map(_.getLong(0)).toSet
    // 1 survives; 2 fails quality; 3 is benchmark-contaminated
    assert(first == Set(1L), s"got $first")

    // second invocation: a later-batch copy of doc 1 (loses the
    // fingerprint to the stored claim) and a genuinely new doc
    Seq((10L, good), (11L, good + " and that is the whole of it truly"))
      .toDF("id", "text").write.mode("append").parquet(inbox)
    Main.run(spark, Array("curate-docs", root, inbox, benchDir))
    val ids = store.read(spark, "corpus_clean").select("id")
      .collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 11L), s"got $ids")
  }

  test("compact CLI: maintenance pass after repeated ingests, snapshot unchanged") {
    import spark.implicits._
    val root = tmpDir("maincompact")
    val store = new ParquetTableStore(root, keepVersions = 10)
    store.upsertBucketed(spark, "corpus",
      (1 to 100).map(i => (i.toLong, s"text $i")).toDF("id", "text"),
      Seq("id"), numBuckets = 4)
    (1 to 5).foreach { r =>
      store.upsertBucketed(spark, "corpus",
        (1 to 30).map(i => (i.toLong, s"text $i rev $r")).toDF("id", "text"),
        Seq("id"))
    }
    val before = store.read(spark, "corpus").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    Main.run(spark, Array("compact", root, "corpus", "1"))
    val after = store.read(spark, "corpus").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(after == before)
    // idempotent second pass publishes nothing
    val v = store.currentVersion("corpus")
    Main.run(spark, Array("compact", root, "corpus", "1"))
    assert(store.currentVersion("corpus") == v)
  }
}
