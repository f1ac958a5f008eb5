package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{ArrayType, FloatType, LongType, StringType, StructField, StructType}

import graft.SparkSpec
import graft.ops.ParquetTableStore

/** The store as a streaming SINK (`writeStream.toTable` over the V2
  * catalog → [[StoreStreamWrite]]): executor-staged epochs folded as
  * keyed LWW upserts, exactly-once via the epoch watermark, Update
  * mode as upsert, the snapshot-table refusal, and staging cleanup. */
class StoreSinkSpec extends SparkSpec {

  // containsNull = false matches what the Array[Float] encoder writes
  // (and what the seeded store table's canonical schema records) — a
  // containsNull=true frame cannot narrow into it, by Spark's rules
  private def schemaOf(): StructType = StructType(Seq(
    StructField("id", LongType), StructField("txt", StringType),
    StructField("emb", ArrayType(FloatType, containsNull = false))))

  test("toTable sink: epochs fold as LWW upserts, deltas only, typed round-trip") {
    import spark.implicits._
    val root = tmpDir("sink-store")
    val ck = tmpDir("sink-ckpt")
    val inDir = tmpDir("sink-in")
    val store = new ParquetTableStore(root)
    def rows(r: Range) = r.map(i => (i.toLong, s"doc $i",
      Array(i.toFloat, 2f * i))).toDF("id", "txt", "emb")
    store.upsertBucketed(spark, "t", rows(1 to 100), Seq("id"),
      numBuckets = 4)
    spark.conf.set("spark.sql.catalog.sinkcat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.sinkcat.root", root)
    def run(): Unit = {
      val q = spark.readStream.schema(schemaOf()).parquet(inDir)
        .writeStream.option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow()).toTable("sinkcat.t")
      q.awaitTermination(120000)
    }
    rows(101 to 200).coalesce(1).write.mode("append").parquet(inDir)
    val v0 = store.currentVersion("t").get
    run()
    assert(store.read(spark, "t").count() == 200L,
      "first streamed epoch did not land")
    // restart over the same checkpoint: only the NEW files fold
    rows(201 to 300).coalesce(1).write.mode("append").parquet(inDir)
    run()
    val got = store.read(spark, "t")
    assert(got.count() == 300L, "second streamed epoch did not land")
    // typed round-trip through the executor-staged parquet: the array
    // column survives bit-exact
    assert(got.filter(col("id") === 250L)
      .select(element_at(col("emb"), 2)).head.getFloat(0) == 500f,
      "array column mangled through the staging writer")
    assert(store.currentVersion("t").get == v0 + 2,
      "expected exactly one store version per non-empty epoch")
    // staging is cleaned up after each commit
    val staged = java.nio.file.Files.list(
      java.nio.file.Paths.get(root, "t")).toArray.map(_.toString)
      .filter(_.contains("tmp-stream-"))
    assert(staged.forall(d =>
      java.nio.file.Files.list(java.nio.file.Paths.get(d)).count() == 0L),
      s"staged epoch dirs left behind: ${staged.mkString(", ")}")
  }

  test("epoch watermark: a replayed epoch is a no-op, not a second fold") {
    import spark.implicits._
    val root = tmpDir("sink-replay")
    val store = new ParquetTableStore(root)
    store.upsertBucketed(spark, "t",
      Seq((1L, "a", Array(1f))).toDF("id", "txt", "emb"), Seq("id"),
      numBuckets = 2)
    val sink = new StoreStreamWrite(store, "t", schemaOf(), "q-replay",
      replaceEach = false, keys = Seq("id"), numBuckets = 2)
    def stage(epoch: Long, rows: Seq[(Long, String, Array[Float])])
        : StagedFileMessage = {
      val dir = store.streamStagingDir("t", "q-replay", epoch)
      java.nio.file.Files.createDirectories(dir)
      val f = dir.resolve("part-0-0.parquet").toString
      rows.toDF("id", "txt", "emb").coalesce(1).write
        .mode("overwrite").parquet(f)
      StagedFileMessage(f, rows.size.toLong)
    }
    sink.commit(7L, Array(stage(7L, Seq((2L, "b", Array(2f))))))
    assert(store.read(spark, "t").count() == 2L)
    val v = store.currentVersion("t").get
    // the replay delivers DIFFERENT bytes for the same epoch (a
    // zombie's stale attempt) — the watermark must win
    sink.commit(7L, Array(stage(7L, Seq((9L, "zombie", Array(9f))))))
    assert(store.read(spark, "t").count() == 2L &&
      store.currentVersion("t").contains(v),
      "replayed epoch folded twice")
    assert(store.lastStreamEpoch("t", "q-replay").contains(7L))
    // the NEXT epoch folds normally
    sink.commit(8L, Array(stage(8L, Seq((3L, "c", Array(3f))))))
    assert(store.read(spark, "t").count() == 3L)
  }

  test("update output mode rides the append path as a keyed upsert") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val root = tmpDir("sink-upd")
    val ck = tmpDir("sink-upd-ck")
    val store = new ParquetTableStore(root)
    store.upsertBucketed(spark, "t",
      Seq((0L, "seed", Array(0f))).toDF("id", "txt", "emb"), Seq("id"),
      numBuckets = 2)
    spark.conf.set("spark.sql.catalog.updcat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.updcat.root", root)
    val in = MemoryStream[(Long, String, Array[Float])]
    val q = in.toDF().toDF("id", "txt", "emb")
      .writeStream.outputMode("update")
      .option("checkpointLocation", ck).toTable("updcat.t")
    in.addData((1L, "a", Array(1f)), (2L, "b", Array(2f)))
    q.processAllAvailable()
    in.addData((1L, "a2", Array(1.5f)))
    q.processAllAvailable()
    q.stop()
    val got = store.read(spark, "t").select("id", "txt")
      .as[(Long, String)].collect().toMap
    assert(got == Map(0L -> "seed", 1L -> "a2", 2L -> "b"),
      s"update-mode upsert wrong: $got")
  }

  test("snapshot tables refuse streaming writes with the replay rationale") {
    import spark.implicits._
    val root = tmpDir("sink-snap")
    val store = new ParquetTableStore(root)
    store.commit(spark, "snap", Seq((1L, "a")).toDF("id", "txt"))
    spark.conf.set("spark.sql.catalog.snapcat",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.snapcat.root", root)
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = in.toDF().toDF("id", "txt")
      .writeStream.option("checkpointLocation", tmpDir("sink-snap-ck"))
      .toTable("snapcat.snap")
    in.addData((2L, "b"))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.processAllAvailable()
      q.awaitTermination(30000)
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: causes(t.getCause)
    assert(causes(e).exists(c =>
      c.isInstanceOf[UnsupportedOperationException] &&
        c.getMessage.contains("BUCKETED")),
      s"unexpected failure: ${e.getMessage}")
    assert(store.read(spark, "snap").count() == 1L,
      "refused streaming write still mutated the snapshot table")
  }
}
