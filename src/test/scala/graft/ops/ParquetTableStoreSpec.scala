package graft.ops

import java.nio.file.{Files, Paths}

import graft.SparkSpec

class ParquetTableStoreSpec extends SparkSpec {

  test("commit/read round-trip and version bump") {
    import spark.implicits._
    val store = new ParquetTableStore(tmpDir("store"))
    val v0 = store.commit(spark, "t", Seq((1, "a"), (2, "b")).toDF("k", "v"))
    assert(v0 == 0)
    assert(store.read(spark, "t").count() == 2)
    val v1 = store.commit(spark, "t", Seq((1, "a")).toDF("k", "v"))
    assert(v1 == 1)
    assert(store.read(spark, "t").count() == 1)
  }

  test("upsert creates then merges with LWW semantics") {
    import spark.implicits._
    val store = new ParquetTableStore(tmpDir("store"))
    store.upsert(spark, "videos", Seq(("v1", "old"), ("v2", "keep")).toDF("id", "t"), Seq("id"))
    store.upsert(spark, "videos", Seq(("v1", "new"), ("v3", "add")).toDF("id", "t"), Seq("id"))
    val got = store.read(spark, "videos").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("v1", "new"), ("v2", "keep"), ("v3", "add")))
  }

  test("old versions are pruned, current survives") {
    import spark.implicits._
    val root = tmpDir("store")
    val store = new ParquetTableStore(root, keepVersions = 2)
    (0 to 4).foreach(i => store.commit(spark, "t", Seq(i).toDF("x")))
    val dirs = Files.list(Paths.get(root, "t")).iterator()
    val names = new scala.collection.mutable.ArrayBuffer[String]
    while (dirs.hasNext) names += dirs.next().getFileName.toString
    assert(names.contains("v=4") && names.contains("v=3"))
    assert(!names.contains("v=0") && !names.contains("v=1") && !names.contains("v=2"))
    assert(store.read(spark, "t").head.getInt(0) == 4)
  }

  test("reading an uncommitted table fails cleanly") {
    val store = new ParquetTableStore(tmpDir("store"))
    intercept[IllegalStateException](store.read(spark, "nope"))
  }
}
