package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions

class MinhashSlotsSpec extends SparkSpec {

  test("native kernel is bit-identical to the composed HOF form") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"),
        TextFunctions.wordShingles(
          TextFunctions.tokens(col("text")), 3).as("items"))
      .filter(size(col("items")) > 0)
    val both = docs
      .withColumn("native", MinhashSlots.minhashSlots(col("items"), 32))
      .withColumn("composed", TextFunctions.minhashSlotsFromBase(
        TextFunctions.minhashBase(col("items")), 32))
    assert(both.filter(!(col("native") <=> col("composed"))).count() == 0)
  }

  test("empty array → null, like the composed guard") {
    import spark.implicits._
    val got = Seq(Seq.empty[String], Seq("a", "b")).toDF("items")
      .select(MinhashSlots.minhashSlots(col("items"), 4).as("s"))
      .collect()
    assert(got(0).isNullAt(0))
    assert(got(1).getSeq[Long](0).length == 4)
  }

  test("fromHashes twin is bit-identical to the item-digesting kernel") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"),
        TextFunctions.charNgrams(col("text"), 5).as("items"))
      .filter(size(col("items")) > 0)
    val both = docs
      .withColumn("hs", transform(col("items"),
        g => TextFunctions.portableHash64(g)))
      .withColumn("from_items", MinhashSlots.minhashSlots(col("items"), 32))
      .withColumn("from_hashes",
        MinhashSlots.minhashSlotsFromHashes(col("hs"), 32))
    assert(both.filter(!(col("from_items") <=> col("from_hashes"))).count() == 0)
  }

  test("fromHashes: empty array → null, like the item form") {
    import spark.implicits._
    val got = Seq(Seq.empty[Long], Seq(648541476951500027L)).toDF("hs")
      .select(MinhashSlots.minhashSlotsFromHashes(col("hs"), 4).as("s"))
      .collect()
    assert(got(0).isNullAt(0))
    assert(got(1).getSeq[Long](0).length == 4)
  }

  test("known vector: single item 'abc' matches the portable hash arithmetic") {
    import spark.implicits._
    // base = 648541476951500027 % (1e9+7); slots = (a*h+b) % p
    val h = 648541476951500027L % 1000000007L
    val expected = TextFunctions.minhashCoeffs(3)
      .map { case (a, b) => (h * a + b) % 1000000007L }
    val got = Seq(Seq("abc")).toDF("items")
      .select(MinhashSlots.minhashSlots(col("items"), 3))
      .head.getSeq[Long](0)
    assert(got == expected)
  }
}
