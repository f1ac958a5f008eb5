package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions

class SimhashKernelSpec extends SparkSpec {

  test("native kernel is bit-identical to the 32-fold HOF form on real docs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"),
        transform(TextFunctions.tokens(col("text")),
          t => TextFunctions.portableHash64(t)).as("hs"))
    val both = docs
      .withColumn("native", SimhashKernel.simhash32(col("hs")))
      .withColumn("composed", TextFunctions.simhash32FromHashes(col("hs")))
    assert(both.filter(!(col("native") <=> col("composed"))).count() == 0)
  }

  test("randomized hash arrays agree with the HOF form") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(200)(
      Seq.fill(rnd.nextInt(40))(rnd.nextLong().abs % (1L << 60)))
    val both = rows.toDF("hs")
      .withColumn("native", SimhashKernel.simhash32(col("hs")))
      .withColumn("composed", TextFunctions.simhash32FromHashes(col("hs")))
    assert(both.filter(!(col("native") <=> col("composed"))).count() == 0)
  }

  test("wide (60-bit) kernel is bit-identical to the width-fold HOF form") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200)(
      Seq.fill(rnd.nextInt(40))(rnd.nextLong().abs % (1L << 60)))
    val both = rows.toDF("hs")
      .withColumn("native", SimhashKernel.simhashWide(col("hs"), 60))
      .withColumn("composed", TextFunctions.simhashFromHashes(col("hs"), 60))
    assert(both.filter(!(col("native") <=> col("composed"))).count() == 0)
    // 32-bit sketch is exactly the wide sketch's low 32 bits: same
    // hashes, same per-bit scores, same packing
    val low = rows.toDF("hs")
      .withColumn("w32", SimhashKernel.simhash32(col("hs")))
      .withColumn("w60", SimhashKernel.simhashWide(col("hs"), 60))
    assert(low.filter(!(col("w32") <=> (col("w60")
      .bitwiseAND(lit((1L << 32) - 1))))).count() == 0)
  }

  test("60-bit bands are strictly more selective than 32-bit on real docs") {
    // the d7 scale defect: band-bucket saturation. At maxDist=2 a
    // 32-bit sketch gives ~10.7-bit bands, 60-bit gives 20-bit bands;
    // on the real corpus the wide banding must spread every band over
    // at least as many buckets, and strictly more on the worst band.
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def bandBuckets(width: Int): Seq[Long] = {
      val sh = graft.ops.Dedup
        .simhashValues(docs, "doc_id", "text", width)
      (0 until 3).map { b =>
        val lo = b * width / 3
        val hi = (b + 1) * width / 3
        sh.select(shiftrightunsigned(col("simhash"), lo)
            .bitwiseAND(lit((1L << (hi - lo)) - 1)).as("bb"))
          .distinct().count()
      }
    }
    val narrow = bandBuckets(32)
    val wide = bandBuckets(60)
    narrow.zip(wide).foreach { case (n, w) =>
      assert(w >= n, s"wide band must not be less selective: $narrow vs $wide")
    }
    assert(wide.sum > narrow.sum,
      s"wide banding must spread strictly more: $narrow vs $wide")
  }

  test("empty array folds to 0, like the composed form") {
    import spark.implicits._
    val got = Seq(Seq.empty[Long]).toDF("hs")
      .select(SimhashKernel.simhash32(col("hs")).as("v"),
        TextFunctions.simhash32FromHashes(col("hs")).as("c"))
      .head
    assert(got.getLong(0) == 0L)
    assert(got.getLong(0) == got.getLong(1))
  }
}
