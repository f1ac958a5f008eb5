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
