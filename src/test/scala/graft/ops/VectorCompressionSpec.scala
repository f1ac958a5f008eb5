package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class VectorCompressionSpec extends SparkSpec {

  private def quantized = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .withColumn("scale", VectorCompression.int8Scale(col("embedding")))
    .withColumn("qv", VectorCompression.quantizeInt8(col("embedding"), col("scale")))

  test("quantized components stay within int8 range") {
    val bad = quantized
      .select(explode(col("qv")).as("q"))
      .filter(abs(col("q")) > 127)
      .count()
    assert(bad == 0)
  }

  test("reconstruction fidelity is high on real embeddings") {
    val fid = quantized
      .select(VectorCompression.fidelity(
        col("embedding"), col("qv"), col("scale")).as("f"))
      .agg(min("f")).head.getDouble(0)
    assert(fid > 0.99, s"worst-case cosine fidelity $fid")
  }

  test("zero vectors quantize to zeros with scale 0 and fidelity 0") {
    import spark.implicits._
    val row = Seq(Seq(0f, 0f, 0f)).toDF("embedding")
      .withColumn("scale", VectorCompression.int8Scale(col("embedding")))
      .withColumn("qv", VectorCompression.quantizeInt8(col("embedding"), col("scale")))
      .select(col("scale"), col("qv"),
        VectorCompression.fidelity(col("embedding"), col("qv"), col("scale")).as("f"))
      .head
    assert(row.getDouble(0) == 0.0)
    assert(row.getSeq[Int](1) == Seq(0, 0, 0))
    assert(row.getDouble(2) == 0.0)
  }

  test("ANN over the quantized corpus preserves exact top-k recall") {
    val dq = quantized.select(col("vec_id"),
      VectorCompression.dequantize(col("qv"), col("scale")).as("embedding"))
    val orig = quantized.select(col("vec_id"), col("embedding"))
    val queries = orig.filter(col("vec_id") < 5)
    def topk(corpus: org.apache.spark.sql.DataFrame) =
      SimilaritySearch.bruteForceTopK(queries, corpus, "vec_id", "embedding", k = 10)
        .select("query_id", "neighbor_id")
    val exact = topk(orig)
    val overlap = topk(dq).intersect(exact).count().toDouble / exact.count()
    assert(overlap >= 0.9, s"quantized top-k recall $overlap")
  }

  test("binary pack/dequantize kernels are bit-identical to the array form") {
    import graft.plans.Q8Kernels
    val both = quantized.select(
      VectorCompression.dequantize(col("qv"), col("scale")).as("a"),
      Q8Kernels.dequantizeQ8(
        Q8Kernels.packInt8(col("qv")), col("scale")).as("b"))
    assert(both.filter(!(col("a") <=> col("b"))).count() == 0)
  }

  test("pack_int8 fails loudly on values outside int8 range") {
    import spark.implicits._
    import graft.plans.Q8Kernels
    val ex = intercept[Exception] {
      Seq(Seq(200)).toDF("qv")
        .select(Q8Kernels.packInt8(col("qv"))).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(e => e +: causes(e.getCause))
    assert(causes(ex).exists(_.getMessage != null) &&
      causes(ex).exists(c => Option(c.getMessage).exists(_.contains("int8"))))
  }

  test("quantized IVF ANN equals the float path over the dequantized corpus") {
    val orig = quantized.select(col("vec_id"), col("embedding"))
    val dq = quantized.select(col("vec_id"),
      VectorCompression.dequantize(col("qv"), col("scale")).as("embedding"))
    val q = orig.filter(col("vec_id") < 5)
    def proj(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "rank", "neighbor_id")
    val packed = proj(SimilaritySearch.quantizedIvfTopK(q, orig,
      "vec_id", "embedding", k = 5, numCentroids = 16, probes = 4,
      cellCap = 1000))
    val arrays = proj(SimilaritySearch.ivfTopK(q, dq,
      "vec_id", "embedding", k = 5, numCentroids = 16, probes = 4,
      cellCap = 1000))
    assert(packed.count() == arrays.count())
    assert(packed.except(arrays).count() == 0)
  }

  test("max-magnitude component maps to ±127 exactly") {
    import spark.implicits._
    val q = Seq(Seq(0.5f, -2.0f, 1.0f)).toDF("embedding")
      .withColumn("scale", VectorCompression.int8Scale(col("embedding")))
      .select(VectorCompression.quantizeInt8(col("embedding"), col("scale")))
      .head.getSeq[Int](0)
    assert(q(1) == -127)
    assert(q == Seq(32, -127, 64))
  }
}
