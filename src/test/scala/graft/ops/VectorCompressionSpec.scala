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

  test("binarize packs sign bits exactly; hamming is the packed popcount") {
    import spark.implicits._
    // dim 70 spans two words: word 0 bits 0..63, word 1 bits 0..5
    val v = (0 until 70).map(j => if (j % 3 == 0) 1.0f else -1.0f)
    val df = Seq((1L, v)).toDF("id", "vec")
      .select(col("id"), VectorCompression.binarize(col("vec"), 70).as("bits"))
    val bits = df.head.getSeq[Long](1)
    val expect0 = (0 until 64).filter(_ % 3 == 0).map(1L << _).sum
    val expect1 = (64 until 70).filter(_ % 3 == 0).map(j => 1L << (j - 64)).sum
    assert(bits == Seq(expect0, expect1), bits)
    // exactly-zero components pack as 0 (the documented tie rule)
    val z = Seq((1L, Array(0.0f, 1.0f, -2.0f, 0.5f))).toDF("id", "vec")
      .select(VectorCompression.binarize(col("vec"), 4)).head.getSeq[Long](0)
    assert(z == Seq((1L << 1) | (1L << 3)), z)
    // hamming = popcount of the xor, summed across words
    val pair = Seq((Seq(5L, 1L), Seq(6L, 1L))).toDF("a", "b")
      .select(VectorCompression.hamming(col("a"), col("b")).as("h"))
    assert(pair.head.getLong(0) == 2L) // 5 xor 6 = 3 -> 2 bits, word 2 equal
    // a vector SHORTER than the declared dim: missing components are
    // 0 bits (the documented contract) — under ANSI mode an unguarded
    // element_at past the array end would throw INVALID_ARRAY_INDEX
    // instead
    val short = Seq((1L, Array(1.0f, -1.0f))).toDF("id", "vec")
      .select(VectorCompression.binarize(col("vec"), 70)).head.getSeq[Long](0)
    assert(short == Seq(1L, 0L), short)
  }

  test("binary shortlist + cosine rerank: exact top-k recovered at full shortlist") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding"))
    val q = e.filter(col("id") < 5)
    val exact = SimilaritySearch.bruteForceTopK(q, e, "id", "embedding", k = 5)
      .select("query_id", "rank", "neighbor_id").collect().toSet
    // shortlist = corpus size: the Hamming pass prunes nothing, so the
    // rerank must reproduce the exact baseline ranking bit for bit
    val n = e.count().toInt
    val full = SimilaritySearch.binaryRerankTopK(q, e, "id", "embedding",
      k = 5, shortlist = n, dim = 64)
      .select("query_id", "rank", "neighbor_id").collect().toSet
    assert(full == exact)
    // at a realistic shortlist the Hamming proxy keeps useful recall
    val hits = SimilaritySearch.recallAtK(
      SimilaritySearch.bruteForceTopK(q, e, "id", "embedding", k = 5),
      SimilaritySearch.binaryRerankTopK(q, e, "id", "embedding",
        k = 5, shortlist = 25, dim = 64), k = 5)
      .agg(sum("hits")).head.getLong(0)
    assert(hits >= 13, s"binary shortlist recall too low: $hits/25")
  }
}
