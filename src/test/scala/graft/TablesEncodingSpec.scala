package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The generalized fixture-schema seam (round 8): every table with a
  * typed engine contract must survive the plausible physical
  * re-encodings a fixture regeneration could ship — not just events
  * (round 6's breakage), but the id/vector/date contracts too. Each
  * test writes the alternative encoding and asserts the loader
  * normalizes it; the pass-through tests pin that TODAY'S encodings
  * are left untouched (a gratuitous conversion would diverge from
  * the DuckDB oracle reading the same files).
  */
class TablesEncodingSpec extends SparkSpec {
  import spark.implicits._

  test("documents: int32 ids widen to long (chunk-id arithmetic contract)") {
    val dir = tmpDir("doc-i32")
    Seq((1, "alpha bravo", 11), (2, "charlie delta", 13))
      .toDF("doc_id", "text", "n_chars")
      .select(col("doc_id").cast(IntegerType).as("doc_id"), col("text"),
        col("n_chars").cast(IntegerType).as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val df = Tables.documents(spark, dir)
    assert(df.schema("doc_id").dataType == LongType)
    assert(df.schema("n_chars").dataType == LongType)
    // the exact hazard: chunk-id encoding must not overflow int32
    val big = df.select((col("doc_id") * 1000000L + 7L).as("cid"))
      .orderBy("cid").collect().map(_.getLong(0)).toSeq
    assert(big == Seq(1000007L, 2000007L))
  }

  test("documents: current fixture passes through untouched") {
    val df = Tables.documents(spark, "/root/testdata/sf0.001")
    assert(df.schema("doc_id").dataType == LongType)
    assert(df.schema("text").dataType == StringType)
    assert(df.count() > 0)
  }

  test("embeddings: float64 vectors cast back to the float32 kernel contract") {
    val dir = tmpDir("emb-f64")
    Seq((1, Seq(0.5d, 0.25d)), (2, Seq(1.0d, -1.0d)))
      .toDF("vec_id", "embedding")
      .select(col("vec_id").cast(IntegerType).as("vec_id"), col("embedding"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val df = Tables.embeddings(spark, dir)
    assert(df.schema("vec_id").dataType == LongType)
    assert(df.schema("embedding").dataType
      .asInstanceOf[ArrayType].elementType == FloatType)
    // the exact hazard: the native kernel type-checks on FloatType
    val dot = df.filter(col("vec_id") === 1)
      .select(graft.plans.VectorKernels.dotProduct(
        col("embedding"), col("embedding")))
      .head.getDouble(0)
    assert(math.abs(dot - 0.3125) < 1e-6)
  }

  test("embeddings: current fixture float32 passes through") {
    val df = Tables.embeddings(spark, "/root/testdata/sf0.001")
    assert(df.schema("embedding").dataType
      .asInstanceOf[ArrayType].elementType == FloatType)
  }

  test("orders: int64-nanos o_orderdate decodes to timestamps") {
    val dir = tmpDir("ord-nanos")
    val micros = 1709296496789012L
    Seq((1L, micros * 1000L), (2L, (micros + 2500L) * 1000L))
      .toDF("o_orderkey", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val df = Tables.orders(spark, dir)
    assert(df.schema("o_orderdate").dataType == TimestampType)
    val got = df.select(unix_micros(col("o_orderdate")))
      .as[Long].collect().toSeq.sorted
    assert(got == Seq(micros, micros + 2500L))
  }

  test("orders/lineitem: current NTZ date columns pass through (pushdown intact)") {
    // today's green behavior: NTZ stays NTZ, so date filters still
    // reach the parquet scan as pushed filters
    val o = Tables.orders(spark, "/root/testdata/sf0.001")
    assert(o.schema("o_orderdate").dataType.isInstanceOf[TimestampNTZType]
      || o.schema("o_orderdate").dataType == TimestampType)
    val plan = o.filter(col("o_orderdate") < "1995-03-15")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(o_orderdate)")
      || plan.contains("LessThan(o_orderdate"), plan)
  }

  test("int64 below the epoch-nanos floor fails loudly instead of mis-scaling") {
    val dir = tmpDir("evt-rawmicros")
    // raw MICROS shipped as int64 — the silent 1000x hazard
    Seq((1L, 1709296496789012L)).toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val ex = intercept[Throwable] {
      Tables.events(spark, dir).select(col("ts")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("epoch-nanos floor")), ex.getMessage)
  }
}
