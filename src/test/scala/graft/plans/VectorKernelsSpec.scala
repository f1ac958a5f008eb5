package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions

/** Native dot/cosine kernels must match the composed HOF forms
  * bit-for-bit — the DuckDB oracles replicate the HOF formula, so any
  * drift here would break the d5/ss1/ss2 gates. */
class VectorKernelsSpec extends SparkSpec {
  import spark.implicits._

  private def randomVecs(n: Int, dim: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map { i =>
      (i,
        Seq.fill(dim)(rnd.nextFloat() * 2f - 1f),
        Seq.fill(dim)(rnd.nextFloat() * 2f - 1f))
    }.toDF("i", "a", "b")
  }

  test("dot and cosine match the HOF forms bit-for-bit on random floats") {
    val df = randomVecs(500, 64, 17)
    val rows = df.select(col("i"),
      VectorKernels.dotProduct(col("a"), col("b")).as("dn"),
      TextFunctions.dotProduct(col("a"), col("b")).as("dh"),
      VectorKernels.cosineSim(col("a"), col("b")).as("cn"),
      TextFunctions.cosineSim(col("a"), col("b")).as("ch"))
      .collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(2)), s"dot row ${r.getInt(0)}")
      assert(java.lang.Double.doubleToLongBits(r.getDouble(3)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(4)), s"cos row ${r.getInt(0)}")
    }
  }

  test("edge semantics: total functions where the HOF form is partial") {
    // zero-norm vectors: the composed Divide RAISES under Spark 4's
    // ANSI default (0.0/0.0); the kernel is total and yields NaN —
    // strictly safer for data paths, and unobservable by the gates
    // (no zero-norm vectors exist in any oracle-checked corpus)
    val empty = Seq((1, Seq.empty[Float], Seq.empty[Float])).toDF("i", "a", "b")
    val e = empty.select(
      VectorKernels.dotProduct(col("a"), col("b")).as("dn"),
      VectorKernels.cosineSim(col("a"), col("b")).as("cn")).head
    assert(e.getDouble(0) == 0.0 && e.getDouble(1).isNaN)
    intercept[Exception] {
      empty.select(TextFunctions.cosineSim(col("a"), col("b"))).collect()
    }
    // length mismatch: null, like zip_with's null-padding turns the
    // HOF aggregate null
    val mm = Seq((1, Seq(1f, 2f), Seq(3f))).toDF("i", "a", "b")
    val m = mm.select(
      VectorKernels.dotProduct(col("a"), col("b")).as("dn"),
      TextFunctions.dotProduct(col("a"), col("b")).as("dh")).head
    assert(m.isNullAt(0) && m.isNullAt(1))
  }

  test("kernels run inside whole-stage codegen") {
    val df = spark.range(8)
      .select(array(col("id").cast("double"), lit(1.0)).as("a"),
        array(lit(2.0), col("id").cast("double")).as("b"))
      .select(VectorKernels.cosineSim(col("a"), col("b")).as("c"),
        VectorKernels.dotProduct(col("a"), col("b")).as("d"))
    val spans = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(spans.exists(_.toString.contains("cosine_sim")),
      df.queryExecution.executedPlan.toString)
    assert(df.collect().length == 8)
  }
}
