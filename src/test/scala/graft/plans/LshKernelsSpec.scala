package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions

/** The native band-key and hashed-Jaccard kernels must be
  * bit-identical to their composed HOF forms on randomized inputs —
  * that equivalence is what keeps the DuckDB oracle valid. */
class LshKernelsSpec extends SparkSpec {
  import spark.implicits._

  test("lsh_band_keys == composed HOF form on random signatures") {
    val rnd = new scala.util.Random(11)
    val sigs = (1 to 200).map { i =>
      (i.toLong, Seq.fill(32)(rnd.nextLong().abs % 1000000007L))
    }.toDF("id", "sig")
    val native = sigs.select(col("id"),
      explode(LshKernels.lshBandKeys(col("sig"), 8, 4)).as("bk"))
      .select(col("id"), col("bk.band"), col("bk.band_hash"))
    val hof = sigs.select(col("id"),
      explode(TextFunctions.lshBandKeys(col("sig"), 8, 4)).as("bk"))
      .select(col("id"), col("bk.band"), col("bk.band_hash"))
    assert(native.exceptAll(hof).isEmpty && hof.exceptAll(native).isEmpty)
  }

  test("lsh_band_keys handles short signatures like the slice form") {
    val short = Seq((1L, Seq(5L, 7L, 9L))).toDF("id", "sig") // 3 slots, 2×2 bands
    val native = short.select(explode(LshKernels.lshBandKeys(col("sig"), 2, 2)))
      .select("col.band", "col.band_hash").collect()
    val hof = short.select(explode(TextFunctions.lshBandKeys(col("sig"), 2, 2)))
      .select("col.band", "col.band_hash").collect()
    assert(native.toSeq == hof.toSeq)
  }

  test("hashed_jaccard == size(intersect)/size(union) incl. dup and empty sets") {
    val rnd = new scala.util.Random(13)
    val pairs = (1 to 300).map { i =>
      val a = Seq.fill(rnd.nextInt(30))(rnd.nextInt(40).toLong)
      val b = Seq.fill(rnd.nextInt(30))(rnd.nextInt(40).toLong)
      (i, a, b)
    } :+ ((0, Seq.empty[Long], Seq.empty[Long]))
    val df = pairs.toDF("i", "a", "b")
    val got = df.select(col("i"),
      LshKernels.hashedJaccard(col("a"), col("b")).as("native"),
      TextFunctions.jaccardSim(col("a"), col("b")).as("hof"))
      .collect()
    got.foreach { r =>
      assert(r.getDouble(1) == r.getDouble(2), s"row ${r.getInt(0)}")
    }
  }

  test("lsh_plane_buckets == composed per-plane aggregate(zip_with) dots") {
    import org.apache.spark.sql.Column
    val (planes, tables, dim) = (3, 2, 8)
    def planeLit(gp: Int) = array((0 until dim).map { i =>
      lit(TextFunctions.portableHash64Local(s"$gp:$i").toDouble /
        1.152921504606847e18 - 0.5)
    }: _*)
    def planeDot(vec: Column, gp: Int) = aggregate(
      zip_with(vec, planeLit(gp), (x, c) => x.cast("double") * c),
      lit(0.0), (acc, v) => acc + v)
    def composed(vec: Column) = array((0 until tables).map { t =>
      (0 until planes).map { o =>
        when(planeDot(vec, t * planes + o) > 0, lit(1L << o)).otherwise(lit(0L))
      }.reduce(_ + _)
    }: _*)
    val rnd = new scala.util.Random(23)
    import spark.implicits._
    val vecs = ((1 to 200).map(i =>
      (i.toLong, Array.fill(dim)(rnd.nextFloat() * 2 - 1))) :+
      (900L, Array.fill(dim - 1)(0.5f)) :+ // wrong length → all-zero buckets
      (901L, Array.fill(dim)(0.0f)))       // zero vector → dot 0, bit unset
      .toDF("id", "vec")
    val native = vecs.select(col("id"),
      LshKernels.lshPlaneBuckets(col("vec"), planes, tables, dim).as("b"))
    val hof = vecs.select(col("id"), composed(col("vec")).as("b"))
    assert(native.exceptAll(hof).isEmpty && hof.exceptAll(native).isEmpty)
    val short = native.filter(col("id") === 900L).head().getSeq[Long](1)
    assert(short == Seq(0L, 0L))
  }

  test("kernels stay inside whole-stage codegen") {
    // spark.range (not a local Seq — ConvertToLocalRelation would
    // constant-fold the projection away before it ever hits codegen)
    val df = spark.range(10)
      .select(array(col("id"), col("id") + 1, col("id") + 2, col("id") + 3).as("sig"))
      .select(LshKernels.lshBandKeys(col("sig"), 2, 2).as("bk"),
        LshKernels.hashedJaccard(col("sig"), col("sig")).as("j"))
    val codegenSpans = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    // the kernel projection must sit INSIDE a codegen span (rendered
    // with the `*(n)` prefix), not fall back to interpreted eval
    assert(codegenSpans.exists(_.toString.contains("lsh_band_keys")),
      df.queryExecution.executedPlan.toString)
  }
}
