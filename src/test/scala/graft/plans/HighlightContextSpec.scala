package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.YtFunctions

class HighlightContextSpec extends SparkSpec {
  import HighlightContext.highlightContext

  test("native expression matches the composed-builtin form on real text") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for (q <- Seq("merge", "the", "zzz-absent", "a")) {
      val diff = docs.select(
        highlightContext(col("text"), q, 30).as("native"),
        YtFunctions.searchContext(col("text"), q, 30).as("composed"))
        .filter(!(col("native") <=> col("composed")))
      assert(diff.count() == 0, s"query '$q' diverged")
    }
  }

  test("edge cases: null text, hit at start/end, ci-match keeps case") {
    import spark.implicits._
    val df = Seq(
      Some("The cat sat"), None, Some("tail END"), Some("UPPER needle lower")
    ).toDF("t")
    val got = df.select(highlightContext(col("t"), "the", 5)).as[String].collect()
    assert(got(0) == "**The** cat ")
    assert(got(1) == null)
    assert(got(2) == null)
    val hit = df.select(highlightContext(col("t"), "NEEDLE", 3)).as[String].collect()
    assert(hit(3) == "ER **needle** lo")
  }

  test("SQL registration and codegen path") {
    HighlightContext.register(spark)
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .createOrReplaceTempView("hc_docs")
    val viaSql = spark.sql(
      "SELECT highlight_context(text, 'merge', 30) AS h FROM hc_docs WHERE doc_id = 0")
    // the plan should stay inside whole-stage codegen: the `*(n)`
    // prefix marks WholeStageCodegen stages in the physical plan
    val plan = viaSql.queryExecution.executedPlan.toString()
    assert(plan.contains("*(1)"), plan.take(500))
    viaSql.collect() // executes the generated code
  }
}
