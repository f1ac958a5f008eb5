package graft

import org.apache.spark.sql.functions._

/** The `spark.table(name)` seam (Tables Scaladoc) actually exercised:
  * views registered from the same parquet must serve identical
  * results AND identical scan properties (pushdown/pruning) as the
  * path loaders, so swapping in a metastore changes nothing else. */
class CatalogSeamSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("catalog-backed reads == path reads, row for row") {
    Tables.registerViews(spark, dir)
    for (t <- Tables.all) {
      val byPath = if (t == "events") Tables.events(spark, dir)
        else Tables.load(spark, dir, t)
      val byCat = Tables.fromCatalog(spark, t)
      assert(byCat.schema == byPath.schema, s"$t schema drift through catalog")
      assert(byCat.exceptAll(byPath).isEmpty && byPath.exceptAll(byCat).isEmpty,
        s"$t contents drift through catalog")
    }
  }

  test("spark.sql over registered views runs a catalog query end-to-end") {
    Tables.registerViews(spark, dir)
    val viaSql = spark.sql(
      """SELECT o_orderpriority, count(*) AS n
        |FROM orders WHERE o_totalprice > 1000
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
    val viaApi = Tables.orders(spark, dir)
      .filter(col("o_totalprice") > 1000)
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .orderBy("o_orderpriority")
    assert(viaSql.collect().toSeq == viaApi.collect().toSeq)
  }

  test("pushdown and pruning survive the catalog path") {
    Tables.registerViews(spark, dir)
    val plan = Tables.fromCatalog(spark, "lineitem")
      .filter(col("l_quantity") > 40)
      .select("l_orderkey", "l_quantity")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,40"),
      s"filter not pushed through the catalog seam:\n$plan")
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:"),
      s"columns not pruned through the catalog seam:\n$plan")
  }
}
