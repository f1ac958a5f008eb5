package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BucketingSpec extends SparkSpec {

  test("bucketed join plans with zero Exchange; plain join shuffles") {
    val dir = tmpDir("buckets")
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
      .withColumnRenamed("l_orderkey", "o_orderkey")

    // the plain join shuffles both sides (disable broadcast to see it)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plain = orders.join(lineitem, "o_orderkey")
      assert(!Bucketing.isShuffleFree(plain))

      Bucketing.writeBucketed(orders, "b_orders", "o_orderkey", 8, s"$dir/o")
      Bucketing.writeBucketed(lineitem, "b_lineitem", "o_orderkey", 8, s"$dir/l")
      val bucketed = Bucketing.table(spark, "b_orders")
        .join(Bucketing.table(spark, "b_lineitem"), "o_orderkey")
      assert(Bucketing.isShuffleFree(bucketed),
        bucketed.queryExecution.executedPlan.toString().take(800))

      // same results either way
      assert(bucketed.count() == plain.count())

      // and a bucket-key aggregation is shuffle-free too
      val agg = Bucketing.table(spark, "b_lineitem")
        .groupBy("o_orderkey").agg(sum("l_quantity"))
      assert(Bucketing.isShuffleFree(agg))
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
