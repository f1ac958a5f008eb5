package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals plain join on skewed data") {
    // one hot key with 10k rows, many cold keys
    val big = spark.range(10000).select(lit("hot").as("k"), col("id"))
      .unionByName(spark.range(500).select(
        concat(lit("cold"), col("id")).as("k"), col("id")))
    val small = Seq(("hot", "H"), ("cold1", "C1"), ("cold2", "C2"))
      .toDF("k", "v")
    val plain = big.join(small, Seq("k")).groupBy("k", "v")
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val salted = Skew.saltedJoin(big, small, "k", parts = 8)
      .groupBy("k", "v").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(salted == plain)
    assert(salted.contains(("hot", "H", 10000L)))
  }

  test("salted left join keeps unmatched skewed rows exactly once") {
    val big = spark.range(1000).select(lit("hot").as("k"), col("id"))
      .unionByName(Seq(("lonely", 1L)).toDF("k", "id"))
    val small = Seq(("hot", "H")).toDF("k", "v")
    val got = Skew.saltedJoin(big, small, "k", parts = 4, joinType = "left")
    assert(got.count() == 1001)
    assert(got.filter(col("k") === "lonely").head.getString(2) == null)
  }

  test("salted group count matches plain count") {
    val df = spark.range(5000).select(
      when(col("id") % 10 === 0, "hot").otherwise(concat(lit("k"), col("id"))).as("k"))
    val plain = df.groupBy("k").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val salted = Skew.saltedGroupCount(df, "k", parts = 8)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(salted == plain)
  }
}
