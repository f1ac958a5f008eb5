package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("cmsHeavyHitters: exact top-k, band holds on a skewed stream") {
    // zipf-ish: "hot" 1000×, "warm" 100×, 500 singletons
    val items = (Seq.fill(1000)("hot") ++ Seq.fill(100)("warm") ++
      (1 to 500).map(i => s"tail$i")).toDF("item")
    val out = Sketches.cmsHeavyHitters(items, "item", k = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    assert(out.toSeq == Seq(("hot", 1000L, true), ("warm", 100L, true)))
  }

  test("cmsHeavyHitters: ties in the top-k break on item, deterministically") {
    val items = (Seq.fill(5)("b") ++ Seq.fill(5)("a") ++ Seq.fill(3)("c"))
      .toDF("item")
    val out = Sketches.cmsHeavyHitters(items, "item", k = 3)
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("a", "b", "c"))
  }

  test("cmsBuild estimates never undershoot and merge order-independently") {
    val items = (1 to 2000).map(i => s"t${i % 97}").toDF("item")
    val exact = items.groupBy("item").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // partitioning must not move a single counter: counter addition
    // commutes, so 1-partition and 13-partition builds are identical
    val sk1 = Sketches.cmsBuild(items.coalesce(1), "item")
    val sk13 = Sketches.cmsBuild(items.repartition(13), "item")
    exact.foreach { case (item, n) =>
      assert(sk1.estimateCount(item) >= n)
      assert(sk1.estimateCount(item) == sk13.estimateCount(item),
        s"partitioning moved the estimate for $item")
    }
    assert(sk1.totalCount() == 2000L)
  }

  test("cmsHeavyHitters over the documents fixture: band at default eps") {
    val toks = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(split(trim(col("text")), "\\s+")).as("item"))
      .filter(col("item") =!= "")
    val out = Sketches.cmsHeavyHitters(toks, "item", k = 20).collect()
    assert(out.length == 20)
    assert(out.forall(_.getBoolean(2)),
      s"band violated for ${out.filterNot(_.getBoolean(2)).mkString(",")}")
  }
}
