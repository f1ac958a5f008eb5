package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class VectorAggregatesSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("centroids: every (label, pos) cell, correct n, mean of members") {
    val dim = vecs.select(size(col("embedding"))).head.getInt(0)
    val labels = vecs.select("label").distinct().count()
    val got = VectorAggregates.labelCentroids(vecs, "label", "vec_id",
      "embedding")
    assert(got.count() == labels * dim)
    // n per cell = member count of the label
    val sizes = vecs.groupBy("label").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    got.select("label", "n").distinct().collect().foreach { r =>
      assert(r.getLong(1) == sizes(r.getInt(0)))
    }
    // spot-check one cell against a driver-side mean
    val members = vecs.filter(col("label") === 0)
      .select(col("embedding")(0).cast("double")).collect().map(_.getDouble(0))
    val cell = got.filter(col("label") === 0 && col("pos") === 0)
      .select("centroid").head.getDouble(0)
    assert(math.abs(cell - members.sum / members.length) < 1e-9)
  }

  test("ordered fold agrees with the production agg to the last ulps") {
    val a = VectorAggregates.labelCentroids(vecs, "label", "vec_id",
      "embedding").select(col("label"), col("pos"), col("centroid").as("ca"))
    val b = VectorAggregates.labelCentroids(vecs, "label", "vec_id",
      "embedding", ordered = true)
      .select(col("label"), col("pos"), col("centroid").as("cb"))
    val maxDiff = a.join(b, Seq("label", "pos"))
      .agg(max(abs(col("ca") - col("cb")))).head.getDouble(0)
    assert(maxDiff < 1e-9, s"fold orders diverged by $maxDiff")
  }

  test("a Lloyd step never increases distortion for its assignment") {
    // the k-means update guarantee: with the assignment held fixed,
    // the mean minimizes squared distance — SSE(new centroids) <=
    // SSE(old anchors) on the same cells
    val e = vecs.select(col("vec_id").as("id"), col("embedding"))
    val assign = Ivf.assignments(e, "id", "embedding",
      numCentroids = 8, probes = 1)
    val member = e.join(assign, "id")
      .select(col("id"), col("centroid_id"),
        posexplode(col("embedding")).as(Seq("pos", "v")))
      .withColumn("v", col("v").cast("double"))
    val updated = VectorAggregates.labelCentroids(e.join(assign, "id"),
      "centroid_id", "id", "embedding")
      .select(col("centroid_id"), col("pos"), col("centroid"))
    val anchors = e.orderBy("id").limit(8)
      .select(col("id").as("centroid_id"),
        posexplode(col("embedding")).as(Seq("pos", "centroid")))
      .withColumn("centroid", col("centroid").cast("double"))
    def sse(cents: org.apache.spark.sql.DataFrame): Double =
      member.join(cents, Seq("centroid_id", "pos"))
        .agg(sum(pow(col("v") - col("centroid"), 2))).head.getDouble(0)
    assert(sse(updated) <= sse(anchors) + 1e-9,
      s"update increased distortion: ${sse(updated)} > ${sse(anchors)}")
  }

  test("production form: one partial-agg exchange on (group, pos)") {
    val plan = VectorAggregates.labelCentroids(vecs, "label", "vec_id",
      "embedding").queryExecution.executedPlan.toString
    assert(plan.contains("partial_count") || plan.contains("partial"),
      s"map-side combine missing:\n$plan")
    val exchanges = "hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"exactly one exchange expected:\n$plan")
  }
}
