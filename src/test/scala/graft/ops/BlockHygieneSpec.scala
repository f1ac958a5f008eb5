package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-3 regression guard: materializing a dedup result must leave
  * ZERO retained RDD blocks behind. The round-3 implementation pinned
  * an eager localCheckpoint of the corpus-scale hashed sets, which
  * outlived the query and degraded every subsequent query in a
  * shared session (the full-catalog bench went 94 s → 1,976 s). The
  * operators are now fully lazy; this spec keeps them that way. */
class BlockHygieneSpec extends SparkSpec {
  import spark.implicits._

  private def fixtureDocs = (1 to 60).map(i =>
    (i.toLong, s"alpha beta gamma delta epsilon zeta eta theta doc$i " * 3))
    .toDF("id", "text")

  private def fixtureVecs = (1 to 60).map(i =>
    (i.toLong, Array.fill(8)((i % 7).toFloat + 0.1f)))
    .toDF("id", "vec")

  test("minhash/ngram/simhash dedup retains no blocks after materialization") {
    Dedup.minhashLshPairs(fixtureDocs, "id", "text").count()
    Dedup.ngramJaccardPairs(fixtureDocs, "id", "text").count()
    Dedup.simhashValues(fixtureDocs, "id", "text").count()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      s"retained: ${spark.sparkContext.getPersistentRDDs.values.map(_.name)}")
  }

  test("IVF embedding dedup retains no blocks after materialization") {
    Dedup.embeddingNearDupPairsIvf(fixtureVecs, "id", "vec",
      numCentroids = 8, probes = 2, threshold = 0.5).count()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      s"retained: ${spark.sparkContext.getPersistentRDDs.values.map(_.name)}")
  }

  test("semantic dedup retains no blocks on either closure path (round-8)") {
    Dedup.semanticDedup(fixtureVecs, "id", "vec",
      numCentroids = 8, probes = 2, threshold = 0.5,
      driverMaxEdges = 0).count() // forced distributed fixpoint
    Dedup.semanticDedup(fixtureVecs, "id", "vec",
      numCentroids = 8, probes = 2, threshold = 0.5,
      driverMaxEdges = 100000).count()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      s"retained: ${spark.sparkContext.getPersistentRDDs.values.map(_.name)}")
  }

  test("wide simhash pairs and quantized ANN retain no blocks (round-5 ops)") {
    Dedup.simhashHammingPairs(fixtureDocs, "id", "text",
      maxDist = 2, width = 60).count()
    SimilaritySearch.quantizedIvfTopK(
      fixtureVecs.filter(col("id") < 5), fixtureVecs, "id", "vec",
      k = 3, numCentroids = 8, probes = 2).count()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      s"retained: ${spark.sparkContext.getPersistentRDDs.values.map(_.name)}")
  }

  test("PQ encode/ADC/rerank retain no blocks (codebook is driver arrays, not cached RDDs)") {
    SimilaritySearch.pqTopK(
      fixtureVecs.filter(col("id") < 5), fixtureVecs, "id", "vec",
      k = 3, m = 2, ks = 4, dim = 8).count()
    SimilaritySearch.pqRerankTopK(
      fixtureVecs.filter(col("id") < 5), fixtureVecs, "id", "vec",
      k = 3, shortlist = 6, m = 2, ks = 4, dim = 8, iters = 2).count()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      s"retained: ${spark.sparkContext.getPersistentRDDs.values.map(_.name)}")
  }

  test("cluster-best keep retains no blocks (eager CC inside)") {
    val pairs = Dedup.minhashLshPairs(fixtureDocs, "id", "text")
      .select("id_a", "id_b")
    Dedup.keepBestPerCluster(fixtureDocs, "id", pairs,
      length(col("text")).cast("double")).count()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      s"retained: ${spark.sparkContext.getPersistentRDDs.values.map(_.name)}")
  }
}
