package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Dedup, SimilaritySearch}

/** Scale probe for the dedup/ANN family: replicate the sf corpus
  * `mult`× (id-offset copies — a duplicate-HEAVY corpus, the worst
  * case a dedup operator faces, since every doc gains mult-1 exact
  * copies) and measure each operator at 1× and mult×, with the
  * knobs both fixed (shows where quadratic terms would bite) and
  * scaled (cells ~ sqrt(n), the documented 100 TB discipline).
  *
  * Usage: runMain graft.tools.ScaleProbe <sfDir> [mult]
  * Output: one PROBE line per (op, scale, knobs) — recorded in
  * PLANS.md's scale-probe table. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val mult = if (args.length > 1) args(1).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def docs(m: Int): DataFrame = {
      val d = Tables.documents(spark, dir).select(col("doc_id").as("id"), col("text"))
      (0 until m).map(i => d.select((col("id") + i * 10000000L).as("id"), col("text")))
        .reduce(_ unionByName _)
    }
    def vecs(m: Int): DataFrame = {
      val e = Tables.embeddings(spark, dir).select(col("vec_id").as("id"), col("embedding"))
      (0 until m).map(i => e.select((col("id") + i * 10000000L).as("id"), col("embedding")))
        .reduce(_ unionByName _)
    }

    def probe(name: String, df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"PROBE $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n%10d")
    }

    // warmup
    docs(1).write.mode("overwrite").format("noop").save()

    for (m <- Seq(1, mult)) {
      val nDocs = 5000L * m // sf0.1 fixture size, for knob math only
      probe(s"d1_exact_x$m", Dedup.exactDuplicates(docs(m), "id", "text"))
      probe(s"d2_minhash_x$m", Dedup.minhashLshPairs(docs(m), "id", "text",
        shingleLen = 3, numHashes = 32, bands = 8, threshold = 0.6, bucketCap = 1000))
      probe(s"d4_ngram_x$m", Dedup.ngramJaccardPairs(docs(m), "id", "text",
        n = 5, numHashes = 32, bands = 8, threshold = 0.7, bucketCap = 1000))
      // fixed knobs: cell population grows linearly with m (the trap)
      probe(s"d5_ivf_x${m}_cells64", Dedup.embeddingNearDupPairsIvf(vecs(m),
        "id", "embedding", numCentroids = 64, probes = 2, threshold = 0.9,
        cellCap = 1000))
      if (m > 1) {
        // scaled knobs: cells ~ sqrt(n) keeps per-cell population flat
        val cells = math.max(64, math.sqrt(16500.0 * m).toInt)
        probe(s"d5_ivf_x${m}_cells$cells", Dedup.embeddingNearDupPairsIvf(vecs(m),
          "id", "embedding", numCentroids = cells, probes = 2, threshold = 0.9,
          cellCap = 1000))
      }
      probe(s"d7_hamming_x$m", Dedup.simhashHammingPairs(docs(m), "id", "text",
        maxDist = 2, bucketCap = 1000))
      probe(s"ss2_lsh_ann_x$m", SimilaritySearch.lshTopK(
        vecs(1).filter(col("id") < 10), vecs(m), "id", "embedding",
        k = 5, planes = 6, tables = 4, bucketCap = 200))
      probe(s"ss3_ivf_ann_x$m", SimilaritySearch.ivfTopK(
        vecs(1).filter(col("id") < 10), vecs(m), "id", "embedding",
        k = 5, numCentroids = math.max(32, math.sqrt(2000.0 * m).toInt),
        probes = 8, cellCap = 1000))
      val _ = nDocs
    }
    spark.stop()
  }
}
