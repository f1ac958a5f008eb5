package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions._

/** Throwaway stage-attribution profiler for the LSH dedup pipeline:
  * times each prefix of the d4 (char-5-gram) pipeline at a given SF
  * so regressions can be pinned to a stage instead of guessed at.
  * Usage: runMain graft.tools.ProfileDedup <sfDir> */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def corpus: DataFrame = {
      val d = Tables.documents(spark, dir).select(col("doc_id").as("id"), col("text"))
      val perturbed = d.filter(col("id") % 4 === 0)
        .select((col("id") + 10000).as("id"),
          regexp_replace(col("text"), "^\\S+\\s+", "").as("text"))
      d.unionByName(perturbed)
    }

    def time(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = df.write.mode("overwrite").format("noop").save()
      println(f"PROFILE $name ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    val withItems = corpus.filter(length(col("text")) >= 5)
      .select(col("id"), charNgrams(col("text"), 5).as("items"))
    def hashed = withItems.select(col("id"),
      transform(col("items"), g => portableHash64(g)).as("hs"))
    def banded = hashed.select(col("id"),
      explode(graft.plans.LshKernels.lshBandKeys(
        graft.plans.MinhashSlots.minhashSlotsFromHashes(col("hs"), 32), 8, 4)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.band_hash").as("band_hash"))
    val wb = Window.partitionBy(col("band"), col("band_hash")).orderBy(col("id").asc)
    def capped = banded.withColumn("__rn", row_number().over(wb))
      .filter(col("__rn") <= 1000).select("band", "band_hash", "id")
    def cand = capped.as("ca").hint("merge")
      .join(capped.as("cb"),
        col("ca.band") === col("cb.band") &&
          col("ca.band_hash") === col("cb.band_hash") &&
          col("ca.id") < col("cb.id"))
      .select(col("ca.id").as("id_a"), col("cb.id").as("id_b"))
      .distinct()

    // warmup
    corpus.write.mode("overwrite").format("noop").save()
    time("corpus        ")(corpus)
    time("items         ")(withItems)
    time("hashed(md5)   ")(hashed)
    time("banded(sig)   ")(banded)
    time("capped(window)")(capped)
    time("cand(join+dst)")(cand)
    println(s"PROFILE cand_rows ${cand.count()}")
    time("full_d4       ")(graft.ops.Dedup.ngramJaccardPairs(
      corpus, "id", "text", n = 5, numHashes = 32, bands = 8,
      threshold = 0.7, bucketCap = 1000))
    spark.stop()
  }
}
