package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Deduplication operators for training-data pipelines.
  *
  * Scale design (the point of each shape):
  *  - exact: one hash-groupBy on a 128-bit fingerprint — a single
  *    shuffle keyed by digest, map-side combinable; at 100 TB the
  *    digest (not the text) is what shuffles.
  *  - MinHash+LSH: candidate generation is an equi-join on
  *    (band, band_hash) buckets — never an O(n²) cross join. Identical
  *    docs always collide (recall 1.0 at s=1); the s-curve (bands ×
  *    rows) tunes the near-dup recall/cost trade. Skewed buckets
  *    (boilerplate text) are the known hazard → AQE skew-join handles
  *    moderate skew; pathological buckets should be capped upstream.
  *  - SimHash: one value per doc, dup classes = equal values — cheapest
  *    possible shuffle (a bigint), hamming-radius search via bit-band
  *    rotation if needed.
  *  - n-gram Jaccard: deterministic length-bucket blocking + in-bucket
  *    pair join; exact verification arithmetic (int ratios) so results
  *    are engine-portable.
  *  - embedding cosine: block on a coarse key (here: label / any
  *    cheap cluster id), exact cosine within blocks.
  */
object Dedup {

  /** Exact dedup: group by normalized fingerprint; keep the smallest
    * id as representative, count members. */
  def exactDuplicates(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), fingerprint(col(textCol)).as("fp"))
      .groupBy("fp")
      .agg(min(col(idCol)).as("rep_id"), count(lit(1)).as("n_members"))

  /** Exact dedup applied: one surviving row per fingerprint (the
    * min-id member). Two narrow shuffles, no text re-shuffled. */
  def dropExactDuplicates(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val reps = exactDuplicates(df, idCol, textCol)
      .select(col("rep_id").as(idCol))
    df.join(reps, Seq(idCol), "left_semi")
  }

  /** MinHash+LSH near-dup pairs: shingle → signature → band buckets →
    * bucket equi-join → exact Jaccard verify ≥ `threshold`.
    * Returns (id_a, id_b, jaccard) with id_a < id_b. */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
      shingleLen: Int = 3, numHashes: Int = 32, bands: Int = 8,
      threshold: Double = 0.6): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands
    val sh = df.select(col(idCol).as("id"),
      wordShingles(tokens(col(textCol)), shingleLen).as("shingles"))
      .filter(size(col("shingles")) > 0)
    val sig = sh.withColumn("sig", minhashSignature(col("shingles"), numHashes))
    val banded = sig.select(col("id"), col("shingles"),
      explode(lshBandKeys(col("sig"), bands, rowsPerBand)).as("bk"))
      .select(col("id"), col("shingles"),
        col("bk.band").as("band"), col("bk.band_hash").as("band_hash"))
    val a = banded.select(col("band"), col("band_hash"),
      col("id").as("id_a"), col("shingles").as("sh_a"))
    val b = banded.select(col("band"), col("band_hash"),
      col("id").as("id_b"), col("shingles").as("sh_b"))
    a.join(b, Seq("band", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        col("sh_a"), col("sh_b")).distinct() // candidates may collide in >1 band
      .withColumn("jaccard", jaccardSim(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** SimHash values per doc; equal values = near-dup classes. */
  def simhashValues(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), simhash32(tokens(col(textCol))).as("simhash"))

  /** Character-n-gram Jaccard near-dup pairs with deterministic
    * length-bucket blocking: docs within the same `bucketWidth` chars
    * bucket (and adjacent bucket) are compared exactly. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 5, bucketWidth: Int = 100, threshold: Double = 0.7): DataFrame = {
    val g = df.select(col(idCol).as("id"),
      charNgrams(col(textCol), n).as("grams"),
      (length(col(textCol)) / bucketWidth).cast("long").as("bucket"))
      .filter(size(col("grams")) > 0)
    // compare within same bucket and with the next bucket (docs near a
    // boundary): explode each doc to (bucket) and (bucket+1) probes.
    val probes = g.select(col("id"), col("grams"),
      explode(array(col("bucket"), col("bucket") + 1)).as("bucket"))
    val a = probes.select(col("bucket"), col("id").as("id_a"), col("grams").as("g_a"))
    val b = g.select(col("bucket"), col("id").as("id_b"), col("grams").as("g_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("g_a"), col("g_b")).distinct()
      .withColumn("jaccard", jaccardSim(col("g_a"), col("g_b")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Embedding near-dup pairs: exact cosine within coarse blocks
    * (blockCol = any cheap cluster id; at scale, an IVF coarse
    * centroid id). Returns (id_a, id_b, cos). */
  def embeddingNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      blockCol: String, threshold: Double): DataFrame = {
    val v = df.select(col(blockCol).as("block"), col(idCol).as("id"),
      col(vecCol).as("vec"))
    val a = v.select(col("block"), col("id").as("id_a"), col("vec").as("v_a"))
    val b = v.select(col("block"), col("id").as("id_b"), col("vec").as("v_b"))
    a.join(b, Seq("block"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", cosineSim(col("v_a"), col("v_b")))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }
}
