package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Default per-(band, bucket) candidate cap: finite so a naive
    * caller gets the scale-safe plan (one boilerplate-text bucket
    * cannot go quadratic); large enough that it never binds on
    * ordinary corpora. Callers with an oracle mirror the cap rule. */
  val DefaultBucketCap: Int = 10000

  /** All unordered pairs (id_a < id_b) from a SORTED id array — the
    * in-bucket candidate explosion. */
  private def sortedPairs(ids: Column): Column =
    flatten(transform(sequence(lit(1), size(ids) - 1), i =>
      transform(sequence(i + 1, size(ids)), j =>
        struct(element_at(ids, i).as("id_a"),
          element_at(ids, j).as("id_b")))))

  /** LSH candidate pairs + exact Jaccard verify over an item-set
    * column — the shared engine under both the word-shingle and the
    * char-n-gram near-dup operators.
    *
    * `withItems` must provide (id, items: array<string>). Pipeline:
    * items → ONE md5 pass (hashed item sets, materialized) → k affine
    * MinHash slots from the hashes → band keys → per-bucket cap →
    * in-bucket pair explosion (ids only) → distinct candidate pairs →
    * re-attach hashed sets → exact Jaccard ≥ threshold.
    *
    * The md5-per-item pass is the dominant cost at every scale, and
    * this plan pays it EXACTLY ONCE: `hashed` is materialized eagerly
    * (localCheckpoint — the blocks are freed by the context cleaner
    * once the result frame is unreachable), the signature derives
    * from the stored hashes via [[graft.plans.MinhashSlotsFromHashes]]
    * (pure arithmetic, no digests), and both verify sides re-read the
    * same blocks. (The round-2 self-join shape re-evaluated the
    * signature subtree per join side — ReuseExchange does NOT fire
    * across renamed-column subtrees — so the corpus was scanned 8×
    * and digested ~2×. On a multi-executor cluster swap
    * localCheckpoint for a reliable `checkpoint` dir if executor loss
    * must not fail the job; the semantics are identical.)
    *
    * Candidate generation is a single groupBy over (band, band_hash):
    * window-cap the bucket membership (first `bucketCap` by id —
    * streaming sort, never a corpus-sized buffer), collect the ≤cap
    * ids, explode the in-bucket pairs. One shuffle, one evaluation of
    * the signature pass, and a hot bucket is bounded at cap²/2 pairs.
    */
  private[ops] def lshJaccardPairs(withItems: DataFrame, numHashes: Int,
      bands: Int, threshold: Double,
      bucketCap: Int = DefaultBucketCap): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    require(bucketCap >= 2, "bucketCap must admit at least one pair")
    val rowsPerBand = numHashes / bands
    val items = withItems.filter(size(col("items")) > 0)
    // THE md5 pass — once, materialized. 60-bit portable hashes keep
    // the verify exact (Jaccard over the hashes equals Jaccard over
    // the strings up to negligible collisions, and the DuckDB oracle
    // hashes identically).
    val hashed = items.select(col("id"),
      transform(col("items"), g => portableHash64(g)).as("hs"))
      .localCheckpoint(true)
    // Signature from the stored hashes (no digests), band keys via
    // the native kernel — both codegen'd, evaluated once inside the
    // single candidate-generation pass below.
    val banded = hashed.select(col("id"),
      explode(graft.plans.LshKernels.lshBandKeys(
        graft.plans.MinhashSlots.minhashSlotsFromHashes(col("hs"), numHashes),
        bands, rowsPerBand)).as("bk"))
      .select(col("id"),
        col("bk.band").as("band"), col("bk.band_hash").as("band_hash"))
    // Window + groupBy share one exchange on (band, band_hash): the
    // row_number cap streams through the sorted bucket (no giant
    // in-memory list for a pathological bucket), then collect_list
    // holds at most `bucketCap` ids.
    val wb = Window.partitionBy(col("band"), col("band_hash"))
      .orderBy(col("id").asc)
    val buckets = banded
      .withColumn("__rn", row_number().over(wb))
      .filter(col("__rn") <= bucketCap)
      .groupBy(col("band"), col("band_hash"))
      .agg(sort_array(collect_list(col("id"))).as("ids"))
      .filter(size(col("ids")) > 1)
    val cand = buckets
      .select(explode(sortedPairs(col("ids"))).as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
      .distinct()
    // Exact verify over the SAME materialized hashed sets. The joins
    // are pinned SHUFFLE_HASH: with a broadcast join the Jaccard
    // condition would evaluate in an AQE-coalesced single-partition
    // probe stage, and the corpus must never broadcast (round-1
    // scale-killer) — shuffle joins keyed by id stay disk-backed and
    // partition-parallel at any scale, AQE skew-split still applies.
    cand
      .join(hashed.select(col("id").as("id_a"), col("hs").as("h_a")).hint("shuffle_hash"), "id_a")
      .join(hashed.select(col("id").as("id_b"), col("hs").as("h_b")).hint("shuffle_hash"), "id_b")
      .withColumn("jaccard",
        graft.plans.LshKernels.hashedJaccard(col("h_a"), col("h_b")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** MinHash+LSH near-dup pairs over word shingles: shingle →
    * signature → band buckets → bucket equi-join → exact Jaccard
    * verify ≥ `threshold`. Returns (id_a, id_b, jaccard), id_a < id_b. */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
      shingleLen: Int = 3, numHashes: Int = 32, bands: Int = 8,
      threshold: Double = 0.6, bucketCap: Int = DefaultBucketCap): DataFrame =
    lshJaccardPairs(
      df.select(col(idCol).as("id"),
        wordShingles(tokens(col(textCol)), shingleLen).as("items")),
      numHashes, bands, threshold, bucketCap)

  /** SimHash values per doc; equal values = near-dup classes. One md5
    * pass for the token hashes, then the native one-pass kernel
    * ([[graft.plans.Simhash32]] — bit-identical to the 32-fold HOF
    * form, SimhashKernelSpec) packs the sketch. */
  def simhashValues(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
      transform(tokens(col(textCol)), t => portableHash64(t)).as("__hs"))
      .select(col(idCol),
        graft.plans.SimhashKernel.simhash32(col("__hs")).as("simhash"))

  /** Character-n-gram Jaccard near-dup pairs. Same LSH candidate
    * engine as [[minhashLshPairs]], but the item set is the distinct
    * char n-grams — the character-level metric catches reorderings
    * and small edits that word shingles miss.
    *
    * (A length-bucket blocking variant was measured first: with
    * real-world length concentration the buckets go quadratic — a few
    * buckets held most docs, producing millions of full array
    * intersections and partition skew. LSH keeps candidate mass
    * proportional to actual similarity, so it survives scale-up.) */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 5, numHashes: Int = 32, bands: Int = 8,
      threshold: Double = 0.7, bucketCap: Int = DefaultBucketCap): DataFrame =
    lshJaccardPairs(
      df.select(col(idCol).as("id"),
        charNgrams(col(textCol), n).as("items")),
      numHashes, bands, threshold, bucketCap)

  /** Default per-cell candidate cap for the IVF dedup — same
    * discipline as [[DefaultBucketCap]]: one hot cell (a
    * duplicate-heavy corpus is exactly the dedup use case) must not
    * go quadratic. */
  val DefaultCellCap: Int = 10000

  /** Embedding near-dup pairs blocked by IVF coarse-centroid cells
    * ([[Ivf.assignments]]): candidate pairs are same-cell collisions
    * (ids only — vectors re-attach through SHUFFLE_HASH joins, same
    * discipline as the LSH verify), then exact cosine ≥ threshold.
    * Within-cell work is (n/numCentroids)² per cell — the knob that
    * keeps the quadratic term bounded as the corpus grows (pick
    * numCentroids ~ sqrt(n)); `probes` ≥ 2 catches boundary pairs;
    * `cellCap` (first-N by id, window-capped) bounds a hot cell at
    * cap²/2 pairs no matter how skewed the corpus.
    *
    * The corpus is materialized ONCE (localCheckpoint): the codebook
    * sample, the assignment pass, and both verify sides all read the
    * same blocks instead of re-scanning (and re-deriving) the source. */
  def embeddingNearDupPairsIvf(df: DataFrame, idCol: String, vecCol: String,
      numCentroids: Int, probes: Int, threshold: Double,
      cellCap: Int = DefaultCellCap): DataFrame = {
    require(cellCap >= 2, "cellCap must admit at least one pair")
    val v = df.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .localCheckpoint(true)
    val assign = Ivf.assignments(v, "id", "vec", numCentroids, probes)
    val wc = Window.partitionBy(col("centroid_id")).orderBy(col("id").asc)
    val cells = assign
      .withColumn("__rn", row_number().over(wc))
      .filter(col("__rn") <= cellCap)
      .groupBy(col("centroid_id"))
      .agg(sort_array(collect_list(col("id"))).as("ids"))
      .filter(size(col("ids")) > 1)
    val cand = cells
      .select(explode(sortedPairs(col("ids"))).as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
      .distinct()
    val withNorm = v.withColumn("norm", sqrt(graft.plans.VectorKernels.dotProduct(col("vec"), col("vec"))))
    cand
      .join(withNorm.select(col("id").as("id_a"), col("vec").as("v_a"),
        col("norm").as("n_a")).hint("shuffle_hash"), "id_a")
      .join(withNorm.select(col("id").as("id_b"), col("vec").as("v_b"),
        col("norm").as("n_b")).hint("shuffle_hash"), "id_b")
      .withColumn("cos",
        graft.plans.VectorKernels.dotProduct(col("v_a"), col("v_b")) / (col("n_a") * col("n_b")))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }

  /** Embedding near-dup pairs: exact cosine within caller-provided
    * coarse blocks (any cheap cluster id — for the self-deriving
    * variant use [[embeddingNearDupPairsIvf]]). Returns
    * (id_a, id_b, cos). */
  def embeddingNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      blockCol: String, threshold: Double): DataFrame = {
    // self-norms computed once per vector (not once per pair)
    val v = df.select(col(blockCol).as("block"), col(idCol).as("id"),
      col(vecCol).as("vec"))
      .withColumn("norm", sqrt(graft.plans.VectorKernels.dotProduct(col("vec"), col("vec"))))
    val a = v.select(col("block"), col("id").as("id_a"),
      col("vec").as("v_a"), col("norm").as("n_a"))
    val b = v.select(col("block"), col("id").as("id_b"),
      col("vec").as("v_b"), col("norm").as("n_b"))
    a.join(b, Seq("block"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos",
        graft.plans.VectorKernels.dotProduct(col("v_a"), col("v_b")) / (col("n_a") * col("n_b")))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }
}
