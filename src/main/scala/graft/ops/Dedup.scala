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

  /** LSH candidate pairs + exact Jaccard verify over an item-set
    * column — the shared engine under both the word-shingle and the
    * char-n-gram near-dup operators.
    *
    * `withItems` must provide (id, items: array<string>). Pipeline:
    * items → base hashes → k affine MinHash slots → band keys →
    * bucket equi-join (ids only) → distinct candidate pairs →
    * re-attach items → exact Jaccard ≥ threshold.
    */
  private[ops] def lshJaccardPairs(withItems: DataFrame, numHashes: Int,
      bands: Int, threshold: Double): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands
    val items = withItems.filter(size(col("items")) > 0)
    // Signature via the native kernel (graft.plans.MinhashSlots): one
    // digest + k running minima per row in a tight codegen'd loop,
    // bit-identical to the composed HOF form (MinhashSlotsSpec).
    // (Round 1 kept a per-operator HOF fallback because char-grams
    // measured faster composed; with the shuffle-hash verify and the
    // native band-key/jaccard kernels the native path wins for both —
    // word shingles and char n-grams — so the selection is gone.)
    // The repartition is the materialization barrier (CollapseProject
    // would otherwise duplicate the expensive signature into every
    // band-key consumer).
    val sig = items.withColumn("sig",
      graft.plans.MinhashSlots.minhashSlots(col("items"), numHashes))
      .repartition(col("id"))
    // candidates carry ids only — dedup never shuffles item arrays.
    // Band keys via the native kernel (bit-identical to the HOF form;
    // LshKernelsSpec) — one digest pass per band, codegen'd.
    val banded = sig.select(col("id"),
      explode(graft.plans.LshKernels.lshBandKeys(col("sig"), bands, rowsPerBand)).as("bk"))
      .select(col("id"),
        col("bk.band").as("band"), col("bk.band_hash").as("band_hash"))
    val a = banded.select(col("band"), col("band_hash"), col("id").as("id_a"))
    val b = banded.select(col("band"), col("band_hash"), col("id").as("id_b"))
    val cand = a.join(b, Seq("band", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    // Exact verify over HASHED item sets. Hard-won lessons baked in
    // here (stack-sampled at sf0.1):
    //  1. The Jaccard filter gets pushed into the join CONDITION; with
    //     a broadcast join it evaluates in the candidate stage, which
    //     AQE coalesces to ONE partition by bytes — and an explicit
    //     repartition cannot help because the optimizer eliminates it
    //     (broadcast joins demand no distribution). So the verify
    //     joins are pinned to SHUFFLE_HASH: the condition evaluates in
    //     the join stage, partitioned by the join key — distributed at
    //     any scale, AQE skew-split still applies.
    //  2. Make the verify cheap: intersecting long arrays is ~an order
    //     of magnitude cheaper than string arrays (the hot frames were
    //     Murmur3-over-bytes + arrayEquals inside OpenHashSet).
    //     Jaccard over 60-bit hashes equals Jaccard over the strings
    //     up to negligible collisions, and the DuckDB oracle hashes
    //     identically, so parity is exact.
    //  3. NEVER broadcast the corpus (round-1 scale-killer): the
    //     hashed item sets reach the verify through SHUFFLE joins
    //     keyed by id — O(corpus) long-array shuffle, disk-backed and
    //     partition-parallel at any scale, vs a broadcast that must
    //     fit whole in every executor. (A semi-join shrinking the
    //     corpus to candidate participants first was measured and
    //     rejected: it re-evaluates the entire LSH candidate subtree
    //     per semi-join — the signature pass is the dominant cost and
    //     tripled. The two shuffle-side subtrees below canonicalize
    //     identically, so ReuseExchange computes the md5 pass once.)
    val hashed = items.select(col("id"),
      transform(col("items"), g => portableHash64(g)).as("hs"))
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
      threshold: Double = 0.6): DataFrame =
    lshJaccardPairs(
      df.select(col(idCol).as("id"),
        wordShingles(tokens(col(textCol)), shingleLen).as("items")),
      numHashes, bands, threshold)

  /** SimHash values per doc; equal values = near-dup classes. The
    * token hashes are projected into their own column so each md5
    * evaluates once, not once per bit fold. */
  def simhashValues(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
      transform(tokens(col(textCol)), t => portableHash64(t)).as("__hs"))
      .select(col(idCol), simhash32FromHashes(col("__hs")).as("simhash"))

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
      threshold: Double = 0.7): DataFrame =
    lshJaccardPairs(
      df.select(col(idCol).as("id"),
        charNgrams(col(textCol), n).as("items")),
      numHashes, bands, threshold)

  /** Embedding near-dup pairs blocked by IVF coarse-centroid cells
    * ([[Ivf.assignments]]): candidate pairs are same-cell collisions
    * (ids only — vectors re-attach through SHUFFLE_HASH joins, same
    * discipline as the LSH verify), then exact cosine ≥ threshold.
    * Within-cell work is (n/numCentroids)² per cell — the knob that
    * keeps the quadratic term bounded as the corpus grows (pick
    * numCentroids ~ sqrt(n)); `probes` ≥ 2 catches boundary pairs. */
  def embeddingNearDupPairsIvf(df: DataFrame, idCol: String, vecCol: String,
      numCentroids: Int, probes: Int, threshold: Double): DataFrame = {
    val v = df.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val assign = Ivf.assignments(v, "id", "vec", numCentroids, probes)
    val a = assign.select(col("centroid_id"), col("id").as("id_a"))
    val b = assign.select(col("centroid_id"), col("id").as("id_b"))
    val cand = a.join(b, Seq("centroid_id"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
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
