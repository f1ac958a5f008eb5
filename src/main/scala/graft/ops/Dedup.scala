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

  /** Distinct unordered candidate pairs (id_a < id_b) from capped
    * bucket membership rows via an equi-self-join on the bucket key.
    * `capped` must carry (`id` :: keyCols). Both join sides alias the
    * SAME plan, so the bucket-key exchange canonicalizes identically
    * and is computed once (ReuseExchange / AQE stage reuse) — the
    * expensive subtree above it (signatures, assignments) never
    * evaluates twice. (Round 3 tried collect_list + an in-row pair
    * explosion here instead; the nested sequence/transform struct
    * building measured 5-7× slower than the codegen'd join at sf0.1
    * and was reverted.) */
  private def cappedPairs(capped: DataFrame, keyCols: Seq[String]): DataFrame = {
    val joinCond = keyCols.map(k => col(s"ca.$k") === col(s"cb.$k"))
      .reduce(_ && _) && col("ca.id") < col("cb.id")
    // MERGE-pinned: left to stats, Spark broadcasts one side — a
    // BroadcastExchange never canonicalizes equal to the other side's
    // shuffle, so the expensive subtree would run twice (measured 7×
    // at sf0.1). With SMJ both children are the identical
    // already-partitioned, already-sorted bucket-key plan: one
    // shuffle, one evaluation, zero extra sorts.
    capped.as("ca").hint("merge").join(capped.as("cb"), joinCond)
      .select(col("ca.id").as("id_a"), col("cb.id").as("id_b"))
      .distinct()
  }

  /** LSH candidate pairs + exact Jaccard verify over pre-hashed item
    * sets — the shared engine under both the word-shingle and the
    * char-n-gram near-dup operators.
    *
    * `withHashes` must provide (id, hs: array<long>), hs NON-EMPTY,
    * projected by a native kernel ([[graft.plans.HashKernels]])
    * directly above a `repartition(id)` barrier — see the callers.
    * The barrier earns its one narrow raw-text shuffle three ways:
    * (1) the expensive hashing pass parallelizes over the full
    * shuffle-partition count regardless of input split layout (the
    * gate corpus is ONE parquet split — without the barrier the
    * whole md5 pass ran as a single task); (2) every consumer of
    * `withHashes` sits above the SAME exchange, which canonicalizes
    * identically and is computed once (AQE stage reuse) — one scan,
    * one shuffle, then banding and both verify builds each evaluate
    * the cheap codegen'd kernel in parallel; (3) its output is
    * already hashpartitioned by id, which is exactly the verify
    * joins' required distribution, so the hashed sides need NO
    * further exchange.
    *
    * Materialization policy (round 4, after measuring round 3's
    * regression): the plan is FULLY LAZY — nothing is pinned. An
    * eager snapshot (localCheckpoint) of the hashed sets was measured
    * strictly worse at sf0.1: building the corpus-sized (per-gram!)
    * deserialized block set cost more than the recompute it saved,
    * and the pinned blocks outlived the query, degrading every
    * subsequent query in a shared session. A linear, codegen'd
    * recompute scales; an unbounded block-manager residency does not.
    *
    * Pipeline: hs → k affine MinHash slots → band keys → per-bucket
    * cap (window row_number) → capped in-bucket self-join (ids only)
    * → distinct candidate pairs → re-attach hashed sets → exact
    * Jaccard ≥ threshold.
    */
  private[ops] def lshJaccardPairs(withHashes: DataFrame, numHashes: Int,
      bands: Int, threshold: Double,
      bucketCap: Int = DefaultBucketCap): DataFrame =
    lshVerifiedPairs(withHashes, numHashes, bands, threshold, bucketCap,
      "jaccard",
      (a, b) => graft.plans.LshKernels.sortedHashedJaccard(a, b))

  /** The shared LSH mine: band keys → per-bucket cap → capped
    * in-bucket self-join (ids only) → SHUFFLE_HASH re-attach of the
    * hashed sets → `metric(ha.hs, hb.hs)` named `metricName`, kept at
    * ≥ threshold. [[lshJaccardPairs]] and [[containmentPairs]] are
    * this chain with different verify expressions — ONE definition of
    * the cap rule, hint pinning, and exchange-reuse discipline.
    *
    * Per-bucket cap: row_number over the (band, band_hash) exchange
    * streams through the sorted bucket — first `bucketCap` ids, a
    * hot bucket is bounded at cap²/2 pairs. Verify joins are pinned
    * SHUFFLE_HASH: with a broadcast join the metric condition would
    * evaluate in an AQE-coalesced single-partition probe stage, and
    * the corpus must never broadcast (round-1 scale-killer) — shuffle
    * joins keyed by id stay disk-backed and partition-parallel at any
    * scale, AQE skew-split still applies. Both sides alias the SAME
    * un-renamed `withHashes` plan — already id-partitioned by the
    * callers' barrier, so neither side shuffles again and both
    * descend from the one reused exchange. */
  private def lshVerifiedPairs(withHashes: DataFrame, numHashes: Int,
      bands: Int, threshold: Double, bucketCap: Int, metricName: String,
      metric: (org.apache.spark.sql.Column, org.apache.spark.sql.Column)
        => org.apache.spark.sql.Column): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    require(bucketCap >= 2, "bucketCap must admit at least one pair")
    val hashed = withHashes
    val banded = bandKeys(hashed, numHashes, bands)
    val capped = capBlocks(banded, Seq("band", "band_hash"), bucketCap)
    val cand = cappedPairs(capped, Seq("band", "band_hash"))
    val verify = hashed.hint("shuffle_hash")
    cand
      .join(verify.as("ha"), col("id_a") === col("ha.id"))
      .join(verify.as("hb"), col("id_b") === col("hb.id"))
      .withColumn(metricName, metric(col("ha.hs"), col("hb.hs")))
      .filter(col(metricName) >= threshold)
      .select("id_a", "id_b", metricName)
  }

  /** Deterministic per-block cap — the uniform rule every blocked
    * miner shares: first `cap` ids per `keys` block (row_number over
    * the block exchange), so a hot block is bounded at cap²/2 pairs.
    * Returns (keys..., id). */
  private def capBlocks(df: DataFrame, keys: Seq[String],
      cap: Int): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("id").asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= cap)
      .select((keys :+ "id").map(col): _*)
  }

  /** MinHash+LSH near-dup pairs over word shingles: shingle →
    * signature → band buckets → bucket equi-join → exact Jaccard
    * verify ≥ `threshold`. Returns (id_a, id_b, jaccard), id_a < id_b.
    *
    * The shingle-hash pass is the native one-pass kernel
    * ([[graft.plans.HashKernels]] — bit-identical to the composed
    * `transform(wordShingles(tokens), portableHash64)` form, which
    * evaluated interpreted per element), projected above the
    * `repartition(id)` barrier (see lshJaccardPairs). The non-empty
    * guard is a cheap raw predicate (≥ shingleLen tokens ⟺ non-empty
    * shingle set): an items-based `size(items) > 0` guard would
    * re-derive the shingles inside the pushed-down filter. */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
      shingleLen: Int = 3, numHashes: Int = 32, bands: Int = 8,
      threshold: Double = 0.6, bucketCap: Int = DefaultBucketCap): DataFrame =
    lshJaccardPairs(lshSignatures(df, idCol, textCol, shingleLen),
      numHashes, bands, threshold, bucketCap)

  /** AUTO band geometry: (numHashes, bands) derived from the corpus
    * count — the band-miner analogue of
    * [[embeddingNearDupPairsIvfAuto]]'s sqrt(n) cell rule, closing
    * the fixed-knob hazard the x30 scale probe measured (d4 at 4-row
    * bands: 495 s vs 32.4 s at 8-row bands, identical output — the
    * shallow bands admit ~j₀^r of ALL pairs as candidates and the
    * verify stage swamps everything once n² grows past the band
    * selectivity).
    *
    * Derivation (both knobs from first principles, no magic pairs):
    *  - `rowsPerBand` r = the smallest depth at which expected NOISE
    *    collision mass is sublinear in the corpus: a random pair
    *    collides in one band w.p. ~noiseSim^r, so candidate mass
    *    ~bands·n²·noiseSim^r stays O(bands·n) when noiseSim^r ≤ 1/n,
    *    i.e. r = ⌈ln n / ln(1/noiseSim)⌉ (floor 4 — the reference
    *    geometry's depth). noiseSim defaults to 0.3, the measured
    *    between-unrelated-docs similarity of shingle/char-gram sets
    *    on real corpora (vocabulary overlap).
    *  - `bands` b = the count that keeps RECALL at the verify
    *    threshold despite the deeper bands: a true pair at jaccard t
    *    survives banding w.p. 1-(1-t^r)^b ≥ 1-missRate when
    *    b = ⌈ln(1/missRate)/t^r⌉ (capped at maxBands — past that the
    *    signature pass, not the miner, would dominate; the cap binding
    *    means the requested (threshold, missRate) pair is not
    *    affordable at this n and recall degrades, documented here).
    *
    * numHashes = b·r grows with the corpus (e.g. n=500 → 54 hashes in
    * 9×6 bands; n≈2·10⁵ → ~300 in 27×11) — exactly the published
    * large-corpus practice (hundreds of permutations), and the
    * signature cost it adds is linear while the candidate mass it
    * removes is quadratic. */
  def autoBandGeometry(n: Long, threshold: Double,
      noiseSim: Double = 0.3, missRate: Double = 0.1,
      maxBands: Int = 64): (Int, Int) = {
    require(threshold > 0 && threshold < 1, "threshold must be in (0, 1)")
    require(noiseSim > 0 && noiseSim < 1, "noiseSim must be in (0, 1)")
    require(missRate > 0 && missRate < 1, "missRate must be in (0, 1)")
    val r = math.max(4, math.ceil(
      math.log(math.max(2L, n).toDouble) / math.log(1.0 / noiseSim)).toInt)
    val bWant = math.ceil(math.log(1.0 / missRate) / math.pow(threshold, r))
    val b = math.min(maxBands, math.max(2, bWant.toInt))
    (b * r, b)
  }

  /** RECALL-FIRST band geometry: (numHashes, bands) derived from the
    * verify threshold alone, for the passes where a MISS is the
    * failure mode that must not happen (decontamination: a missed
    * candidate silently KEEPS a contaminated doc — there is no verify
    * stage downstream to save it). [[autoBandGeometry]] optimizes the
    * dual problem (bound noise-candidate mass, given a corpus count);
    * this one guarantees recall: a true pair AT the threshold t
    * survives (b, r) banding w.p. 1-(1-t^r)^b, so b = ⌈ln(1/missRate)
    * / t^r⌉ pins recall ≥ 1-missRate, and r is then the LARGEST depth
    * whose recall-sufficient band count is still affordable
    * (b ≤ maxBands and b·r ≤ maxHashes) — deeper bands cut noise
    * collisions ~noiseSim^r, so maximizing r under the recall
    * constraint is the best noise control recall allows. At the
    * decontamination default t=0.5 this yields r=4, b=37 (148 hashes,
    * recall 0.91 at the threshold and higher above it) — versus the
    * old fixed (32, 8) geometry's 0.40. If even r=1 cannot afford the
    * recall target (threshold very low), the geometry degrades to
    * (maxBands, maxBands·1) and recall at the threshold is
    * 1-(1-t)^maxBands — document the miss risk or raise the caps. */
  def recallBandGeometry(threshold: Double, missRate: Double = 0.1,
      maxBands: Int = 64, maxHashes: Int = 256): (Int, Int) = {
    require(threshold > 0 && threshold < 1, "threshold must be in (0, 1)")
    require(missRate > 0 && missRate < 1, "missRate must be in (0, 1)")
    require(maxBands >= 2 && maxHashes >= maxBands,
      "need maxBands >= 2 and maxHashes >= maxBands")
    // the floor-of-2 bump applies BEFORE the affordability check, so
    // the returned b*r can never exceed the maxHashes cap the caller
    // sized its signature budget by
    def bandsFor(r: Int): Int =
      math.max(2, math.ceil(
        math.log(1.0 / missRate) / math.pow(threshold, r)).toInt)
    // bandsFor grows with depth, so affordable depths are a prefix
    val affordable = (1 to 32).takeWhile { r =>
      val b = bandsFor(r); b <= maxBands && b * r <= maxHashes
    }
    affordable.lastOption match {
      case Some(r) =>
        val b = bandsFor(r)
        (b * r, b)
      case None => (maxBands, maxBands) // r=1, recall-degraded (see doc)
    }
  }

  /** [[minhashLshPairs]] with the band geometry AUTO-SIZED from one
    * cheap corpus count via [[autoBandGeometry]] — the variant a
    * deployment that does not know its corpus size ahead of time
    * should call (the explicit-knob form remains for callers that do,
    * and for oracle pins at a fixed geometry). The count is one
    * columnar-scan job over the id column — noise next to the
    * signature pass it sizes. Defaults (threshold included) match the
    * explicit-knob form exactly: auto changes the GEOMETRY, never the
    * verify semantics. */
  def minhashLshPairsAuto(df: DataFrame, idCol: String, textCol: String,
      shingleLen: Int = 3, threshold: Double = 0.6,
      noiseSim: Double = 0.3, missRate: Double = 0.1,
      bucketCap: Int = DefaultBucketCap): DataFrame = {
    val n = df.select(col(idCol)).count()
    val (numHashes, bands) = autoBandGeometry(n, threshold, noiseSim, missRate)
    minhashLshPairs(df, idCol, textCol, shingleLen, numHashes, bands,
      threshold, bucketCap)
  }

  /** [[ngramJaccardPairs]] with auto-sized band geometry — see
    * [[minhashLshPairsAuto]]; this is the miner whose fixed default
    * knob the x30 probe measured at 15× wall-time. */
  def ngramJaccardPairsAuto(df: DataFrame, idCol: String, textCol: String,
      n: Int = 5, threshold: Double = 0.7,
      noiseSim: Double = 0.3, missRate: Double = 0.1,
      bucketCap: Int = DefaultBucketCap): DataFrame = {
    val corpusN = df.select(col(idCol)).count()
    val (numHashes, bands) = autoBandGeometry(corpusN, threshold, noiseSim, missRate)
    ngramJaccardPairs(df, idCol, textCol, n, numHashes, bands,
      threshold, bucketCap)
  }

  /** [[minhashLshPairs]] from an already-computed signature table
    * (id, hs) — for callers that hold [[lshSignatures]] output (a
    * persisted per-batch frame in the streaming loops, or the stored
    * signature table): the mine then derives from the signatures
    * alone and never re-reads or re-hashes text. */
  def minhashLshPairsFromSigs(sigs: DataFrame, numHashes: Int = 32,
      bands: Int = 8, threshold: Double = 0.6,
      bucketCap: Int = DefaultBucketCap): DataFrame =
    lshJaccardPairs(sigs, numHashes, bands, threshold, bucketCap)

  /** The per-doc hashed word-shingle sets (id, hs: array<long>) — the
    * signature table an incremental dedup deployment persists once
    * per corpus (ONE text pass ever; the band index and every later
    * batch probe derive from it, never from the raw text again).
    * Shape: the minhashLshPairs preamble verbatim — non-empty guard
    * as a raw-token predicate, `repartition(id)` barrier, native
    * one-pass shingle-hash kernel above it (see [[lshJaccardPairs]]
    * for why the barrier earns its shuffle). */
  def lshSignatures(df: DataFrame, idCol: String, textCol: String,
      shingleLen: Int = 3): DataFrame =
    df.filter(size(tokens(col(textCol))) >= shingleLen)
      .select(col(idCol).as("id"), col(textCol).as("__text"))
      .repartition(col("id"))
      .select(col("id"),
        graft.plans.HashKernels.hashedWordShingles(col("__text"), shingleLen).as("hs"))

  /** (id, band, band_hash) band-membership keys from a signature
    * table — the shared candidate-generation geometry of the batch
    * and incremental engines (minhash slots + band keys, both native
    * codegen'd kernels). */
  private def bandKeys(hashed: DataFrame, numHashes: Int,
      bands: Int): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    hashed.select(col("id"),
      explode(graft.plans.LshKernels.lshBandKeys(
        graft.plans.MinhashSlots.minhashSlotsFromHashes(col("hs"), numHashes),
        bands, numHashes / bands)).as("bk"))
      .select(col("id"),
        col("bk.band").as("band"), col("bk.band_hash").as("band_hash"))
  }

  /** UNCAPPED band membership (id, band, band_hash) from a signature
    * table — the block structure [[blockSaturation]] audits BEFORE
    * the miners' window cap is applied (the capped index can never
    * show saturation, by construction). One narrow frame, ~bands rows
    * per doc. */
  def lshBandMembership(signatures: DataFrame, numHashes: Int = 32,
      bands: Int = 8): DataFrame =
    bandKeys(signatures, numHashes, bands)

  /** The LSH band INDEX of a corpus: (id, band, band_hash), capped at
    * `bucketCap` members per (band, band_hash) bucket (first-by-id,
    * the same cap rule as the batch engine). Built FROM the stored
    * signature table ([[lshSignatures]]) so indexing never re-reads
    * text. This is the artifact an incremental deployment maintains
    * in the table store next to the signatures: ~bands rows of three
    * narrow columns per doc, appended as batches commit. */
  def lshBandIndex(signatures: DataFrame, numHashes: Int = 32,
      bands: Int = 8, bucketCap: Int = DefaultBucketCap): DataFrame =
    capBlocks(bandKeys(signatures, numHashes, bands),
      Seq("band", "band_hash"), bucketCap)
      .select("id", "band", "band_hash")

  /** Incremental near-dup probe: match a NEW ingest batch against an
    * already-indexed corpus without re-signaturing (or re-shuffling)
    * the corpus. Returns (corpus_id, new_id, jaccard ≥ threshold).
    *
    * This is the shape a 100 TB deployment actually runs — the full
    * pair mine ([[minhashLshPairs]]) happens once, then every crawl
    * batch probes the stored index:
    *  - `corpusBands` (id, band, band_hash) and `corpusHashes`
    *    (id, hs) are the STORED index + signature tables
    *    ([[lshBandIndex]] / [[lshSignatures]]).
    *  - The batch side is ingest-batch-sized BY CONTRACT, so both
    *    corpus tables are probed with BROADCAST joins: candidate
    *    generation broadcasts the batch's band keys into one
    *    scan-rate pass over the index, and verify broadcasts the
    *    candidate ids into one scan-rate pass over the signatures.
    *    NOTHING corpus-sized ever shuffles — per-batch cost is
    *    O(corpus scan) + O(batch + candidate mass), and with the
    *    index stored partitioned the scan itself prunes.
    *  - Bucket capping lives in the stored index (build-time rule);
    *    a hot boilerplate bucket contributes ≤ cap candidates per
    *    batch doc per band.
    *  - In-batch duplicates are out of scope by design: compose with
    *    `minhashLshPairs(batch)` (batch-sized, cheap) when needed.
    * Batch ids must be disjoint from corpus ids (ingest contract;
    * equal ids are skipped defensively). */
  def incrementalLshPairs(newDocs: DataFrame, idCol: String,
      textCol: String, corpusBands: DataFrame, corpusHashes: DataFrame,
      shingleLen: Int = 3, numHashes: Int = 32, bands: Int = 8,
      threshold: Double = 0.6): DataFrame =
    incrementalLshPairsFromSigs(
      lshSignatures(newDocs, idCol, textCol, shingleLen),
      corpusBands, corpusHashes, numHashes, bands, threshold)

  /** [[incrementalLshPairs]] from an already-computed batch signature
    * table (id, hs) — the one-text-pass discipline for callers that
    * signature the batch once and reuse it for the in-batch mine,
    * the cross-corpus probe, AND the store commit (the streaming
    * ingest loops). Probe shape identical: batch bands broadcast
    * into one scan-rate pass over the stored index, candidates
    * broadcast into one scan-rate pass over the stored signatures. */
  /** `excludeSelfPairs`: with true (the d10 default) an equal id on
    * both sides means THE SAME DOCUMENT (batch ∪ corpus share one id
    * namespace) and the self-pair is skipped. Callers probing across
    * two UNRELATED id namespaces (decontamination: doc ids vs bench
    * ids, both typically numbered 0..N) must pass false — there an
    * equal id is a coincidence, and skipping it would silently drop
    * a genuine cross-corpus match. */
  def incrementalLshPairsFromSigs(batchSigs: DataFrame,
      corpusBands: DataFrame, corpusHashes: DataFrame,
      numHashes: Int = 32, bands: Int = 8,
      threshold: Double = 0.6,
      excludeSelfPairs: Boolean = true): DataFrame = {
    val batch = batchSigs
    val batchBands = bandKeys(batch, numHashes, bands)
    // Candidate generation: ONE scan-rate pass over the stored index,
    // batch band keys on the broadcast side.
    val joinCond = {
      val onBand = col("ci.band") === col("nb.band") &&
        col("ci.band_hash") === col("nb.band_hash")
      if (excludeSelfPairs) onBand && col("ci.id") =!= col("nb.id")
      else onBand
    }
    val cand = corpusBands.as("ci")
      .join(broadcast(batchBands.as("nb")), joinCond)
      .select(col("ci.id").as("corpus_id"), col("nb.id").as("new_id"))
      .distinct()
    // Verify: attach corpus hashed sets by broadcasting the candidate
    // pairs into ONE scan-rate pass over the stored signatures (the
    // corpus-side alternative — a shuffle-hash join — would shuffle
    // the whole signature table by id per batch); then a small
    // shuffle-hash join re-attaches the batch sets. Only
    // candidate-mass-sized data ever exchanges.
    val withCorpus = corpusHashes.as("ha")
      .join(broadcast(cand), col("ha.id") === col("corpus_id"))
      .select(col("corpus_id"), col("new_id"), col("ha.hs").as("__hs_c"))
    withCorpus.hint("shuffle_hash")
      .join(batch.as("hb").hint("shuffle_hash"),
        col("new_id") === col("hb.id"))
      .withColumn("jaccard",
        graft.plans.LshKernels.sortedHashedJaccard(col("__hs_c"), col("hb.hs")))
      .filter(col("jaccard") >= threshold)
      .select("corpus_id", "new_id", "jaccard")
  }

  /** SimHash values per doc; equal values = near-dup classes. Token
    * hashes via the native kernel (hashedWordShingles with n = 1 ≡
    * one portableHash64 per token — the composed
    * `transform(tokens, portableHash64)` form evaluated interpreted),
    * then the native one-pass packer ([[graft.plans.SimhashKernel]] —
    * bit-identical to the width-fold HOF form, SimhashKernelSpec).
    *
    * `width` (sketch bits, default 32 = the reference's width): 60 is
    * the scale setting — the widest sketch every one of whose
    * counters sees a live bit of the portable 60-bit md5-prefix
    * token hash (and the widest whose oracle replica stays in signed
    * BIGINT); see [[graft.plans.SimhashWide]]. */
  def simhashValues(df: DataFrame, idCol: String, textCol: String,
      width: Int = 32): DataFrame =
    df.select(col(idCol),
      graft.plans.HashKernels.hashedWordShingles(col(textCol), 1).as("__hs"))
      .select(col(idCol),
        graft.plans.SimhashKernel.simhashWide(col("__hs"), width).as("simhash"))

  /** SimHash near-dup pairs within hamming distance ≤ `maxDist`:
    * pigeonhole bit-band blocking — the `width` sketch bits split
    * into maxDist+1 contiguous bands, and two sketches within
    * `maxDist` MUST agree on at least one whole band (pigeonhole), so
    * equal-band collision is a COMPLETE candidate generator (recall
    * 1.0, unlike the probabilistic LSH engines). Candidates are the
    * capped in-band self-join (ids only, one 8-byte sketch per doc —
    * the cheapest near-dup shuffle in the library); verify is
    * popcount(xor) on the re-attached sketches.
    *
    * WIDTH CONTRACT — never run `width` < 60 beyond gate scale. Each
    * band gets width/(maxDist+1) bits of selectivity, so narrow
    * sketches saturate their band buckets as the corpus grows and the
    * candidate mass trends quadratic: at 32 bits the round-5 scale
    * probe measured 1.6M collision-dominated pairs at 10× gate scale
    * vs 245k true pairs at width 60 — and `bucketCap` then silently
    * trades away the within-radius completeness that is this
    * operator's contract. The default is therefore 60 (every portable
    * bit of the md5-prefix token hash; 2^9–2^10 more selective per
    * band at maxDist ≤ 2). Width 32 exists ONLY as the reference's
    * sketch width for the d3/d7 oracle pins — the d7 gate passes it
    * explicitly, at gate scale, where saturation cannot bind. */
  def simhashHammingPairs(df: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3, bucketCap: Int = DefaultBucketCap,
      width: Int = 60): DataFrame = {
    require(width >= 1 && width <= 64, "width must be in [1, 64]")
    require(maxDist >= 0 && maxDist < width, "maxDist must be in [0, width)")
    require(bucketCap >= 2, "bucketCap must admit at least one pair")
    val bands = maxDist + 1
    // same repartition(id) barrier as the LSH engines: the dominant
    // tokenize+hash+sketch pass parallelizes independent of input
    // splits, and banding + both verify sides share the one exchange
    val sh = simhashValues(
      df.select(col(idCol), col(textCol)).repartition(col(idCol)),
      idCol, textCol, width)
      .select(col(idCol).as("id"), col("simhash"))
    val banded = sh.select(col("id"),
      explode(array((0 until bands).map { b =>
        val lo = b * width / bands
        val hi = (b + 1) * width / bands
        struct(lit(b).as("band"),
          shiftrightunsigned(col("simhash"), lo)
            .bitwiseAND(lit(if (hi - lo == 64) -1L else (1L << (hi - lo)) - 1))
            .as("band_bits"))
      }: _*)).as("bk"))
      .select(col("id"), col("bk.band").as("band"),
        col("bk.band_bits").as("band_bits"))
    val capped = capBlocks(banded, Seq("band", "band_bits"), bucketCap)
    val cand = cappedPairs(capped, Seq("band", "band_bits"))
    val verify = sh.hint("shuffle_hash")
    cand
      .join(verify.as("sa"), col("id_a") === col("sa.id"))
      .join(verify.as("sb"), col("id_b") === col("sb.id"))
      .withColumn("hamming",
        bit_count(col("sa.simhash").bitwiseXOR(col("sb.simhash"))))
      .filter(col("hamming") <= maxDist)
      .select("id_a", "id_b", "hamming")
  }

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
      // length ≥ n ⟺ non-empty n-gram set (cheap raw-text guard);
      // distinct-gram hashing via the native kernel above the
      // repartition barrier — same design as minhashLshPairs.
      df.filter(length(col(textCol)) >= n)
        .select(col(idCol).as("id"), col(textCol).as("__text"))
        .repartition(col("id"))
        .select(col("id"),
          graft.plans.HashKernels.hashedCharNgrams(col("__text"), n).as("hs")),
      numHashes, bands, threshold, bucketCap)

  /** Containment near-dup pairs — the ASYMMETRIC membership metric:
    * |A∩B| / min(|A|, |B|) over distinct hashed shingle sets. Catches
    * what Jaccard structurally cannot: a short document quoted whole
    * inside a long one has tiny Jaccard (the union is long-doc-sized)
    * but containment ≈ 1. Training pipelines run this after plain
    * near-dup to catch quote-inclusion/boilerplate-wrapping
    * duplication.
    *
    * Same candidate engine as [[minhashLshPairs]] (signatures, band
    * buckets, cap, one reused exchange — recall note: MinHash bands
    * collide ∝ Jaccard, so an extreme length-skew containment pair
    * can evade banding; the standard mitigation at scale is chunking
    * the long side first, which [[graft.ops.TextAnalysis]] ts7
    * provides). Verify is codegen'd set arithmetic on the re-attached
    * hashed sets through the pinned SHUFFLE_HASH joins. */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
      shingleLen: Int = 3, numHashes: Int = 32, bands: Int = 8,
      threshold: Double = 0.8, bucketCap: Int = DefaultBucketCap): DataFrame =
    lshVerifiedPairs(lshSignatures(df, idCol, textCol, shingleLen),
      numHashes, bands, threshold, bucketCap, "containment",
      (a, b) => size(array_intersect(a, b)).cast("double") /
        least(size(array_distinct(a)), size(array_distinct(b)))
          .cast("double"))

  /** CHUNKED containment pairs — closes [[containmentPairs]]'s
    * documented recall gap for extreme length skew (full quote /
    * boilerplate capture): MinHash bands collide ∝ JACCARD, so a
    * short document quoted whole inside a 6×-longer one (containment
    * ≈ 1, jaccard ≈ 0.15) evades direct banding. The standard
    * mitigation, composed here as one operator: chunk EVERY document
    * into `windowTokens`-token windows with `stride` overlap
    * ([[TextAnalysis.chunk]] — a short doc is its own single chunk),
    * mine containment on the CHUNKS (quote-vs-matching-window pairs
    * have high jaccard, so banding recovers them), then aggregate
    * chunk pairs to doc-level pairs (max chunk containment + the
    * matching-chunk-pair count as evidence mass). Any quote of ≥
    * windowTokens+stride−1 tokens contains a stride-ALIGNED full
    * window of the long side, so its chunk pair reaches jaccard ≈ 1
    * regardless of the length ratio; shorter quotes degrade
    * gracefully toward d15's direct recall.
    *
    * Scale shape: chunking is scan-rate (zero shuffle, output ∝
    * corpus/stride); the mine is the audited LSH chain over
    * chunk-sized texts (chunk ids are `id·chunkIdFactor + chunk_no`
    * — `chunk_no` < chunkIdFactor by contract); the doc-level rollup
    * is one combinable aggregation on (id_a, id_b). Same-doc chunk
    * pairs (trivially overlapping windows) drop before the rollup. */
  def chunkedContainmentPairs(df: DataFrame, idCol: String, textCol: String,
      windowTokens: Int = 16, stride: Int = 8, shingleLen: Int = 3,
      numHashes: Int = 32, bands: Int = 8, threshold: Double = 0.8,
      bucketCap: Int = DefaultBucketCap,
      chunkIdFactor: Long = 1000000L): DataFrame = {
    require(chunkIdFactor >= 2, "chunkIdFactor must exceed any chunk_no")
    // the packed cid is only decodable for 0 <= id <= Long.Max/factor
    // and chunk_no < factor — outside that, a negative id would
    // silently decode into ANOTHER doc's range (truncating div) and a
    // giant id would overflow: fail the row loudly instead (callers
    // with hash-derived ids must remap, e.g. pmod into a dense range)
    val idOk = col(idCol) >= 0 &&
      col(idCol) <= Long.MaxValue / chunkIdFactor - 1 &&
      col("chunk_no") < chunkIdFactor
    val packed = when(idOk,
      col(idCol) * chunkIdFactor + col("chunk_no"))
      .otherwise(raise_error(concat(
        lit(s"chunkedContainmentPairs: id/chunk_no outside the packable " +
          s"range for chunkIdFactor=$chunkIdFactor (id="),
        col(idCol).cast("string"), lit(", chunk_no="),
        col("chunk_no").cast("string"), lit(")"))).cast("long"))
    val chunks = TextAnalysis.chunk(
      df.select(col(idCol), col(textCol)), idCol, textCol,
      windowTokens, stride)
      .select(packed.as("cid"), col("chunk_text"))
    containmentPairs(chunks, "cid", "chunk_text", shingleLen,
      numHashes, bands, threshold, bucketCap)
      .select(expr(s"id_a div $chunkIdFactor").as("da"),
        expr(s"id_b div $chunkIdFactor").as("db"), col("containment"))
      .filter(col("da") =!= col("db"))
      .select(least(col("da"), col("db")).as("id_a"),
        greatest(col("da"), col("db")).as("id_b"), col("containment"))
      .groupBy("id_a", "id_b")
      .agg(max(col("containment")).as("containment"),
        count(lit(1)).as("n_chunk_pairs"))
  }

  /** Blocked fuzzy (edit-distance) near-dup pairs — the typo-class
    * match the hash families cannot see: two keys within `maxDist`
    * single-character edits collide on NO shingle/simhash bucket
    * reliably, but levenshtein finds them. All-pairs levenshtein is
    * O(n²·L²) and never survives scale, so this is the standard
    * entity-resolution shape: a normalized comparison key (lower,
    * whitespace-collapsed, first `keyLen` chars), BLOCKING on
    * (2-char prefix, length band of width maxDist+1), per-block cap,
    * capped in-block self-join (ids only), then levenshtein verify
    * on the re-attached keys.
    *
    * Recall contract (documented, unlike the pigeonhole engines):
    * blocking bounds recall — a pair that disagrees in the first two
    * key chars, or straddles a length-band boundary, is not
    * generated. That is the accepted trade of blocking-based ER;
    * widen blocks (more bands, multi-pass blocking) to buy recall
    * with candidate mass. Verify distance is measured on the KEYS
    * (the operator's contract), not the full text — L is bounded by
    * `keyLen`, so the per-pair cost is constant.
    *
    * Same engine discipline as the LSH family: one repartition(id)
    * barrier under key derivation shared by blocking and both verify
    * sides, WindowGroupLimit cap before the MERGE-pinned self-join,
    * SHUFFLE_HASH key re-attach carrying `keyLen` chars per row. */
  def blockedFuzzyPairs(df: DataFrame, idCol: String, textCol: String,
      keyLen: Int = 40, maxDist: Int = 5,
      bucketCap: Int = DefaultBucketCap): DataFrame = {
    require(keyLen >= 3, "keyLen must cover the blocking prefix")
    require(maxDist >= 0, "maxDist must be non-negative")
    require(bucketCap >= 2, "bucketCap must admit at least one pair")
    val keyed = df.select(col(idCol), col(textCol))
      .repartition(col(idCol))
      .select(col(idCol).as("id"),
        substring(regexp_replace(lower(trim(col(textCol))), "\\s+", " "),
          1, keyLen).as("k"))
    val blocked = keyed.select(col("id"),
      substring(col("k"), 1, 2).as("b_pre"),
      (length(col("k")) / lit(maxDist + 1)).cast("int").as("b_len"))
    val capped = capBlocks(blocked, Seq("b_pre", "b_len"), bucketCap)
    val cand = cappedPairs(capped, Seq("b_pre", "b_len"))
    val verify = keyed.hint("shuffle_hash")
    cand
      .join(verify.as("ka"), col("id_a") === col("ka.id"))
      .join(verify.as("kb"), col("id_b") === col("kb.id"))
      .withColumn("dist", levenshtein(col("ka.k"), col("kb.k")))
      .filter(col("dist") <= maxDist)
      .select("id_a", "id_b", "dist")
  }

  /** APPLY a near-dup pair list: survivors = every row whose id never
    * appears as the LARGER member of a pair — the standard greedy
    * smaller-id-wins drop. Greedy, not transitive-closure: in a chain
    * a~b~c (a<b<c) where a̸~c, both b and c drop because each pairs
    * with a smaller survivor-or-dropped id; exact connected-component
    * dedup needs an iterative closure whose cost is unbounded on
    * adversarial chains, and greedy is the accepted practice in
    * training-data pipelines (deterministic, one anti-join, strictly
    * conservative: it never keeps both sides of a detected pair).
    * `pairs` must carry (id_a, id_b) with id_a < id_b. */
  def dropPairedDuplicates(df: DataFrame, idCol: String,
      pairs: DataFrame): DataFrame =
    df.join(pairs.select(col("id_b").as(idCol)).distinct(),
      Seq(idCol), "left_anti")

  /** End-to-end near-dup DROP over word shingles: [[minhashLshPairs]]
    * then the greedy smaller-id-wins apply. Returns the surviving
    * rows of `df`. */
  def dropNearDuplicates(df: DataFrame, idCol: String, textCol: String,
      shingleLen: Int = 3, numHashes: Int = 32, bands: Int = 8,
      threshold: Double = 0.6, bucketCap: Int = DefaultBucketCap): DataFrame =
    dropPairedDuplicates(df, idCol,
      minhashLshPairs(df, idCol, textCol, shingleLen, numHashes, bands,
        threshold, bucketCap))

  /** CLUSTER-BEST dedup apply: transitive-closure clusters from the
    * pair graph ([[ConnectedComponents.duplicateClusters]]), then ONE
    * survivor per cluster chosen by the caller's `score` — the
    * curation-grade alternative to [[dropPairedDuplicates]]'s greedy
    * min-id rule (a production pipeline keeps the BEST copy of a
    * boilerplate family, not the first-crawled one). Rows absent from
    * the pair graph are singleton clusters and always survive.
    *
    * Returns the winning row per cluster (all `df` columns) plus
    * `cluster_id` (the min member id) and `n_members`. The rank key
    * is (score desc, id asc) — the id tiebreak makes the winner total
    * and engine-portable on equal scores; callers whose score is
    * float-valued should pre-round it (see the d11 gate) so a 1-ulp
    * cross-engine wiggle cannot flip a winner.
    *
    * Scale shape: the cluster map is pair-graph-sized (only docs in
    * ≥1 pair) and attaches by one left join; the survivor choice is
    * one window exchange keyed by cluster_id with WindowGroupLimit
    * capping the per-cluster sort at 1. `n_members` comes from a
    * map-side-combinable aggregate on the same key — deliberately NOT
    * a count-over-window, which would buffer every member of a giant
    * boilerplate cluster in the window operator and defeat the group
    * limit. Nothing corpus-sized broadcasts. */
  def keepBestPerCluster(df: DataFrame, idCol: String, pairs: DataFrame,
      score: Column): DataFrame =
    keepBestWithClusters(df, idCol,
      ConnectedComponents.duplicateClusters(pairs), score)

  /** SOFT dedup (SemDeDup/D4-style): instead of hard-keeping one doc
    * per duplicate cluster ([[keepBestPerCluster]]/[[dropNearDuplicates]]
    * — exemplar CHOICE, mass collapse), every doc keeps a SAMPLING
    * WEIGHT 1/|cluster| (singletons 1) and survives an independent
    * seeded coin at that probability ([[Sampling.weightedKeep]]'s
    * hash discipline) — expected mass exactly one doc per cluster, so
    * duplicated content keeps its natural topical distribution and
    * the weight column composes with the sm-family samplers
    * downstream. `clusters` is a precomputed (id, cluster_id) label
    * map (d9/d12 artifacts — the build-once discipline); ids absent
    * from it are singletons. Output = `df`'s columns + `weight`
    * (1e-9-rounded, the sm9 portability rule).
    *
    * Scale shape: cluster sizes are one combinable count on the
    * pair-graph-sized label map; the weight attaches by one id-keyed
    * join; the coin is a per-row expression. Nothing corpus-sized
    * broadcasts or collects. */
  def softDedupKeep(df: DataFrame, idCol: String, clusters: DataFrame,
      seed: String = ""): DataFrame = {
    val cl = clusters.select(col(clusters.columns(0)).as("__sd_id"),
      col(clusters.columns(1)).as("__sd_c"))
    val sizes = cl.groupBy("__sd_c").agg(count(lit(1)).as("__sd_n"))
    val w = cl.join(sizes, Seq("__sd_c"))
      .select(col("__sd_id"), round(lit(1.0) / col("__sd_n"), 9).as("weight"))
    val joined = df.join(w, col(idCol) === col("__sd_id"), "left")
      .drop("__sd_id")
      .withColumn("weight", coalesce(col("weight"), lit(1.0)))
    Sampling.weightedKeep(joined, idCol, col("weight"), seed)
  }

  /** [[keepBestPerCluster]] consuming a PRECOMPUTED (id, cluster_id)
    * label map — the stored-artifact form a deployment actually runs:
    * the pair mine + CC fixpoint happen once and persist (e.g. via
    * [[ParquetTableStore]]); every curation pass after that attaches
    * the committed labels with one join instead of re-mining (the
    * d10/ss9 build-once discipline — tp6 gates this composition).
    * `clusters`' first two columns must be (id, cluster_id); rows
    * absent from it are singletons and always survive. */
  def keepBestWithClusters(df: DataFrame, idCol: String,
      clusters: DataFrame, score: Column): DataFrame = {
    val cl = clusters.select(
      col(clusters.columns(0)).as("__cc_id"),
      col(clusters.columns(1)).as("__rep"))
    val withCluster = df
      .join(cl, df(idCol) === col("__cc_id"), "left")
      .withColumn("cluster_id", coalesce(col("__rep"), col(idCol)))
      .drop("__cc_id", "__rep")
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(score.desc, col(idCol).asc)
    val winners = withCluster
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
    val sizes = withCluster.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_members"))
    winners.join(sizes, Seq("cluster_id"))
  }

  /** Default per-cell candidate cap for the IVF dedup — same
    * discipline as [[DefaultBucketCap]]: one hot cell (a
    * duplicate-heavy corpus is exactly the dedup use case) must not
    * go quadratic. */
  val DefaultCellCap: Int = 10000

  /** Sentinel for `driverMaxEdges` meaning "derive the bound from
    * the driver's heap" ([[defaultDriverMaxEdges]]). */
  val AutoDriverMaxEdges: Int = -1

  /** Heap-derived default for the adaptive closure bound: how many
    * pair-graph edges the driver may safely collect for the exact
    * union-find path. Budget = 5% of max heap at ~128 bytes per
    * collected edge (a 2-long Row plus union-find map entries),
    * capped at 8M edges (a ~1 GB ceiling even on huge drivers —
    * past that the distributed fixpoint's per-round overhead is
    * amortized anyway). On a 4 GiB driver this resolves to ~1.5M
    * edges; the limit-collect that consults it is bounded by the
    * same number, so the decision itself can never blow the heap. */
  def defaultDriverMaxEdges(): Int = {
    val budget = Runtime.getRuntime.maxMemory() / 20
    math.max(1 << 16, math.min(8L * 1000 * 1000, budget / 128)).toInt
  }

  /** CAP-SATURATION diagnostic: for the block structure `keys` over
    * `df` (LSH band buckets, IVF cells, fuzzy blocks — anything the
    * miners window-cap), one row reporting how many blocks exist, how
    * many are STRICTLY OVER `cap` (an exactly-full block truncated
    * nothing), and the hottest block's population.
    * A bound cap is a silent recall loss — the x30 scale probe
    * measured fixed-knob IVF dropping 2/3 of true pairs exactly this
    * way (PLANS.md round 7) — so deployments should alarm on
    * `n_at_cap > 0` and either raise the knob (more cells/bands) or
    * accept the documented truncation. Cost: one combinable
    * block-keyed aggregation, the same shuffle the miner itself pays.
    *
    * `n_at_cap` counts blocks STRICTLY over the cap: the miners'
    * window rule (`__rn <= cap`) keeps every member of an
    * exactly-full block, so population == cap truncates nothing and
    * must not alarm. On an empty frame the row is (0, 0, null) —
    * max has no identity, but the counts are real zeros. */
  def blockSaturation(df: DataFrame, keys: Seq[String], cap: Int): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("population"))
      .agg(count(lit(1)).as("n_blocks"),
        coalesce(sum(when(col("population") > cap, 1L).otherwise(0L)),
          lit(0L)).as("n_at_cap"),
        max(col("population")).as("max_population"))

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
    * Fully lazy (round 4): the source is re-scanned by the codebook
    * sample, the assignment pass, and the verify join — each a
    * pruned, pushed-down columnar scan, linear at any scale — and the
    * two verify sides share one id-partitioned exchange via the same
    * alias trick as [[lshJaccardPairs]]. The round-3 eager snapshot
    * (localCheckpoint of the whole corpus) was measured 25× slower
    * and pinned corpus-sized blocks past the query's lifetime. */
  def embeddingNearDupPairsIvf(df: DataFrame, idCol: String, vecCol: String,
      numCentroids: Int, probes: Int, threshold: Double,
      cellCap: Int = DefaultCellCap): DataFrame = {
    require(cellCap >= 2, "cellCap must admit at least one pair")
    // repartition(id) barrier, same design as lshJaccardPairs: the
    // assignment pass (n·k cosines) parallelizes independent of input
    // split layout, every consumer shares the one reused exchange,
    // and its id-partitioning is exactly what the verify joins need.
    val v = df.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .repartition(col("id"))
    val assign = Ivf.assignments(v, "id", "vec", numCentroids, probes)
    val capped = capBlocks(assign, Seq("centroid_id"), cellCap)
    val cand = cappedPairs(capped, Seq("centroid_id"))
    val withNorm = v.withColumn("norm",
      sqrt(graft.plans.VectorKernels.dotProduct(col("vec"), col("vec"))))
      .hint("shuffle_hash")
    cand
      .join(withNorm.as("va"), col("id_a") === col("va.id"))
      .join(withNorm.as("vb"), col("id_b") === col("vb.id"))
      .withColumn("cos",
        graft.plans.VectorKernels.dotProduct(col("va.vec"), col("vb.vec")) /
          (col("va.norm") * col("vb.norm")))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }

  /** [[embeddingNearDupPairsIvf]] with the cell count AUTO-SIZED to
    * ~sqrt(n) from one cheap corpus count — the knob rule the scale
    * probes measure (x10 replication: fixed 64 cells 48.4 s vs
    * sqrt(n) cells 19.0 s, because per-cell population — and the
    * quadratic in-cell term — stays FLAT as the corpus grows instead
    * of growing linearly). The count is one columnar-scan job over
    * the id column; at any scale that is noise next to the n·k
    * assignment pass it sizes. Use the explicit-knob variant when the
    * corpus count is already known (don't pay the count twice). */
  def embeddingNearDupPairsIvfAuto(df: DataFrame, idCol: String,
      vecCol: String, probes: Int = 2, threshold: Double = 0.9,
      cellCap: Int = DefaultCellCap): DataFrame = {
    val n = df.select(col(idCol)).count()
    val cells = math.max(16, math.sqrt(n.toDouble).toInt)
    embeddingNearDupPairsIvf(df, idCol, vecCol, numCentroids = cells,
      probes = probes, threshold = threshold, cellCap = cellCap)
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

  /** SEMANTIC dedup (SemDeDup, Abbas et al. 2023): collapse documents
    * whose EMBEDDINGS are near-identical — paraphrases, templated
    * rewrites, machine translations of the same content — down to one
    * representative per semantic cluster. Pipeline: IVF-blocked
    * cosine pair mining ([[embeddingNearDupPairsIvf]]) → exact
    * transitive closure over the pair graph
    * ([[ConnectedComponents.duplicateClusters]]) → the min-id member
    * of every component survives; rows absent from the pair graph are
    * singletons and always survive. Returns (id, cluster_id) for the
    * SURVIVORS only (cluster_id = the component representative = the
    * survivor's own id, kept as an explicit column so consumers can
    * re-attach dropped members' metadata by cluster).
    *
    * Cluster semantics deliberately differ from the greedy pairwise
    * [[dropPairedDuplicates]]: with pairs (1,3),(2,3) the greedy rule
    * keeps {1,2} (only ids seen as id_b drop) while the component
    * {1,2,3} keeps just 1 — SemDeDup's contract is one survivor per
    * semantic equivalence class, which needs the closure.
    *
    * Scale shape: every stage is already 100 TB-disciplined — the
    * miner's quadratic term is bounded per IVF cell (pick
    * numCentroids ~ sqrt(n) or use [[semanticDedupAuto]]), the CC
    * fixpoint is pair-graph-sized with staged O(log n) rounds, and
    * the final survivor selection is one pair-graph-sized left
    * anti-join against the corpus ids (nothing corpus-sized
    * broadcasts or collects). */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
      numCentroids: Int, probes: Int = 2, threshold: Double = 0.9,
      cellCap: Int = DefaultCellCap,
      driverMaxEdges: Int = AutoDriverMaxEdges): DataFrame =
    semanticDedupFromPairs(df, idCol,
      embeddingNearDupPairsIvf(df, idCol, vecCol, numCentroids, probes,
        threshold, cellCap), driverMaxEdges)

  /** [[semanticDedup]] with the IVF cell count auto-sized to ~sqrt(n)
    * — the knob rule the scale probes measured (fixed 64 cells at x30:
    * 16× slower AND silent pair loss once cellCap binds). */
  def semanticDedupAuto(df: DataFrame, idCol: String, vecCol: String,
      probes: Int = 2, threshold: Double = 0.9,
      cellCap: Int = DefaultCellCap,
      driverMaxEdges: Int = AutoDriverMaxEdges): DataFrame =
    semanticDedupFromPairs(df, idCol,
      embeddingNearDupPairsIvfAuto(df, idCol, vecCol, probes, threshold,
        cellCap), driverMaxEdges)

  /** The survivor-selection stage of [[semanticDedup]], reusable over
    * any mined pair set (e.g. a STORED pair artifact — the d10/tp6
    * build-once discipline applies unchanged).
    *
    * `driverMaxEdges` is [[ConnectedComponents.mergeClusters]]'s
    * adaptive escape hatch, applied from-scratch: with a bound > 0, a
    * pair graph at or under it labels via the driver union-find
    * (exact, min-id invariant preserved — the same one limit-collect
    * decides safely), one extra row falls back to the staged
    * distributed fixpoint. The x30 probe measured why the knob
    * matters in the dup-heaviest shape (every vector in a 30-member
    * clique, 870k pairs): the staged fixpoint's per-round overhead
    * dominates there, while the pair graph itself is megabytes.
    *
    * The default ([[AutoDriverMaxEdges]]) SELECTS THE PATH
    * AUTOMATICALLY: the bound resolves to
    * [[defaultDriverMaxEdges]] (a small fixed fraction of driver
    * heap), one limit-collect decides whether the pair graph fits,
    * and a graph one row over the bound falls back to the staged
    * distributed fixpoint unchanged — both paths produce identical
    * labels (min-id invariant; spec-pinned), so the choice is pure
    * plan selection, exactly like AQE picking a broadcast join.
    * Pass 0 to force the distributed fixpoint (the d12 gate's
    * deliberate posture), or an explicit positive bound to override
    * the heuristic. */
  def semanticDedupFromPairs(df: DataFrame, idCol: String,
      pairs: DataFrame, driverMaxEdges: Int = AutoDriverMaxEdges): DataFrame = {
    val p = pairs.select("id_a", "id_b")
    val bound =
      if (driverMaxEdges == AutoDriverMaxEdges) defaultDriverMaxEdges()
      else driverMaxEdges
    val clusters =
      if (bound > 0) {
        val spark = p.sparkSession
        // mergeClusters consults its pair frame several times (the
        // limit-collect decision plus both endpoint-id unions); a
        // LAZY mine would re-run per reference, so stage it to
        // scratch parquet first — the same evaluate-exactly-once
        // contract duplicateClusters applies internally (measured:
        // the unstaged form re-mined 3x, 20 GB of shuffle for a
        // 7 GB job).
        val dir = Scratch.tempDir("graft-semdedup-pairs-")
        p.write.mode("overwrite").parquet(dir)
        val staged = spark.read.parquet(dir)
        val emptyLabels = spark.emptyDataFrame
          .select(lit(0L).as("id"), lit(0L).as("cluster_id")).limit(0)
        ConnectedComponents.mergeClusters(emptyLabels, staged,
          driverMaxEdges = bound)
      } else ConnectedComponents.duplicateClusters(p)
    // survivors: cluster members whose label IS their own id, plus
    // every corpus id absent from the pair graph (singletons). One
    // left join against the pair-graph-sized label map.
    val labels = clusters.select(col("id").as("__cc_id"),
      col("cluster_id").as("__rep"))
    df.select(col(idCol).as("id"))
      .join(labels, col("id") === col("__cc_id"), "left")
      .filter(col("__rep").isNull || col("__rep") === col("id"))
      .select(col("id"), coalesce(col("__rep"), col("id")).as("cluster_id"))
  }

  /** INCREMENTAL semantic-dedup PROBE — the d10 discipline for the
    * embedding family: a new ingest batch probed against a STORED
    * IVF index ([[SimilaritySearch.ivfIndexFrames]], round-tripped
    * through any table store) instead of re-mining the corpus.
    * Assignment happens ONLY for the batch (against the stored
    * k·dim driver codebook); candidates come from joining the stored
    * member list; the exact-cosine verify re-attaches vectors through
    * the pinned SHUFFLE_HASH joins. Nothing corpus-sized is
    * re-assigned, broadcast, or collected. Returns
    * (corpus_id, new_id, cos) at `threshold` — feed
    * [[ConnectedComponents.mergeClusters]] with the stored cluster
    * map to fold the batch in (gate d20 pins incremental ≡
    * from-scratch over the union, the d12 identity). */
  def incrementalSemanticPairs(batch: DataFrame, idCol: String,
      vecCol: String, codebookDf: DataFrame, members: DataFrame,
      corpus: DataFrame, probes: Int = 2,
      threshold: Double = 0.9): DataFrame = {
    val codebook: Ivf.Codebook = codebookDf
      .select(col("cid"), col("cvec"))
      .orderBy("cid").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Number](1).map(_.doubleValue()).toIndexedSeq))
      .toIndexedSeq
    val batchAssign = Ivf.assignmentsWithCodebook(batch, idCol, vecCol,
      codebook, probes)
      .select(col("id").as("new_id"), col("centroid_id"))
    val cand = batchAssign
      .join(members.select(col("centroid_id"), col("neighbor_id")),
        Seq("centroid_id"))
      .filter(col("new_id") =!= col("neighbor_id"))
      .select(col("neighbor_id").as("corpus_id"), col("new_id"))
      .distinct()
    val cv = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("__cv"))
      .withColumn("__cn",
        sqrt(graft.plans.VectorKernels.dotProduct(col("__cv"), col("__cv"))))
      .hint("shuffle_hash")
    val bv = batch.select(col(idCol).as("new_id"), col(vecCol).as("__bv"))
      .withColumn("__bn",
        sqrt(graft.plans.VectorKernels.dotProduct(col("__bv"), col("__bv"))))
      .hint("shuffle_hash")
    cand
      .join(cv, Seq("corpus_id"))
      .join(bv, Seq("new_id"))
      .withColumn("cos",
        graft.plans.VectorKernels.dotProduct(col("__cv"), col("__bv")) /
          (col("__cn") * col("__bn")))
      .filter(col("cos") >= threshold)
      .select("corpus_id", "new_id", "cos")
  }

  /** REPEATED n-GRAM AUDIT (the Lee et al. 2021 exact-substring
    * memorization signal): every length-`n` token window occurring in
    * at least `minDocs` DISTINCT documents, with its document and
    * occurrence counts — the spans a decontamination or
    * memorization-risk review reads before choosing what to cut.
    *
    * Scale shape: the window explode rides the scan
    * (sliding-window `transform`); ONE gram-keyed combinable
    * aggregation does everything (count_distinct partials for
    * n_docs, plain count for n_occ); the ≥ minDocs filter drops the
    * singleton long tail — which is almost all of the gram mass —
    * before any downstream consumer.
    *
    * The DEFAULT exchange key is `portableHash64(gram)` (8 bytes),
    * carrying one exemplar text per group via `min(gram)` — at corpus
    * scale the variable-length 12-gram text (~100 bytes) must not be
    * the thing hundreds of terabytes of window mass hash, sort, and
    * spill on. The output is identical to the exact-text key unless
    * two distinct grams collide in the 60-bit hash (then their counts
    * merge under the min exemplar — the standard accepted
    * approximation; birthday bound ~10⁻⁹ at a billion distinct
    * grams). `hashedKey = false` keeps the exact-text exchange as the
    * oracle twin — same discipline as pqEncodeExpr/pqEncodeUnrolled.
    */
  /** APPLY the repeated-span signal: CUT every duplicated length-`n`
    * token window from the corpus, keeping only its globally-first
    * occurrence — the exact-substring deduplication step (Lee et al.
    * 2021) that [[repeatedNgramSpans]] only audits. A window is
    * duplicated when it occurs ≥ `minOcc` times corpus-wide (within-
    * doc repeats count: a boilerplate block pasted twice into one doc
    * is still memorization mass); the canonical survivor is the
    * (id, pos)-minimum occurrence; every other occurrence's token
    * range [pos, pos+n) is removed, overlapping ranges merging
    * naturally through the per-token mask. Returns
    * (id, text, n_removed) with the surviving tokens re-joined by
    * single spaces (whitespace normalizes — the same contract as
    * [[exactDuplicates]]' fingerprint).
    *
    * Scale shape (the d13 discipline applied end to end): window
    * hashes ride the scan (one kernel pass, `pos` = array index);
    * the duplicate decision is ONE combinable 8-byte-keyed
    * aggregation (min(struct(id,pos)) + count partials — never a
    * window over the gram partition, which would buffer a
    * boilerplate gram's million occurrences); cut positions come
    * back as one hash-keyed join of occurrence-mass rows; the mask
    * is a per-doc HOF (O(tokens·spans_in_doc), bounded by doc
    * length, zero extra exchange). Gram text never shuffles — only
    * 60-bit hashes and integer positions (a collision merges two
    * windows' dedup classes: the documented d13 approximation).
    * Docs shorter than `n` tokens pass through (normalized). */
  def cutRepeatedNgramSpans(df: DataFrame, idCol: String, textCol: String,
      n: Int, minOcc: Int = 2): DataFrame = {
    require(n >= 2 && minOcc >= 2, s"need n >= 2, minOcc >= 2; got $n/$minOcc")
    // Two token arrays per doc: the original (reconstruction) and the
    // lowercased (matching, d13's gram semantics). Lowercasing the RAW
    // STRING once is deliberate — `transform(__toks, lower)` inlined
    // into the shingle HOF re-lowercases the whole array inside the
    // per-window slice lambda (CollapseProject re-inlines the alias),
    // turning the window pass O(L²) per doc (measured ~2x the whole
    // operator at sf0.1). Whitespace is case-invariant, so the arrays
    // align index-for-index.
    val toks = df.select(col(idCol).as("id"),
      tokens(col(textCol)).as("__toks"),
      tokens(lower(col(textCol))).as("__lc"))
    // positional windows (NOT hashedWordShingles — that kernel emits
    // the sorted DISTINCT set for LSH signatures; here pos must map
    // back to the token index). The gram text exists only between
    // the shingle HOF and the per-row hash — it never shuffles. The
    // repartition(gh) barrier is the lshJaccardPairs discipline: the
    // duplicate-decision aggregation AND the occurrence join both
    // need a gh exchange, and above the shared barrier the expensive
    // tokenize+shingle+hash pass evaluates ONCE (ReuseExchange; the
    // isNotNull pre-filter keeps both consumers' scan subtrees
    // canonically identical — the outer-join side would otherwise
    // infer a join-key null filter the aggregation side lacks).
    val occ = toks
      .filter(col("id").isNotNull)
      .select(col("id"), posexplode(wordShingles(col("__lc"), n)))
      .select(col("id"), col("pos"), portableHash64(col("col")).as("gh"))
      .repartition(col("gh"))
    val rep = occ.groupBy("gh")
      .agg(min(struct(col("id"), col("pos"))).as("first_occ"),
        count(lit(1)).as("n_occ"))
      .filter(col("n_occ") >= minOcc)
    val cuts = occ.join(rep.hint("shuffle_hash"), Seq("gh"))
      .filter(!(col("id") === col("first_occ.id") &&
        col("pos") === col("first_occ.pos")))
      .groupBy("id")
      .agg(sort_array(collect_list(col("pos"))).as("__ss"))
    // cuts is cut-doc-count-sized (corpus-order worst case) — the
    // attach must never broadcast; SHUFFLE_HASH keys both sides by id
    toks.join(cuts.hint("shuffle_hash"), Seq("id"), "left")
      .withColumn("__ss", coalesce(col("__ss"),
        lit(Array.empty[Int]).cast("array<int>")))
      .withColumn("__kept", expr(
        s"filter(__toks, (tk, i) -> NOT exists(__ss, s -> s <= i AND i < s + $n))"))
      .select(col("id"),
        concat_ws(" ", col("__kept")).as("text"),
        (size(col("__toks")) - size(col("__kept"))).as("n_removed"))
  }

  def repeatedNgramSpans(df: DataFrame, idCol: String, textCol: String,
      n: Int, minDocs: Int, hashedKey: Boolean = true): DataFrame = {
    require(n >= 2 && minDocs >= 2, s"need n >= 2, minDocs >= 2; got $n/$minDocs")
    // shingle+hash is the op's CPU mass — [[Par.fanOut]] (integer
    // counts and min(struct) below: partitioning-independent)
    val grams = Par.fanOut(df).select(col(idCol).as("id"),
      explode(wordShingles(tokens(lower(col(textCol))), n)).as("gram"))
    if (hashedKey)
      grams
        .select(col("id"), portableHash64(col("gram")).as("__gk"), col("gram"))
        .groupBy("__gk")
        .agg(min(col("gram")).as("gram"),
          countDistinct(col("id")).as("n_docs"), count(lit(1)).as("n_occ"))
        .filter(col("n_docs") >= minDocs)
        .select("gram", "n_docs", "n_occ")
    else
      grams
        .groupBy("gram")
        .agg(countDistinct(col("id")).as("n_docs"), count(lit(1)).as("n_occ"))
        .filter(col("n_docs") >= minDocs)
  }
}
