package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Deterministic sampling for training-data pipelines: hash-based
  * train/test splits and per-stratum fixed-size samples.
  *
  * Randomness comes from the portable 60-bit md5-prefix hash
  * ([[TextFunctions.portableHash64]]) over the row KEY — never from
  * rand(): the split is (1) reproducible across runs, engines, and
  * cluster sizes, (2) stable under corpus growth (a row's assignment
  * never changes when other rows arrive — the property that keeps a
  * held-out set held out across dataset versions), and (3) verifiable
  * by the DuckDB oracle, which computes the identical md5 arithmetic.
  *
  * Scale shape: [[hashSplit]] is a pure per-row column expression —
  * one scan, zero shuffle, works at any corpus size. A salt string
  * decorrelates independent splits of the same keys (split on
  * "holdout-v2:" + id without re-dealing "holdout-v1:").
  */
object Sampling {

  /** The split bucket in [0, 100): portable hash of (salt + key). */
  def splitBucket(key: Column, salt: String): Column =
    pmod(TextFunctions.portableHash64(
      concat(lit(salt), key.cast("string"))), lit(100L))

  /** Adds `split` = "train"/"test": train iff bucket < trainPct.
    * Deterministic per key — re-running, re-partitioning, or growing
    * the corpus never reassigns a row. */
  def hashSplit(df: DataFrame, keyCol: String, trainPct: Int,
      salt: String = ""): DataFrame = {
    require(trainPct >= 0 && trainPct <= 100)
    df.withColumn("split",
      when(splitBucket(col(keyCol), salt) < trainPct, "train")
        .otherwise("test"))
  }

  /** At most `n` rows per stratum, chosen by hash order (a
    * deterministic uniform draw, tie-broken by the key): one
    * (stratum) exchange; WindowGroupLimit pushes the cap below the
    * full per-stratum sort, so a giant stratum never fully sorts. */
  def stratifiedSample(df: DataFrame, strataCol: String, keyCol: String,
      n: Int, salt: String = ""): DataFrame = {
    require(n >= 1)
    val w = Window.partitionBy(col(strataCol))
      .orderBy(splitBucket(col(keyCol), salt).asc, col(keyCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }

  /** Deterministic DATA MIXING: keep a row iff its hash bucket falls
    * under its stratum's sampling percentage, with the mixture given
    * as a TABLE (stratum → pct in [0, 100]) — the way a pretraining
    * pipeline states a domain mix ("web 30%, code 100%, forums 10%").
    *
    * Scale shape: the mixture table is tiny by nature and broadcasts;
    * the keep/drop decision is then a pure per-row expression — ZERO
    * shuffle, zero sort, scan-rate at any corpus size (contrast
    * [[stratifiedSample]], whose exact-count contract needs the
    * stratum exchange). Same hash discipline as [[hashSplit]]:
    * reproducible across runs/engines/cluster sizes, stable under
    * corpus growth, salt-decorrelated from other draws on the same
    * keys. Strata absent from the mixture table are DROPPED (an
    * unlisted domain is an unsampled domain — the conservative
    * default for a curated mix). */
  def mixByHash(df: DataFrame, strataCol: String, keyCol: String,
      mix: DataFrame, mixStrataCol: String, pctCol: String,
      salt: String = ""): DataFrame =
    df.join(
        broadcast(mix.select(col(mixStrataCol).as(strataCol),
          col(pctCol).cast("long").as("__pct"))),
        Seq(strataCol))
      .filter(splitBucket(col(keyCol), salt) < col("__pct"))
      .drop("__pct")

  /** Deterministic GLOBAL SHUFFLE: a total order by the portable
    * hash of (seed ":" key) — the pre-training permutation that
    * decorrelates document order from crawl/ingest order, identically
    * on every engine, every cluster size, every re-run of the same
    * seed. Changing the seed re-deals the entire permutation
    * (epoch-wise re-shuffling without materializing anything).
    *
    * Scale shape: ONE range-partitioned sort on a uniform 60-bit
    * key — the sampler sees an even key distribution by construction,
    * so no skewed sort partition exists; downstream writers emit
    * shard files in permuted order directly. The hash tie-breaks on
    * the key itself, so the order is total and reproducible. */
  def seededShuffle(df: DataFrame, keyCol: String, seed: String): DataFrame =
    df.withColumn("shuffle_key",
        TextFunctions.portableHash64(
          concat(lit(seed + ":"), col(keyCol).cast("string"))))
      .orderBy(col("shuffle_key").asc, col(keyCol).asc)

  /** TEMPERATURE-SAMPLED mixture weights: per-stratum sampling
    * weight ∝ count^(1/tau), normalized over strata — the
    * multilingual / multi-domain rebalancing rule (tau = 1 reproduces
    * natural proportions, tau → ∞ approaches uniform; pretraining
    * mixes typically run 1 < tau ≤ 5 to lift low-resource strata
    * without drowning the head). One row per stratum:
    * (stratum, n_docs, weight).
    *
    * Determinism: counts are exact; the root is one per-stratum pow;
    * the normalizing total is an ORDERED running sum over strata
    * (stratum-name order, ROWS UNBOUNDED PRECEDING) whose final value
    * feeds every row — the same cross-row fold discipline as the ss6
    * vector aggregate, replicated bit-for-bit by an oracle (an
    * unordered double sum is engine- and partitioning-dependent).
    *
    * Scale shape: one map-side-combinable count aggregation reduces
    * the corpus to #strata rows; the ordered fold and the global max
    * then run on that tiny frame (the single-partition window is by
    * construction bounded — a mixture over millions of strata is not
    * a mixture). */
  def temperatureWeights(df: DataFrame, strataCol: String,
      tau: Double): DataFrame = {
    require(tau > 0, s"tau must be positive, got $tau")
    val wRun = Window.orderBy(col(strataCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
    df.groupBy(col(strataCol)).agg(count(lit(1)).as("n_docs"))
      .withColumn("__root",
        pow(col("n_docs").cast("double"), lit(1.0 / tau)))
      .withColumn("__run", sum(col("__root")).over(wRun))
      .withColumn("weight", col("__root") / max(col("__run")).over(wAll))
      .drop("__root", "__run")
  }

  /** TEMPERATURE-BALANCED mixture MATERIALIZATION: the composition a
    * pretraining pipeline actually runs — [[temperatureWeights]]
    * turned into per-stratum keep rates and applied as the
    * [[mixByHash]]-style per-row hash draw, in BASIS POINTS
    * (0..10000, [[weightedKeep]]'s resolution — integer-percent
    * quantization dropped any stratum whose target share rounded
    * below 0.5% of its size and missed targetRows by up to ~0.5% of
    * the corpus). Each stratum's target share of `targetRows` is
    * weight·targetRows documents; its keep rate is
    * round(10000 · weight · targetRows / n_s), capped at 10000 (a
    * tail stratum asked for more than it has keeps everything —
    * temperature sampling can only lift a low-resource stratum to
    * full representation, it cannot invent documents; deployments
    * compensate with epoch repetition, which is [[seededShuffle]]'s
    * job).
    *
    * The rate derives from the 1e-9-rounded weight so the derivation
    * is engine-portable (same discipline as the sm6 gate).
    *
    * Scale shape: the weights frame is #strata rows and broadcasts;
    * the draw itself is a pure per-row hash predicate — ZERO corpus
    * shuffle at any size. */
  def temperatureMix(df: DataFrame, strataCol: String, keyCol: String,
      tau: Double, targetRows: Long, salt: String = ""): DataFrame = {
    require(targetRows > 0, s"targetRows must be positive, got $targetRows")
    val mix = temperatureWeights(df, strataCol, tau)
      .select(col(strataCol),
        least(lit(10000L),
          round(round(col("weight"), 9) * (targetRows * 10000.0) /
            col("n_docs").cast("double"))
            .cast("long")).as("__mix_bps"))
    df.join(broadcast(mix), Seq(strataCol))
      .filter(pmod(TextFunctions.portableHash64(
        concat(lit(salt), col(keyCol).cast("string"))), lit(10000L)) <
        col("__mix_bps"))
      .drop("__mix_bps")
  }

  /** Per-ROW importance-weighted keep: a row survives iff its hash
    * bucket (0..9999) falls under round(weight · 10000) —
    * [[mixByHash]] generalized from per-stratum percentages to a
    * per-row `weight` column in [0, 1] ("keep each document with
    * probability equal to its quality score", the soft alternative to
    * a hard threshold). Same hash discipline as every sampler here:
    * reproducible across runs/engines/cluster sizes, stable under
    * corpus growth, salt-decorrelated.
    *
    * Callers whose weight is float-valued should pre-round it (the
    * sm9 gate rounds at 1e-9) so the bucket comparison is
    * engine-portable.
    *
    * Scale shape: pure per-row expressions — one scan, ZERO shuffle,
    * scan-rate at any corpus size. */
  def weightedKeep(df: DataFrame, keyCol: String, weight: Column,
      salt: String = ""): DataFrame =
    df.filter(
      pmod(TextFunctions.portableHash64(
        concat(lit(salt), col(keyCol).cast("string"))), lit(10000L)) <
        round(weight * 10000.0).cast("long"))

  /** PER-DOMAIN CAP as a probabilistic keep — the C4/RefinedWeb
    * domain-curation APPLY step: no domain may contribute more than
    * ~`maxDocsPerDomain` documents in expectation, so boilerplate
    * mills (one domain holding a third of the crawl) are downsampled
    * while the long tail passes untouched. Each doc keeps with
    * probability min(1, cap / n_docs(domain)) through the
    * [[weightedKeep]] hash discipline — reproducible across
    * runs/engines/cluster sizes, stable under corpus growth (a
    * domain crossing the cap fades proportionally, no cliff).
    * The weight is 1e-9-rounded (the sm9 portability rule).
    *
    * Docs with NO domain (null or empty `domainCol` — e.g. a corpus
    * row without a URL) are NOT a domain: they pass through
    * untouched rather than being dropped by a null-key join or
    * lumped into one "" pseudo-domain that the cap would then
    * downsample like a boilerplate mill.
    *
    * Scale shape: one domain-keyed combinable count-distinct
    * (domain-cardinality-sized result), broadcast back, then the
    * per-row keep predicate — the corpus itself never shuffles. */
  def domainCappedKeep(df: DataFrame, keyCol: String, domainCol: String,
      maxDocsPerDomain: Long, salt: String = ""): DataFrame = {
    require(maxDocsPerDomain >= 1,
      s"maxDocsPerDomain must be positive, got $maxDocsPerDomain")
    val domainless = col(domainCol).isNull || col(domainCol) === ""
    val domained = df.filter(!domainless)
    val nd = domained.groupBy(col(domainCol))
      .agg(countDistinct(col(keyCol)).as("__nd"))
    val w = least(lit(1.0),
      round(lit(maxDocsPerDomain.toDouble) / col("__nd").cast("double"), 9))
    weightedKeep(domained.join(broadcast(nd), Seq(domainCol)), keyCol, w, salt)
      .drop("__nd")
      .unionByName(df.filter(domainless))
  }

  /** Deterministic GLOBAL k-sample: the k rows with the smallest
    * portable hash of (salt + key) — a reproducible uniform draw
    * ("pull 100 random docs for QA") that never globally sorts.
    * Returns the sample with its `draw` key (the re-derivable
    * evidence of membership).
    *
    * Scale shape: orderBy+limit plans as TakeOrderedAndProject —
    * each partition keeps a k-row heap, the driver merges #partitions
    * heaps; NO exchange, no global sort (contrast [[seededShuffle]],
    * which materializes the full permutation because its contract is
    * the order itself). k is driver-merged so this is for
    * QA/debug-sized samples, not sub-corpus extraction — use
    * [[mixByHash]] or [[hashSplit]] for those. */
  def hashTopKSample(df: DataFrame, keyCol: String, k: Int,
      salt: String = ""): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    df.withColumn("draw",
        TextFunctions.portableHash64(
          concat(lit(salt), col(keyCol).cast("string"))))
      .orderBy(col("draw").asc, col(keyCol).asc)
      .limit(k)
  }

  /** GUMBEL-TOP-K weighted sampling WITHOUT replacement: draw `k`
    * rows with probability ∝ exp(weight/tau) — exactly the
    * importance-RESAMPLING stage the DSIR paper pairs with its
    * log-ratio weights (Xie et al. 2023 §2; a plain top-k keeps only
    * the head and collapses diversity). The Gumbel-top-k identity
    * (Vieira 2014; Kool et al. 2019): argtop-k(weight/tau + g_i) with
    * g_i = −ln(−ln u_i) IS a without-replacement sample from the
    * softmax — one per-row expression plus one global top-k, no
    * sequential draws.
    *
    * Determinism (the sm-family seed rule): u_i derives from the
    * portable hash of (seed : key) — (h mod 10^6 + 0.5) / 10^6, never
    * rand() — so the same seed re-draws the same sample on any
    * engine, partitioning, or corpus growth that keeps the key. The
    * per-row key is ROUNDED to 6 dp before the top-k and ties break
    * on the row key (the tp5 boundary discipline: membership can't
    * flip on an engine ulp). Survivors carry `gumbel_key_r` for
    * downstream accounting.
    *
    * Scale shape: a pure per-row expression then a global top-k —
    * TakeOrdered (per-partition heads + driver merge of k·P rows),
    * no full sort, no corpus-sized anything. */
  def gumbelTopK(df: DataFrame, keyCol: String, weightCol: String,
      k: Int, tau: Double = 1.0, seed: String = ""): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    require(tau > 0, s"tau must be positive, got $tau")
    val u = (pmod(TextFunctions.portableHash64(
        concat(lit(seed + ":"), col(keyCol).cast("string"))),
      lit(1000000L)).cast("double") + lit(0.5)) / lit(1000000.0)
    df.withColumn("gumbel_key_r",
        round(col(weightCol) / lit(tau) - log(-log(u)), 6))
      .orderBy(col("gumbel_key_r").desc, col(keyCol).asc)
      .limit(k)
  }

  /** TOKEN-BUDGETED per-stratum cap: keep rows in the caller's
    * preference `order` until the stratum's cumulative token count
    * reaches `budget`. Mixtures are specified in TOKENS, not rows
    * ("50 B tokens of web, 5 B of forums") — a row-count cap
    * ([[stratifiedSample]]) over-serves short-document domains. A row
    * survives iff it STARTS within budget (its running sum minus its
    * own tokens < budget): the first over-budget doc is kept, so the
    * budget overshoots by at most one document and never undershoots
    * — and every non-empty stratum keeps at least its best row.
    * Survivors carry `cum_tokens` (their running total, in preference
    * order) for downstream accounting.
    *
    * Determinism: token counts are integers, so the running sum needs
    * no float fold discipline; callers whose `order` includes a
    * float score should pre-round it and tie-break on the key.
    *
    * Scale shape: one (stratum) exchange + per-stratum sort — the
    * sort is inherent (the operator's contract is "best docs first
    * within budget"), parallel across strata, and the running sum
    * streams in sort order with O(1) state. No corpus-sized broadcast
    * or driver collection. */
  def tokenBudgetCap(df: DataFrame, strataCol: String, tokensCol: Column,
      budget: Long, order: Seq[Column]): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val w = Window.partitionBy(col(strataCol)).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cum_tokens", sum(tokensCol.cast("long")).over(w))
      .filter(col("cum_tokens") - tokensCol.cast("long") < budget)
  }

  /** LEAKAGE-SAFE train/test split: hash assignment on the doc's
    * duplicate-CLUSTER representative, not the doc itself — every
    * member of a near-dup cluster lands on the same side, so a test
    * doc can never have a near-copy in train (the eval-contamination
    * mode a plain per-doc split ([[hashSplit]]) cannot prevent).
    *
    * `pairs` is the near-dup pair graph (first two columns = ids, as
    * mined by [[Dedup.minhashLshPairs]] or any of the d-family);
    * representatives are the min-id member of each connected
    * component ([[ConnectedComponents.duplicateClusters]], O(log n)
    * rounds). Docs in no pair are singleton clusters (their own
    * representative), so with an empty pair set this IS hashSplit —
    * the split stays growth-stable and salted exactly like sm1.
    *
    * Scale shape: the cluster map is pair-graph-sized (only docs
    * that appear in some pair), typically a small fraction of the
    * corpus; attaching it is one left join keyed by id — AQE
    * broadcasts it when small, shuffles both sides when not. The
    * assignment itself stays a pure per-row expression. */
  def leakageSafeSplit(df: DataFrame, keyCol: String, pairs: DataFrame,
      trainPct: Int, salt: String = ""): DataFrame =
    leakageSafeSplitWithClusters(df, keyCol,
      ConnectedComponents.duplicateClusters(pairs), trainPct, salt)

  /** [[leakageSafeSplit]] consuming a PRECOMPUTED (id, cluster_id)
    * label map — the stored-artifact form (the mine + CC fixpoint
    * persist once, e.g. via [[graft.ops.ParquetTableStore]]; every
    * split after that is one join + a per-row hash — the d10/ss9
    * build-once discipline, gated by tp6). `clusters`' first two
    * columns must be (id, cluster_id); absent ids are singletons. */
  def leakageSafeSplitWithClusters(df: DataFrame, keyCol: String,
      clusters: DataFrame, trainPct: Int, salt: String = ""): DataFrame = {
    require(trainPct >= 0 && trainPct <= 100)
    val cl = clusters.select(
      col(clusters.columns(0)).as("__cc_id"),
      col(clusters.columns(1)).as("__rep"))
    df.join(cl, df(keyCol) === col("__cc_id"), "left")
      .withColumn("split",
        when(splitBucket(coalesce(col("__rep"), col(keyCol)), salt)
          < trainPct, "train").otherwise("test"))
      .drop("__cc_id", "__rep")
  }

  /** TRAINING-SHARD assignment — the export-side last mile: every row
    * gets a `shard` in [0, nShards) and a dense `shard_pos` giving
    * its position in the shard's deterministic pseudo-random order
    * (portable hash of the salted key, ties to the key — the
    * seeded-shuffle discipline of the sm family, now per shard). The
    * whole layout is a pure function of (key, salt, nShards):
    * reproducible across runs, engines, and cluster sizes, and
    * re-exporting after an upstream fix moves only the rows that
    * changed shards. Writing the shards is then one
    * `partitionBy("shard")` sink away; the hash order inside each
    * shard is the within-shard training shuffle, pre-applied.
    *
    * Scale shape: the assignment is a per-row expression; the
    * position is one row_number over a (shard) exchange — a single
    * shuffle whose partition count is the shard count. */
  def shardAssign(df: DataFrame, keyCol: String, nShards: Int,
      salt: String = ""): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val h = TextFunctions.portableHash64(
      concat(lit(salt), col(keyCol).cast("string")))
    val w = Window.partitionBy(col("shard")).orderBy(h.asc, col(keyCol).asc)
    df.withColumn("shard", pmod(h, lit(nShards.toLong)))
      .withColumn("shard_pos", row_number().over(w) - 1)
  }

  /** Per-shard export MANIFEST — what a training job reads before it
    * reads any data: row count, whitespace-token mass, and the first/
    * last keys in the shard's seeded order (the cheap end-to-end
    * checksum: a re-export that changed membership or order moves at
    * least one of them). One (shard) exchange shared with the
    * position window, one combinable rollup. */
  def shardManifest(df: DataFrame, keyCol: String, textCol: String,
      nShards: Int, salt: String = ""): DataFrame = {
    val assigned = shardAssign(df, keyCol, nShards, salt)
    assigned.groupBy("shard").agg(
      count(lit(1)).as("n_docs"),
      sum(graft.ops.TextAnalysis.tokenCountWs(col(textCol))).as("n_tokens"),
      min_by(col(keyCol), col("shard_pos")).as("first_key"),
      max_by(col(keyCol), col("shard_pos")).as("last_key"))
  }

  /** The manifest columns over an ALREADY-ASSIGNED frame (carrying
    * `shard` and `shard_pos`) — shared by the export side (positions
    * just computed) and the read-back side (positions read from the
    * shard files), so the two can only ever disagree when the files
    * disagree. `content_hash` is the integrity column: bit_xor of the
    * portable hash of "pos:key:text" per row — XOR is commutative
    * (partitioning-independent), but the POSITION inside the hashed
    * string makes the checksum order-sensitive (two rows swapping
    * shard_pos flips it), and positions are distinct within a shard
    * so no two identical terms can cancel. */
  private def manifestOf(assigned: DataFrame, keyCol: String,
      textCol: String): DataFrame =
    assigned.groupBy("shard").agg(
      count(lit(1)).as("n_docs"),
      sum(graft.ops.TextAnalysis.tokenCountWs(col(textCol))).as("n_tokens"),
      min_by(col(keyCol), col("shard_pos")).as("first_key"),
      max_by(col(keyCol), col("shard_pos")).as("last_key"),
      // concat, NOT concat_ws: concat_ws silently SKIPS null segments
      // (a null key would hash as "pos:text", weakening the position-
      // prefix distinctness argument); concat nulls the whole term on
      // a null key — exactly the oracle's '||' semantics — and bit_xor
      // ignores the null. Text is the only segment allowed to be null.
      bit_xor(TextFunctions.portableHash64(concat(
        col("shard_pos").cast("string"), lit(":"),
        col(keyCol).cast("string"), lit(":"),
        coalesce(col(textCol), lit(""))))).as("content_hash"))

  /** EXPORT the training shards: rows land under `path`/shards in
    * shard=N partition dirs carrying their `shard_pos` (the
    * within-shard training order, pre-applied — [[shardAssign]]), and
    * the MANIFEST ([[shardManifest]]'s columns plus the order-
    * sensitive `content_hash`) lands next to them under
    * `path`/manifest. The manifest is recomputed from the WRITTEN
    * files, not the input plan — what it certifies is the bytes on
    * disk, so a consumer that trusts the manifest trusts the export.
    * Returns the stored manifest. One (shard) exchange for the data,
    * one combinable rollup over the re-read for the certificate. */
  def exportShards(df: DataFrame, keyCol: String, textCol: String,
      nShards: Int, salt: String, path: String): DataFrame = {
    val spark = df.sparkSession
    shardAssign(df, keyCol, nShards, salt)
      .write.mode("errorifexists").partitionBy("shard")
      .parquet(s"$path/shards")
    val m = manifestOf(
      spark.read.parquet(s"$path/shards")
        .withColumn("shard", col("shard").cast("long")),
      keyCol, textCol)
    m.coalesce(1).write.mode("errorifexists").parquet(s"$path/manifest")
    spark.read.parquet(s"$path/manifest")
  }

  /** READ-BACK INTEGRITY VERIFICATION — the other half of the export
    * contract: a training-data artifact you can't re-verify is half
    * an operator. Recomputes the manifest FROM THE SHARD FILES (count,
    * token mass, order endpoints, order-sensitive content hash) and
    * compares it against the stored manifest, per shard: `verified`
    * is true iff every column matches null-safely. A dropped or
    * edited row, a reordered pair of positions, a missing shard dir,
    * or a manifest row with no shard behind it all surface as
    * verified = false on that shard — nothing is thrown, the caller
    * decides (a loader refuses, an auditor reports).
    *
    * Scale shape: one scan of the shard files into a combinable
    * rollup (nShards rows), one nShards-sized broadcast join — the
    * corpus never shuffles. */
  def verifyShards(spark: org.apache.spark.sql.SparkSession,
      path: String, keyCol: String, textCol: String): DataFrame = {
    val stored = spark.read.parquet(s"$path/manifest")
    val cols = Seq("n_docs", "n_tokens", "first_key", "last_key",
      "content_hash")
    val re = manifestOf(
      spark.read.parquet(s"$path/shards")
        .withColumn("shard", col("shard").cast("long")),
      keyCol, textCol)
      .select(col("shard") +: cols.map(c => col(c).as(s"__r_$c")): _*)
    stored.join(re, Seq("shard"), "full_outer")
      .select(col("shard") +: cols.map(col) :+
        cols.map(c => col(c) <=> col(s"__r_$c")).reduce(_ && _)
          .as("verified"): _*)
  }
}
