package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the pre-training hygiene step that
  * finds (and drops) training documents overlapping an evaluation
  * set, by shared word n-grams (the standard n-gram–overlap
  * definition; n defaults to 8, the common contamination window).
  *
  * Scale shape (the reason this is cheap at 100 TB): the benchmark
  * side is SMALL BY CONTRACT (an eval suite is thousands of docs, not
  * billions), so its distinct gram-hash table broadcasts; the corpus
  * side is one scan → native shingle-hash kernel → explode → codegen
  * broadcast-hash-join, meaning corpus text is never shuffled and
  * only MATCHED gram rows (≈ the contamination mass, tiny for a clean
  * corpus) reach the (doc, bench) aggregation. The apply step is one
  * ids-only anti-join, like the near-dup drop.
  *
  * Recall contract of the fuzzy pass: a decontamination MISS is the
  * one failure mode the pass must not have, so the fuzzy band
  * geometry defaults to [[Dedup.recallBandGeometry]] — derived from
  * the threshold to guarantee ≥ 0.9 candidate recall AT the
  * threshold (and higher above it), not from a fixed knob pair.
  * Explicit (numHashes, bands) remain for oracle pins at a fixed
  * geometry; a caller pinning its own knobs owns the recall math
  * 1-(1-t^r)^b.
  *
  * Hashing is the portable 60-bit md5 prefix
  * ([[graft.plans.HashKernels]]), so the DuckDB oracle replicates the
  * whole pipeline bit-for-bit (gate dc1/dc2). Overlap counts DISTINCT
  * shared grams (a doc repeating one benchmark phrase k times is one
  * shared gram, not k).
  */
object Decontamination {

  /** The distinct (bench_id, g) gram table of a benchmark frame —
    * the exchangeable form every exact path here joins on. */
  private def benchGrams(bench: DataFrame, benchId: String,
      benchText: String, n: Int): DataFrame = bench
    .select(col(benchId).as("bench_id"),
      explode(graft.plans.HashKernels.hashedWordShingles(col(benchText), n))
        .as("g"))
    .distinct()

  /** The shared pair aggregation: corpus grams broadcast-joined
    * against an (eval-suite-sized) benchmark gram table. */
  private def pairsAgainstGrams(docs: DataFrame, docId: String,
      docText: String, bg: DataFrame, n: Int,
      minShared: Int): DataFrame = {
    require(n >= 1, "n-gram size must be >= 1")
    require(minShared >= 1, "minShared must be >= 1")
    val dg = docs
      .select(col(docId).as("doc_id"),
        explode(graft.plans.HashKernels.hashedWordShingles(col(docText), n))
          .as("g"))
    dg.join(broadcast(bg), Seq("g"))
      .groupBy("doc_id", "bench_id")
      .agg(countDistinct(col("g")).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** (doc_id, bench_id, n_shared) for every pair sharing at least
    * `minShared` distinct word `n`-grams. `bench` must be small
    * enough to broadcast (eval-suite sized) — its grams are collected
    * to a broadcast hash table, which is what keeps the corpus side
    * shuffle-free. */
  def contaminationPairs(docs: DataFrame, docId: String, docText: String,
      bench: DataFrame, benchId: String, benchText: String,
      n: Int = 8, minShared: Int = 2): DataFrame =
    pairsAgainstGrams(docs, docId, docText,
      benchGrams(bench, benchId, benchText, n), n, minShared)

  /** STORED benchmark-gram index — the production screening shape:
    * eval suites are added occasionally and SCREENED AGAINST
    * constantly, so the gram table (distinct (bench_id, g) — eval-
    * suite-sized by the dc1 contract, thousands of rows per suite)
    * lives in the store and arriving corpus batches probe it without
    * ever re-shingling a benchmark. Upserting is keyed on
    * (bench_id, g): registering the same suite twice (or replaying a
    * crashed registration) replaces its own rows — idempotent; new
    * suites land additively. One store round-trip per REGISTRATION,
    * zero benchmark work per probe. */
  def indexBenchmarks(bench: DataFrame, benchId: String,
      benchText: String, store: ParquetTableStore,
      gramsTable: String = "decontam_grams", n: Int = 8): Unit = {
    require(n >= 1, "n-gram size must be >= 1")
    val spark = bench.sparkSession
    // the gram WIDTH is baked into the stored hashes: a probe (or a
    // later registration) with a different n would join nothing and
    // silently pass contaminated docs — record n on every row and
    // refuse a mismatch loudly (the one failure mode a
    // decontamination pass must not have). Registration tolerates an
    // EMPTY stored table (re-registering is the repair for one).
    checkStoredN(spark, store, gramsTable, n, "indexBenchmarks",
      allowEmpty = true)
    val bg = benchGrams(bench, benchId, benchText, n)
      .withColumn("n", lit(n))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // a registration that yields ZERO grams (every bench text
      // shorter than n tokens) would create/keep an index that
      // matches nothing while probes against it silently pass —
      // refuse loudly; the frame is eval-suite-sized by contract
      if (bg.limit(1).count() == 0)
        throw new IllegalArgumentException(
          s"indexBenchmarks: the registration produced no $n-grams " +
            "(every benchmark text is shorter than n tokens) — an " +
            "index that matches nothing would silently pass every " +
            "probe; shorten n or fix the benchmark frame")
      store.withCommitRetries()(
        store.upsert(spark, gramsTable, bg, Seq("bench_id", "g")))
      ()
    } finally bg.unpersist(blocking = false)
  }

  private def checkStoredN(spark: org.apache.spark.sql.SparkSession,
      store: ParquetTableStore, gramsTable: String, n: Int,
      who: String, allowEmpty: Boolean = false): Unit =
    if (store.exists(gramsTable)) {
      val stored = store.read(spark, gramsTable)
      // legacy width-less tables can't be validated — refuse those too
      // rather than guess (re-register to upgrade)
      if (!stored.columns.contains("n"))
        throw new IllegalStateException(
          s"$who: $gramsTable predates width recording — re-register " +
            "the benchmark suites to upgrade it")
      // the DISTINCT stored widths (the table is eval-suite-sized by
      // contract): a limit(1) sample would silently PASS an empty
      // table — the exact silent-pass mode this check exists to refuse
      val ns = stored.select(col("n")).distinct().collect()
        .map(_.getInt(0)).sorted
      if (ns.isEmpty && !allowEmpty)
        throw new IllegalStateException(
          s"$who: $gramsTable exists but is EMPTY — an index that " +
            "matches nothing would silently pass every probe; " +
            "re-register the benchmark suites")
      if (ns.length > 1)
        throw new IllegalStateException(
          s"$who: $gramsTable carries mixed widths ${ns.mkString(",")}" +
            " — re-register the benchmark suites to rebuild it")
      ns.headOption.foreach { stored_n =>
        if (stored_n != n)
          throw new IllegalArgumentException(
            s"$who: $gramsTable was built with n=$stored_n but " +
              s"n=$n was requested — a mismatched width would match " +
              "nothing and silently pass contaminated docs")
      }
    }

  /** Probe a corpus frame against the STORED benchmark-gram index
    * ([[indexBenchmarks]]) — [[contaminationPairs]] with the bench
    * side read back instead of re-shingled. The stored table is
    * eval-suite-sized, so it broadcasts exactly as the one-shot
    * path's gram frame does; the corpus side stays one scan, no
    * shuffle of text. Gate dc4 pins build+append+probe ≡ the
    * one-shot pairs over everything registered. */
  def probeStoredContamination(docs: DataFrame, docId: String,
      docText: String, store: ParquetTableStore,
      gramsTable: String = "decontam_grams", n: Int = 8,
      minShared: Int = 2): DataFrame = {
    val spark = docs.sparkSession
    checkStoredN(spark, store, gramsTable, n, "probeStoredContamination")
    pairsAgainstGrams(docs, docId, docText,
      store.read(spark, gramsTable).select("bench_id", "g"), n, minShared)
  }

  /** The apply step: training rows NOT contaminated by any benchmark
    * doc (one ids-only anti-join over the pair list). */
  def dropContaminated(docs: DataFrame, docId: String, docText: String,
      bench: DataFrame, benchId: String, benchText: String,
      n: Int = 8, minShared: Int = 2): DataFrame =
    docs.join(
      contaminationPairs(docs, docId, docText, bench, benchId, benchText,
        n, minShared)
        .select(col("doc_id").as(docId)).distinct(),
      Seq(docId), "left_anti")

  /** FUZZY decontamination: training docs whose MinHash-LSH Jaccard
    * similarity to an eval doc reaches `threshold` — the paraphrase
    * net behind [[contaminationPairs]]'s exact window: a leak that
    * rewords every 8th token shares NO exact 8-gram but still sits at
    * high shingle Jaccard, and n-gram-overlap decontamination
    * (dc1/dc2) misses it entirely.
    *
    * Scale shape — the dc1 asymmetry carried into the LSH machinery
    * ([[Dedup.incrementalLshPairsFromSigs]] with the SIDES CHOSEN so
    * the small side broadcasts): the corpus is signatured in ONE text
    * pass and its band table probed at scan rate by the BENCH's
    * broadcast band keys; candidates (≈ the contamination mass)
    * broadcast back into one scan-rate pass over the corpus
    * signatures; only candidate-mass-sized data ever exchanges. The
    * corpus band table is deliberately UNCAPPED — a capped index
    * here would silently KEEP contaminated docs, the one failure
    * mode a decontamination pass must not have (audit hot bands with
    * [[Dedup.blockSaturation]] instead).
    *
    * Band geometry: `numHashes`/`bands` ≤ 0 (the default) derives a
    * recall-first geometry from `threshold` via
    * [[Dedup.recallBandGeometry]] — candidate recall ≥ 0.9 at the
    * threshold by construction (at the default t=0.5: 37 bands of 4,
    * recall 0.91, vs 0.40 for the historical fixed (32, 8)). Pass
    * both knobs explicitly to pin a fixed geometry (the oracle-gate
    * form); passing only one is a contract error. */
  def fuzzyContaminationPairs(docs: DataFrame, docId: String,
      docText: String, bench: DataFrame, benchId: String,
      benchText: String, shingleLen: Int = 3, numHashes: Int = 0,
      bands: Int = 0, threshold: Double = 0.5): DataFrame = {
    require((numHashes > 0) == (bands > 0),
      "pin numHashes and bands together, or neither (auto geometry)")
    val (nh, b) =
      if (numHashes > 0) (numHashes, bands)
      else Dedup.recallBandGeometry(threshold)
    val dsigs = Dedup.lshSignatures(docs, docId, docText, shingleLen)
    val dbands = Dedup.lshBandMembership(dsigs, nh, b)
    val bsigs = Dedup.lshSignatures(bench, benchId, benchText, shingleLen)
    // doc ids and bench ids are UNRELATED namespaces (both typically
    // number 0..N): an equal id is a coincidence, not a self-pair —
    // the d10-style self-pair skip would silently KEEP a contaminated
    // doc whose id happens to collide with its bench twin's
    Dedup.incrementalLshPairsFromSigs(bsigs, dbands, dsigs,
      nh, b, threshold, excludeSelfPairs = false)
      .select(col("corpus_id").as("doc_id"), col("new_id").as("bench_id"),
        col("jaccard"))
  }

  /** The fuzzy apply step: training rows below `threshold` Jaccard
    * against every benchmark doc (ids-only anti-join, like
    * [[dropContaminated]]). Geometry defaults follow
    * [[fuzzyContaminationPairs]] (recall-first from the threshold). */
  def dropFuzzyContaminated(docs: DataFrame, docId: String,
      docText: String, bench: DataFrame, benchId: String,
      benchText: String, shingleLen: Int = 3, numHashes: Int = 0,
      bands: Int = 0, threshold: Double = 0.5): DataFrame =
    docs.join(
      fuzzyContaminationPairs(docs, docId, docText, bench, benchId,
        benchText, shingleLen, numHashes, bands, threshold)
        .select(col("doc_id").as(docId)).distinct(),
      Seq(docId), "left_anti")
}
