package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  *  - [[bruteForceTopK]]: exact cosine top-k — the baseline and the
  *    recall oracle. Cross-join shaped; correct answer, O(|Q|·|C|).
  *    Fine when |Q| is small (the common "query batch" case) because
  *    the candidate side streams through a broadcast of the queries;
  *    never materializes the full product (TakeOrdered per query via
  *    window over rank).
  *  - [[lshTopK]]: random-hyperplane LSH — sign-bit bucket join, then
  *    exact cosine only within matching buckets. The scale path: the
  *    shuffle is keyed by bucket, the pair count collapses from
  *    |Q|·|C| to the bucket collision mass. Hyperplanes are
  *    deterministic pseudo-random vectors derived from the portable
  *    hash so results are reproducible across engines and runs.
  *  - [[ivfTopK]]: the IVF variant — the bucket key is a coarse
  *    centroid cell ([[Ivf]]'s deterministic sample codebook). The
  *    corpus indexes ONCE (one cell per vector); each query probes
  *    its `probes` nearest cells; exact cosine ranks the probed
  *    members. probes/numCentroids is the recall-vs-cost dial:
  *    candidate mass per query ≈ probes·|C|/numCentroids.
  */
object SimilaritySearch {

  /** ID-NAMESPACE CONTRACT shared by every engine here: query ids
    * and corpus ids are assumed to live in ONE namespace, so
    * query_id = neighbor_id means "the same item" and the self-match
    * is excluded before ranking. Callers whose queries come from an
    * UNRELATED namespace (both numbered 0..N) must either remap
    * query ids into a disjoint range (the d20/CLI practice: negative
    * or offset ids) or pass excludeSelfPairs = false — otherwise an
    * id-colliding true neighbor is silently dropped, and recallAtK
    * cannot catch it because the exact baseline applies the same
    * exclusion. */
  private def dropSelfPairs(df: DataFrame, exclude: Boolean): DataFrame =
    if (exclude) df.filter(col("query_id") =!= col("neighbor_id")) else df

  /** The shared top-k tail every engine ends in: rank per query by
    * `scoreCol` (desc for similarities, asc for distances),
    * deterministic tie-break on neighbor_id, keep rank ≤ k. rank ≤ k
    * over row_number plans as WindowGroupLimit — no full sort of the
    * scored frame. */
  private def rankTopK(scored: DataFrame, scoreCol: String, k: Int,
      asc: Boolean = false): DataFrame = {
    val ord = if (asc) col(scoreCol).asc else col(scoreCol).desc
    val w = Window.partitionBy(col("query_id"))
      .orderBy(ord, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", scoreCol)
  }

  /** The shared verify side: candidate (query_id, neighbor_id) pairs
    * re-attach vectors — the query side by a stats-driven join (query
    * batches are small by contract → AQE broadcasts), the corpus side
    * by a pinned SHUFFLE_HASH join (never a corpus broadcast) — then
    * exact cosine. */
  private def cosineScored(cand: DataFrame, queries: DataFrame,
      candidates: DataFrame, idCol: String, vecCol: String): DataFrame =
    cand
      .join(queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec")),
        "query_id")
      .join(candidates
        .select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
        .hint("shuffle_hash"), "neighbor_id")
      .withColumn("cos",
        graft.plans.VectorKernels.cosineSim(col("q_vec"), col("c_vec")))

  /** Deterministic per-key candidate cap: first `cap` rows per key by
    * neighbor_id — bounds a hot cell/bucket (the classic skew
    * failure) so one collision can't go quadratic. */
  private def capPerKey(df: DataFrame, keys: Seq[String],
      cap: Int): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("neighbor_id").asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= cap).drop("__rn")
  }

  /** Corpus cell membership, cellCap-bounded: ONE probes=1 assignment
    * pass against the shared codebook, then the per-cell cap — the
    * index-build half every IVF variant shares. */
  private def cappedMembers(corpus: DataFrame, idCol: String,
      vecCol: String, codebook: Ivf.Codebook, cellCap: Int): DataFrame =
    capPerKey(
      Ivf.assignmentsWithCodebook(corpus, idCol, vecCol, codebook,
        probes = 1)
        .select(col("id").as("neighbor_id"), col("centroid_id")),
      Seq("centroid_id"), cellCap)

  /** Exact top-k neighbors per query by cosine (desc), deterministic
    * tie-break on neighbor id. */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, k: Int,
      excludeSelfPairs: Boolean = true): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    val c = candidates.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
    val scored = q.crossJoin(c)
      .transform(dropSelfPairs(_, excludeSelfPairs))
      .withColumn("cos", graft.plans.VectorKernels.cosineSim(col("q_vec"), col("c_vec")))
    rankTopK(scored, "cos", k)
  }

  /** One bucket long per table: table t's key packs the sign bits of
    * planes t*planes..t*planes+planes-1 against deterministic
    * pseudo-random hyperplanes (global plane gp's component i =
    * portableHash64("gp:i") / 2^60 - 0.5 — reproducible across
    * engines, which is what lets the SQL oracle replicate the
    * algorithm via md5). Round 4 moved the evaluation into the native
    * [[graft.plans.LshPlaneBuckets]] kernel: the composed form was
    * tables×planes interpreted `aggregate(zip_with(...))` dots per
    * row — the last interpreted-HOF hot path in the catalog — and the
    * kernel is bit-identical to it (LshKernelsSpec). */
  private def tableBuckets(vec: org.apache.spark.sql.Column,
      planes: Int, tables: Int, dim: Int) =
    graft.plans.LshKernels.lshPlaneBuckets(vec, planes, tables, dim)

  /** LSH ANN with an OR-construction over `tables` independent hash
    * tables of `planes` sign bits each: a pair is a candidate if it
    * collides in ANY table (recall 1-(1-s^planes)^tables), then exact
    * cosine + top-k over the union.
    *
    * Scale shape: candidate generation carries IDS ONLY through the
    * (table, bucket) equi-join; vectors are re-attached afterwards —
    * the query side by a stats-driven join (query batches are small →
    * broadcast), the corpus side by a pinned SHUFFLE_HASH join (never
    * a corpus broadcast). `bucketCap` bounds the per-(table, bucket)
    * candidate list (deterministic: first `cap` by id), so one hot
    * bucket — the classic LSH skew failure — cannot go quadratic;
    * capped + AQE skew-split this survives a 100× corpus. The default
    * cap is FINITE so the naive call gets the scale-safe plan; pass
    * `Int.MaxValue` to opt out explicitly.
    */
  def lshTopK(queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, k: Int, planes: Int = 8,
      tables: Int = 4, bucketCap: Int = 10000,
      dim: Int = 64, excludeSelfPairs: Boolean = true): DataFrame = {
    def exploded(df: DataFrame, id: String) =
      df.select(col(idCol).as(id),
        posexplode(tableBuckets(col(vecCol), planes, tables, dim)))
        .withColumnRenamed("pos", "tbl")
        .withColumnRenamed("col", "bucket")
    val qb = exploded(queries, "query_id")
    val cbAll = exploded(candidates, "neighbor_id")
    val cb =
      if (bucketCap == Int.MaxValue) cbAll
      else capPerKey(cbAll, Seq("tbl", "bucket"), bucketCap)
    val pairs = qb.join(cb, Seq("tbl", "bucket"))
      .transform(dropSelfPairs(_, excludeSelfPairs))
      .select("query_id", "neighbor_id").distinct()
    rankTopK(cosineScored(pairs, queries, candidates, idCol, vecCol),
      "cos", k)
  }

  /** IVF ANN top-k: corpus assigned once to its nearest coarse cell
    * (sample codebook — deterministic, oracle-replicable); queries
    * probe their `probes` nearest cells OF THE SAME codebook (a
    * driver value: k·dim doubles, small by construction); candidates
    * are the probed cells' members (ids only, `cellCap`-bounded per
    * cell), then exact cosine + top-k.
    *
    * Scale shape mirrors [[lshTopK]]: the candidate join is keyed by
    * centroid_id carrying ids only; the query side re-attaches by a
    * stats-driven join (small by contract), the corpus side by a
    * pinned SHUFFLE_HASH join — never a corpus broadcast. At 100 TB
    * the knobs follow the dedup discipline: numCentroids ~ sqrt(|C|)
    * keeps per-cell population flat, cellCap bounds a skewed cell. */
  /** IVF ANN over an int8-QUANTIZED corpus — what a 100 TB vector
    * deployment actually runs: the corpus is stored/shuffled as
    * (q8: binary, scale: double) — dim + 8 bytes per vector instead
    * of dim·8 ([[graft.plans.Q8Kernels]]) — and every vector-valued
    * step dequantizes on the fly with the pinned ss4 arithmetic
    * (q_i·scale in double), so the whole pipeline is deterministic
    * and oracle-replicable.
    *
    * Structure mirrors [[ivfTopK]] with the corpus swapped for its
    * dequantized view: codebook + corpus cell assignment come from
    * dequantized vectors (index-build-time compute, one linear
    * assignment pass); queries arrive UNQUANTIZED (the live-query
    * deployment shape) and probe the dequantized codebook; final
    * scoring is exact cosine of raw query vs dequantized candidate.
    * The corpus-side re-attach — the largest exchange of the query —
    * carries only (neighbor_id, q8, scale) through the pinned
    * SHUFFLE_HASH join; the 8× narrower rows are the point of this
    * operator. Recall vs the float path is bounded by the ss4
    * fidelity (≈0.999 cosine on the gate corpus); the
    * quantized-recall spec pins top-k agreement empirically. */
  def quantizedIvfTopK(queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, k: Int, numCentroids: Int,
      probes: Int = 4, cellCap: Int = 10000,
      excludeSelfPairs: Boolean = true): DataFrame = {
    import graft.plans.Q8Kernels
    val comp = candidates
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("__v"))
      .withColumn("__scale", VectorCompression.int8Scale(col("__v")))
      .select(col("neighbor_id"),
        Q8Kernels.packInt8(
          VectorCompression.quantizeInt8(col("__v"), col("__scale"))).as("__q8"),
        col("__scale"))
    val dq = comp.select(col("neighbor_id").as("id"),
      Q8Kernels.dequantizeQ8(col("__q8"), col("__scale")).as("vec"))
    val codebook = Ivf.sampleCodebook(dq, "id", "vec", numCentroids)
    val capped = cappedMembers(dq, "id", "vec", codebook, cellCap)
    val queryAssign = Ivf.assignmentsWithCodebook(queries, idCol, vecCol,
      codebook, probes)
      .select(col("id").as("query_id"), col("centroid_id"))
    val cand = queryAssign.join(capped, Seq("centroid_id"))
      .transform(dropSelfPairs(_, excludeSelfPairs))
      .select("query_id", "neighbor_id").distinct()
    // the verify re-attach carries (q8, scale) — 8× narrower than the
    // float form cosineScored joins — and dequantizes in the score
    val scored = cand
      .join(queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec")),
        "query_id")
      .join(comp.hint("shuffle_hash"), "neighbor_id")
      .withColumn("cos", graft.plans.VectorKernels.cosineSim(col("q_vec"),
        Q8Kernels.dequantizeQ8(col("__q8"), col("__scale"))))
    rankTopK(scored, "cos", k)
  }

  def ivfTopK(queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, k: Int, numCentroids: Int,
      probes: Int = 4, cellCap: Int = 10000,
      excludeSelfPairs: Boolean = true): DataFrame = {
    // ONE codebook derivation (k·dim doubles to the driver — the
    // documented Ivf contract, numeric ids required), shared by both
    // assignment sides; deriving the corpus side in-plan as well
    // would re-run the orderBy+limit codebook subplan a second time
    val codebook = Ivf.sampleCodebook(candidates, idCol, vecCol, numCentroids)
    val capped = cappedMembers(candidates, idCol, vecCol, codebook, cellCap)
    val queryAssign = Ivf.assignmentsWithCodebook(queries, idCol, vecCol,
      codebook, probes)
      .select(col("id").as("query_id"), col("centroid_id"))
    val cand = queryAssign.join(capped, Seq("centroid_id"))
      .transform(dropSelfPairs(_, excludeSelfPairs))
      .select("query_id", "neighbor_id").distinct()
    rankTopK(cosineScored(cand, queries, candidates, idCol, vecCol),
      "cos", k)
  }

  /** PERSISTENT IVF index: build once, probe per batch — the
    * vector-search twin of the d10 stored LSH index. The index is
    * two plain DataFrames a table store versions like any other
    * artifact: the sample codebook (`numCentroids` rows of
    * (cid, cvec)) and the cellCap-capped member list
    * (centroid_id, neighbor_id). Building pays the one corpus
    * assignment pass; every later batch probes without it. */
  def ivfIndexFrames(candidates: DataFrame, idCol: String, vecCol: String,
      numCentroids: Int, cellCap: Int = 10000): (DataFrame, DataFrame) = {
    val codebookDf = candidates
      .select(col(idCol).cast("long").as("cid"), col(vecCol).as("cvec"))
      .orderBy("cid").limit(numCentroids)
    // ONE codebook derivation: the driver copy comes from the SAME
    // frame the store persists (probeStoredIvf's read shape), so the
    // stored artifact and the member assignments can never silently
    // desynchronize through a future edit to Ivf.sampleCodebook
    val codebook: Ivf.Codebook = codebookDf.collect()
      .map(r => (r.getLong(0),
        r.getSeq[Number](1).map(_.doubleValue()).toIndexedSeq))
      .toIndexedSeq
    (codebookDf,
      cappedMembers(candidates, idCol, vecCol, codebook, cellCap))
  }

  /** Probe a STORED IVF index ([[ivfIndexFrames]], round-tripped
    * through any table store) with a query batch: re-derive the
    * driver codebook from the stored frame (k·dim — the documented
    * [[Ivf]] driver contract), assign ONLY the batch, join the
    * stored member list, exact-cosine rank. Nothing corpus-sized is
    * re-assigned or broadcast at probe time — the corpus appears
    * only as the pinned SHUFFLE_HASH vector re-attach, exactly
    * [[ivfTopK]]'s verify side. With the same codebook, caps, and
    * probes, results are IDENTICAL to the in-memory [[ivfTopK]]
    * (spec-pinned). */
  def probeStoredIvf(queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, codebookDf: DataFrame,
      members: DataFrame, k: Int, probes: Int = 4,
      excludeSelfPairs: Boolean = true): DataFrame = {
    val codebook: Ivf.Codebook = codebookDf
      .select(col("cid"), col("cvec"))
      .orderBy("cid").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Number](1).map(_.doubleValue()).toIndexedSeq))
      .toIndexedSeq
    val queryAssign = Ivf.assignmentsWithCodebook(queries, idCol, vecCol,
      codebook, probes)
      .select(col("id").as("query_id"), col("centroid_id"))
    val cand = queryAssign
      .join(members.select(col("centroid_id"), col("neighbor_id")),
        Seq("centroid_id"))
      .transform(dropSelfPairs(_, excludeSelfPairs))
      .select("query_id", "neighbor_id").distinct()
    rankTopK(cosineScored(cand, queries, candidates, idCol, vecCol),
      "cos", k)
  }

  /** Cell membership against an EXPLICIT codebook frame — the index
    * build for a TRAINED codebook ([[Ivf.kmeansTrain]]'s centroids,
    * or any (cid, cvec) frame): the production train → index → probe
    * path, where [[ivfIndexFrames]]'s deterministic sample is
    * replaced by the Lloyd-refined geometry (better cell balance,
    * same probe contract). The returned members pair with the
    * codebook frame itself for [[probeStoredIvf]]. */
  def ivfIndexFramesWith(candidates: DataFrame, idCol: String,
      vecCol: String, codebookDf: DataFrame,
      cellCap: Int = 10000): DataFrame =
    cappedMembers(candidates, idCol, vecCol, codebookOf(codebookDf),
      cellCap)

  /** Driver codebook from a stored codebook frame — the shared read
    * half of the mutable stored-index paths. */
  private def codebookOf(codebookDf: DataFrame): Ivf.Codebook = codebookDf
    .select(col("cid"), col("cvec")).orderBy("cid").collect()
    .map(r => (r.getLong(0),
      r.getSeq[Number](1).map(_.doubleValue()).toIndexedSeq))
    .toIndexedSeq

  /** Build the MUTABLE stored IVF index — the ts28 log-structured
    * discipline ([[graft.ops.TextAnalysis.bm25ReindexDocs]]) applied
    * to the vector family, closing the gap where
    * [[ivfIndexFrames]]/[[probeStoredIvf]] are append-only and one
    * changed embedding forces a full rebuild. Four store tables:
    *
    *  - `codebookTable` (cid, cvec): the deterministic sample
    *    codebook, PINNED at build — reindexing vectors never
    *    retrains it (cell geometry must stay comparable across
    *    mutations; retraining is a rebuild);
    *  - `membersTable` (centroid_id, neighbor_id, gen): UNCAPPED
    *    cell membership, bucketed by centroid_id so a probe opens
    *    only its touched cells' bucket dirs. The per-cell cap is
    *    applied AT PROBE TIME over the live rows — that is what
    *    keeps probe ≡ rebuild exact under mutation (a stored cap
    *    could not be maintained incrementally without re-reading the
    *    cell);
    *  - `tombstoneTable` (neighbor_id, dead_below): generations
    *    below the mark are dead (the reindex shape);
    *  - `metaTable` (members_version, tombstones_version,
    *    codebook_version): commits LAST, pinning the TRIPLE —
    *    [[ivfTopKStored]] refuses a torn state retryably. The
    *    codebook is pinned too: a rebuild commits the codebook
    *    before the members, and a probe racing that window (or
    *    landing after a crash between the two) would otherwise
    *    assign queries against the NEW codebook while matching
    *    members built under the OLD one — silently wrong neighbors
    *    instead of a loud refusal. Rebuilding over an EXISTING index
    *    therefore first commits an invalidating meta row (all pins
    *    -2, matching no version), so every probe between that point
    *    and the final re-pin refuses retryably.
    *
    * Assignment is per-id independent (probes = 1 nearest centroid
    * against the fixed codebook), so incremental reassignment of
    * only the changed ids reproduces EXACTLY the membership a full
    * rebuild over the mutated corpus would compute — the identity
    * gate ss17 pins probe ≡ rebuild bit-exactly. Mutations on one
    * index must be externally serialized (the bm25 contract). */
  def ivfBuildIndexStored(corpus: DataFrame, idCol: String, vecCol: String,
      store: ParquetTableStore, numCentroids: Int,
      codebookTable: String = "ivf_codebook",
      membersTable: String = "ivf_members",
      metaTable: String = "ivf_meta",
      tombstoneTable: String = "ivf_tombstones",
      numBuckets: Int = 32): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // REBUILD OVER AN EXISTING INDEX: the codebook commit below lands
    // before the members commit, and a probe in that window would mix
    // new-codebook assignments with old-codebook members — invalidate
    // the pins FIRST (-2 matches no version, -1 included) so every
    // probe until the final re-pin refuses retryably instead
    if (store.exists(metaTable))
      store.withCommitRetries()(store.commit(spark, metaTable,
        Seq((-2L, -2L, -2L))
          .toDF("members_version", "tombstones_version", "codebook_version")))
    val codebookDf = corpus
      .select(col(idCol).cast("long").as("cid"), col(vecCol).as("cvec"))
      .orderBy("cid").limit(numCentroids)
    store.withCommitRetries()(store.commit(spark, codebookTable, codebookDf))
    // the driver copy comes from the COMMITTED frame (the
    // ivfIndexFrames single-derivation rule)
    val codebook = codebookOf(store.read(spark, codebookTable))
    val members = Ivf.assignmentsWithCodebook(corpus, idCol, vecCol,
      codebook, probes = 1)
      .select(col("centroid_id"), col("id").as("neighbor_id"),
        lit(0L).as("gen"))
    store.withCommitRetries()(store.replaceBucketed(spark, membersTable,
      members, Seq("centroid_id"), numBuckets,
      sortWithin = Seq("centroid_id", "neighbor_id")))
    // REBUILD OVER A MUTATED STORE: standing tombstones from a prior
    // reindex would mark the fresh gen-0 members dead (dead_below >=
    // 1 kills them all) and leave the meta pin torn forever — clear
    // the table and pin its NEW version. Every commit here is
    // replace-style, so a rebuild that crashes anywhere is repaired
    // by re-running the rebuild (the pins refuse probes in between).
    val tv =
      if (store.exists(tombstoneTable)) {
        store.withCommitRetries()(store.commit(spark, tombstoneTable,
          store.read(spark, tombstoneTable).filter(lit(false))))
        store.currentVersion(tombstoneTable).get
      } else -1L
    val mv = store.currentVersion(membersTable).get
    val cv = store.currentVersion(codebookTable).get
    store.withCommitRetries()(store.commit(spark, metaTable,
      Seq((mv, tv, cv))
        .toDF("members_version", "tombstones_version", "codebook_version")))
    ()
  }

  /** REINDEX CHANGED VECTORS in the stored IVF index — the
    * delete-and-re-append path: new cell assignments append
    * insert-only under a bumped per-id GENERATION, a tombstone row
    * marks every prior generation of that id dead, and the meta
    * frame re-pins both versions LAST. One members scan derives the
    * generations (the ts28 honest price of an id-keyed lookup in a
    * cell-keyed artifact); everything else is delta-sized. A torn
    * starting state (meta pins behind the live versions — a prior
    * mutation crashed between commits) is refused loudly:
    * [[ivfCompactIndex]] repairs the recoverable shapes. */
  def ivfReindexVectors(changed: DataFrame, idCol: String, vecCol: String,
      store: ParquetTableStore,
      codebookTable: String = "ivf_codebook",
      membersTable: String = "ivf_members",
      tombstoneTable: String = "ivf_tombstones",
      metaTable: String = "ivf_meta"): Unit = {
    val spark = changed.sparkSession
    import spark.implicits._
    require(store.exists(codebookTable) && store.exists(membersTable) &&
      store.exists(metaTable),
      s"ivfReindexVectors: index ($codebookTable, $membersTable, " +
        s"$metaTable) not built — run ivfBuildIndexStored first")
    val nDup = changed.select(col(idCol).as("id")).groupBy("id")
      .agg(count(lit(1)).as("c")).filter(col("c") > 1).limit(1).count()
    require(nDup == 0,
      s"ivfReindexVectors: changed carries duplicate $idCol values — " +
        "dedup the delta first")
    checkIvfPins(spark, store, membersTable, tombstoneTable, codebookTable,
      metaTable, "ivfReindexVectors")
    val ids = changed.select(col(idCol).as("neighbor_id"))
    // generations derive from EVERY row of the changed ids (dead
    // included — the ts28 resurrect rule). PINNED: the frame feeds
    // the members append, the tombstone-emptiness check, and the
    // tombstone upsert — unpinned, the members scan behind it would
    // re-run per action (the g3 lesson; reads stay consistent either
    // way because version dirs are immutable, but the scan is the
    // fold's one corpus-sized cost and must be paid once)
    val gens = store.read(spark, membersTable)
      .join(ids, Seq("neighbor_id"), "left_semi")
      .groupBy("neighbor_id")
      .agg((max(coalesce(col("gen"), lit(0L))) + 1L).as("gen"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val codebook = codebookOf(store.read(spark, codebookTable))
      val newAssign = Ivf.assignmentsWithCodebook(changed, idCol, vecCol,
        codebook, probes = 1)
        .select(col("centroid_id"), col("id").as("neighbor_id"))
        .join(gens, Seq("neighbor_id"), "left")
        .select(col("centroid_id"), col("neighbor_id"),
          coalesce(col("gen"), lit(0L)).as("gen"))
      // commit order: members append → tombstones → meta pins LAST
      store.withCommitRetries()(store.appendBucketed(spark, membersTable,
        newAssign, Seq("centroid_id"),
        sortWithin = Seq("centroid_id", "neighbor_id")))
      val deadMarks = gens.select(col("neighbor_id"),
        col("gen").as("dead_below"))
      if (deadMarks.limit(1).count() > 0)
        store.withCommitRetries()(
          store.upsert(spark, tombstoneTable, deadMarks, Seq("neighbor_id")))
      val mv = store.currentVersion(membersTable).get
      val tv = store.currentVersion(tombstoneTable).getOrElse(-1L)
      val cv = store.currentVersion(codebookTable).get
      store.withCommitRetries()(store.commit(spark, metaTable,
        Seq((mv, tv, cv))
          .toDF("members_version", "tombstones_version", "codebook_version")))
      ()
    } finally gens.unpersist(blocking = false)
  }

  /** COMPACT the mutable stored IVF index: rewrite members keeping
    * only live generations (PRESERVED, not reset — re-running a
    * crashed compaction must be idempotent under the standing
    * tombstones), clear the tombstones, re-pin meta — and thereby
    * REPAIR any crashed-mutation state whose data is consistent.
    * The one unrepairable shape (an id with more than one live
    * generation — a reindex crashed between its members append and
    * its tombstone upsert) is refused loudly with a rebuild
    * instruction, exactly the bm25CompactIndex discipline. */
  def ivfCompactIndex(spark: org.apache.spark.sql.SparkSession,
      store: ParquetTableStore,
      membersTable: String = "ivf_members",
      tombstoneTable: String = "ivf_tombstones",
      metaTable: String = "ivf_meta",
      numBuckets: Int = 32,
      codebookTable: String = "ivf_codebook"): Unit = {
    import spark.implicits._
    require(store.exists(membersTable) && store.exists(metaTable),
      s"ivfCompactIndex: index ($membersTable, $metaTable) not built")
    // a compaction must never "repair" a crashed REBUILD: the members
    // were assigned under the PREVIOUS codebook, and re-pinning them
    // against the rebuild's new codebook would bless silently-wrong
    // probes. A rebuild-in-flight is marked by the invalidating meta
    // row (all pins -2) or by a codebook pin behind the live codebook
    // version — both refuse with a rebuild instruction.
    val metaDf = store.read(spark, metaTable)
    requireCodebookPin(metaDf, metaTable, "ivfCompactIndex")
    metaDf.select(col("codebook_version")).limit(1).collect()
      .headOption.foreach { p =>
        val curC = store.currentVersion(codebookTable).getOrElse(-1L)
        if (p.getLong(0) < -1L || p.getLong(0) != curC)
          throw new IllegalStateException(
            "ivfCompactIndex: a rebuild crashed mid-flight (codebook " +
              s"pin ${p.getLong(0)} vs live $codebookTable v$curC) — " +
              "the members were assigned under a different codebook; " +
              "rebuild with ivfBuildIndexStored")
      }
    val all = store.read(spark, membersTable)
    val tomb =
      if (store.exists(tombstoneTable))
        Some(store.read(spark, tombstoneTable)) else None
    val live = tomb match {
      case None => all
      case Some(t) => all
        .join(broadcast(t.select(col("neighbor_id"), col("dead_below"))),
          Seq("neighbor_id"), "left")
        .filter(col("dead_below").isNull ||
          coalesce(col("gen"), lit(0L)) >= col("dead_below"))
        .select(col("centroid_id"), col("neighbor_id"), col("gen"))
    }
    val dupLiveGens = live
      .select(col("neighbor_id"), coalesce(col("gen"), lit(0L)).as("g"))
      .distinct().groupBy("neighbor_id").agg(count(lit(1)).as("c"))
      .filter(col("c") > 1).limit(1).count()
    if (dupLiveGens > 0)
      throw new IllegalStateException(
        s"ivfCompactIndex: $membersTable carries more than one LIVE " +
          "generation for some id — a reindex crashed between its " +
          "members append and its tombstone upsert. Rebuild with " +
          "ivfBuildIndexStored")
    val hasDead = tomb.exists(_.limit(1).count() > 0)
    if (hasDead)
      store.withCommitRetries()(store.replaceBucketed(spark, membersTable,
        live, Seq("centroid_id"), numBuckets,
        sortWithin = Seq("centroid_id", "neighbor_id")))
    tomb.foreach { t =>
      store.withCommitRetries()(
        store.commit(spark, tombstoneTable, t.filter(lit(false))))
    }
    val mv = store.currentVersion(membersTable).get
    val tv = store.currentVersion(tombstoneTable).getOrElse(-1L)
    val cv = store.currentVersion(codebookTable).getOrElse(
      throw new IllegalStateException(
        s"ivfCompactIndex: $codebookTable missing — rebuild with " +
          "ivfBuildIndexStored"))
    store.withCommitRetries()(store.commit(spark, metaTable,
      Seq((mv, tv, cv))
        .toDF("members_version", "tombstones_version", "codebook_version")))
    ()
  }

  /** The shared torn-state entry guard for mutable-IVF mutations. */
  private def checkIvfPins(spark: org.apache.spark.sql.SparkSession,
      store: ParquetTableStore, membersTable: String,
      tombstoneTable: String, codebookTable: String, metaTable: String,
      who: String): Unit = {
    val meta = store.read(spark, metaTable)
    requireCodebookPin(meta, metaTable, who)
    meta
      .select(col("members_version"), col("tombstones_version"),
        col("codebook_version"))
      .limit(1).collect().headOption.foreach { p =>
      val curM = store.currentVersion(membersTable).getOrElse(-1L)
      val curT = store.currentVersion(tombstoneTable).getOrElse(-1L)
      val curC = store.currentVersion(codebookTable).getOrElse(-1L)
      if (p.getLong(0) != curM || p.getLong(1) != curT ||
          p.getLong(2) != curC)
        throw new IllegalStateException(
          s"$who: index torn — $metaTable pins members " +
            s"v${p.getLong(0)}/tombstones v${p.getLong(1)}/codebook " +
            s"v${p.getLong(2)} but the tables are at " +
            s"v$curM/v$curT/v$curC; a prior mutation crashed between " +
            "commits. Run ivfCompactIndex to repair, or " +
            "ivfBuildIndexStored to rebuild")
    }
  }

  /** A meta frame that predates codebook pinning can't prove the
    * codebook matches the members — refuse rather than guess (the
    * checkStoredN legacy discipline). */
  private def requireCodebookPin(meta: DataFrame, metaTable: String,
      who: String): Unit =
    if (!meta.columns.contains("codebook_version"))
      throw new IllegalStateException(
        s"$who: $metaTable predates codebook pinning — rebuild the " +
          "index with ivfBuildIndexStored to upgrade it")

  /** Probe the MUTABLE stored IVF index: assign ONLY the query
    * batch, open ONLY the touched cells' bucket dirs
    * ([[ParquetTableStore.readBucketsOf]] — directory-level pruning,
    * the bm25TopKStored shape), drop reindexed-away generations with
    * one tombstone-sized broadcast, apply the per-cell cap over the
    * LIVE rows, exact-cosine rank. `candidates` supplies the scoring
    * vectors (the caller's corpus table — pass the MUTATED corpus
    * after a reindex). Refuses a torn index state retryably via the
    * meta pins. Bit-identical to a from-scratch capped IVF probe
    * over the same corpus with the same (pinned) codebook. */
  def ivfTopKStored(queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, store: ParquetTableStore, k: Int,
      probes: Int = 4, cellCap: Int = 10000,
      excludeSelfPairs: Boolean = true,
      codebookTable: String = "ivf_codebook",
      membersTable: String = "ivf_members",
      tombstoneTable: String = "ivf_tombstones",
      metaTable: String = "ivf_meta"): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val (cand, _) = ivfStoredCandidates(queries, idCol, vecCol, store,
      probes, cellCap, excludeSelfPairs, codebookTable, membersTable,
      tombstoneTable, metaTable)
    rankTopK(cosineScored(cand, queries, candidates, idCol, vecCol),
      "cos", k)
  }

  /** The candidate-generation half of [[ivfTopKStored]] — pinned-
    * codebook query assignment, touched-cell bucket reads, tombstone
    * filter, live per-cell cap — returning (query_id, neighbor_id)
    * pairs for ANY scoring tail (exact cosine, or [[ivfPqTopKStored]]'s
    * stored-code ADC). All three version pins resolve-then-verify. */
  private def ivfStoredCandidates(queries: DataFrame, idCol: String,
      vecCol: String, store: ParquetTableStore, probes: Int,
      cellCap: Int, excludeSelfPairs: Boolean,
      codebookTable: String, membersTable: String,
      tombstoneTable: String, metaTable: String): (DataFrame, Long) = {
    val spark = queries.sparkSession
    import spark.implicits._
    val (metaDf, metaV) = store.readVersioned(spark, metaTable)
    requireCodebookPin(metaDf, metaTable, "ivfTopKStored")
    val pins = metaDf
      .select(col("members_version"), col("tombstones_version"),
        col("codebook_version"))
      .limit(1).collect().headOption.getOrElse(
        throw new IllegalStateException(
          s"ivfTopKStored: $metaTable is empty — rebuild the index"))
    // resolve-then-verify on the CODEBOOK too: a probe racing a
    // rebuild (codebook committed, members not yet) must refuse
    // retryably, never assign queries against a codebook the members
    // weren't built under
    val (codebookFrame, cbv) = store.readVersioned(spark, codebookTable)
    if (pins.getLong(2) != cbv)
      throw new IllegalStateException(
        s"ivf index mid-update: $metaTable pins codebook " +
          s"v${pins.getLong(2)} but $codebookTable resolved v$cbv — " +
          "retry after the rebuild completes")
    val codebook = codebookOf(codebookFrame)
    val queryAssign = Ivf.assignmentsWithCodebook(queries, idCol, vecCol,
      codebook, probes)
      .select(col("id").as("query_id"), col("centroid_id"))
    // touched cells to the driver: ≤ |batch|·probes longs by contract
    val touched = queryAssign.select("centroid_id").distinct()
      .collect().map(_.getLong(0)).toSeq
    val (cells, mv) = store.readBucketsOf(spark, membersTable,
      touched.toDF("centroid_id"))
    if (pins.getLong(0) != mv)
      throw new IllegalStateException(
        s"ivf index mid-update: $metaTable pins members " +
          s"v${pins.getLong(0)} but $membersTable resolved v$mv — " +
          "retry after the index mutation completes")
    // resolve-then-verify (the readBucketsOf discipline): bind the
    // tombstone frame FIRST, then compare its resolved version to the
    // pin — a commit landing between a version pre-check and the read
    // would otherwise mix snapshots undetected
    val tombResolved = if (store.exists(tombstoneTable))
      Some(store.readVersioned(spark, tombstoneTable)) else None
    val actualTomb = tombResolved.map(_._2).getOrElse(-1L)
    if (pins.getLong(1) != actualTomb)
      throw new IllegalStateException(
        s"ivf index mid-update: $metaTable pins tombstones " +
          s"v${pins.getLong(1)} but $tombstoneTable resolved " +
          s"v$actualTomb — retry after the reindex completes")
    val mine = cells.filter(col("centroid_id").isin(touched: _*))
    val live = tombResolved.map(_._1) match {
      case None => mine
      case Some(t) => mine
        .join(broadcast(t.select(col("neighbor_id"), col("dead_below"))),
          Seq("neighbor_id"), "left")
        .filter(col("dead_below").isNull ||
          coalesce(col("gen"), lit(0L)) >= col("dead_below"))
    }
    // per-cell cap over LIVE rows — the probe-time twin of
    // cappedMembers (see ivfBuildIndexStored's scaladoc)
    val capped = capPerKey(
      live.select(col("centroid_id"), col("neighbor_id")),
      Seq("centroid_id"), cellCap)
    (queryAssign.join(capped, Seq("centroid_id"))
      .transform(dropSelfPairs(_, excludeSelfPairs))
      .select("query_id", "neighbor_id").distinct(), metaV)
  }

  /** AUTO PQ geometry from corpus stats — the band-miner/IVF
    * auto-sizing discipline applied to the remaining fixed vector
    * knobs (round-7 verdict item 8). Returns (m, ks):
    *  - m (subspace count): dim split into the widest subspaces of
    *    4-8 components that divide it evenly (the published PQ
    *    practice — narrower subspaces quantize finer but cost more
    *    code bytes and table lookups; degrade toward narrower
    *    divisors only for odd dims).
    *  - ks (per-subspace centroids): ~sqrt(n) rounded up to a power
    *    of two, clamped to [16, 256] — the codebook trains on an
    *    id-ordered corpus sample, so centroids beyond sample support
    *    overfit, and 256 keeps codes one byte (standard 8-bit PQ) —
    *    the cap binding at large n is the design, not a loss.
    * Pure arithmetic (no job): callers that already know n pass it;
    * [[pqAutoParams]] of a DataFrame is one columnar count away. */
  def pqAutoParams(n: Long, dim: Int): (Int, Int) = {
    require(dim >= 1, s"dim must be positive, got $dim")
    val subDim = (8 to 2 by -1).find(d => d <= dim && dim % d == 0).getOrElse(1)
    val sq = math.ceil(math.sqrt(math.max(1L, n).toDouble)).toInt
    val pow2 = if (sq <= 1) 1 else Integer.highestOneBit(sq - 1) << 1
    (dim / subDim, math.min(256, math.max(16, pow2)))
  }

  /** PRODUCT QUANTIZATION: the deterministic PQ codebook — m
    * sub-codebooks of ks centroids each, taken from the first `ks`
    * corpus vectors by id (the [[Ivf.sampleCodebook]] sample
    * discipline; k-means refinement plugs in at deployment).
    * Shape: (j)(c)(d) = subspace j, centroid c, component d.
    * ks·dim doubles to the driver — the documented small-codebook
    * contract. */
  def pqCodebook(candidates: DataFrame, idCol: String, vecCol: String,
      m: Int, ks: Int, dim: Int, iters: Int = 0,
      sampleN: Int = 4096): Array[Array[Array[Double]]] = {
    require(dim % m == 0, s"dim $dim must split into m=$m subspaces")
    val subDim = dim / m
    val take = math.max(ks, if (iters > 0) sampleN else ks)
    val rows = candidates
      .select(col(idCol).cast("long").as("cid"), col(vecCol).as("v"))
      .orderBy("cid").limit(take).collect()
    require(rows.length >= ks, s"corpus has ${rows.length} < ks=$ks vectors")
    val full = rows.map(_.getSeq[Number](1).map(_.doubleValue()).toArray)
    val init = Array.tabulate(m, ks)((j, c) =>
      full(c).slice(j * subDim, (j + 1) * subDim))
    if (iters == 0) return init
    // per-subspace Lloyd refinement on the driver over the bounded
    // id-ordered sample (the standard PQ practice: codebooks train on
    // a corpus sample, ~1e5 vectors in production — deterministic
    // here: fixed point order, strict-< assignment ties to lower c,
    // empty cells keep their previous centroid)
    Array.tabulate(m) { j =>
      val pts = full.map(_.slice(j * subDim, (j + 1) * subDim))
      var cents = init(j)
      for (_ <- 1 to iters) {
        val sums = Array.fill(ks, subDim)(0.0)
        val counts = new Array[Long](ks)
        pts.foreach { p =>
          var best = 0; var bd = Double.MaxValue
          var c = 0
          while (c < ks) {
            var d = 0.0; var i = 0
            while (i < subDim) { val x = p(i) - cents(c)(i); d += x * x; i += 1 }
            if (d < bd) { bd = d; best = c }
            c += 1
          }
          var i = 0
          while (i < subDim) { sums(best)(i) += p(i); i += 1 }
          counts(best) += 1
        }
        cents = Array.tabulate(ks) { c =>
          if (counts(c) == 0) cents(c)
          else Array.tabulate(subDim)(i => sums(c)(i) / counts(c))
        }
      }
      cents
    }
  }

  /** Squared L2 distance of a sub-slice of `vec` (0-based `start`,
    * length = cvals.length) against a literal centroid — unrolled
    * (element − lit)² terms summed LEFT TO RIGHT from 0.0, fully
    * codegen'd. The oracle regenerates the identical fold with
    * `list_reduce(list_prepend(0.0, …))`. */
  private def l2sqLit(vec: org.apache.spark.sql.Column, start: Int,
      cvals: Array[Double]): org.apache.spark.sql.Column =
    cvals.zipWithIndex.map { case (cv, d) =>
      val x = element_at(vec, start + d + 1).cast("double") - lit(cv)
      x * x
    }.foldLeft(lit(0.0))(_ + _)

  /** PQ ENCODE as a pure per-row Project: codes(j) = argmin over c of
    * the subspace-j squared L2, ties to the LOWER centroid id — the
    * oracle's `ORDER BY dist, c` twin. Runs as the native
    * [[graft.plans.PqKernels.PqEncode]] kernel (the unrolled literal
    * expression form generates >64 KB methods at production codebook
    * sizes and janino bails the stage to interpreted eval);
    * [[pqEncodeUnrolled]] keeps the expression form as the kernel's
    * bit-parity spec twin. Encoding rides the corpus scan with ZERO
    * exchange, which is what makes PQ build-time linear. */
  def pqEncodeExpr(vec: org.apache.spark.sql.Column,
      cb: Array[Array[Array[Double]]]): org.apache.spark.sql.Column =
    graft.plans.PqKernels.pqEncode(vec, cb)

  /** The composed-expression twin of [[pqEncodeExpr]] — argmin via
    * `array_position(darr, array_min(darr))` (first index of the
    * minimum = lower centroid id on ties). Only for parity specs:
    * at real codebook sizes this form breaks whole-stage codegen. */
  private[graft] def pqEncodeUnrolled(vec: org.apache.spark.sql.Column,
      cb: Array[Array[Array[Double]]]): org.apache.spark.sql.Column = {
    val subDim = cb(0)(0).length
    val perJ = cb.zipWithIndex.map { case (cents, j) =>
      val darr = array(cents.map(cv => l2sqLit(vec, j * subDim, cv))
        .toIndexedSeq: _*)
      (array_position(darr, array_min(darr)) - 1).cast("int")
    }
    array(perJ.toIndexedSeq: _*)
  }

  /** PQ ANN with asymmetric distance computation (ADC) — the 100 TB
    * vector-MEMORY design: the corpus is carried as m small-int codes
    * per vector (m bytes packed) instead of dim floats, and search
    * never touches a corpus vector again.
    *
    *  - build: [[pqCodebook]] (ks·dim doubles) + [[pqEncodeExpr]]
    *    (zero-exchange Project over the corpus scan).
    *  - search: each query precomputes its m×ks table of subspace
    *    distances to every centroid (one unrolled Project on the
    *    |Q|-sized side), the query batch BROADCASTS against the
    *    streaming code column, and a candidate's distance is the
    *    j-ordered fold of m table lookups — per-row arithmetic, no
    *    shuffle until the top-k window (rank ≤ k plans as
    *    WindowGroupLimit).
    *
    * Approximation: distance error is bounded by the per-subspace
    * quantization error (recall pinned empirically by the spec via
    * [[recallAtK]]); determinism: every double op is an unrolled
    * +,−,× in pinned order — no ln/sqrt — so the oracle reproduces
    * `dist` BIT-exactly. |Q| small by contract (the [[bruteForceTopK]]
    * broadcast-batch shape). */
  def pqTopK(queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, k: Int, m: Int, ks: Int,
      dim: Int, iters: Int = 0,
      excludeSelfPairs: Boolean = true): DataFrame = {
    val cb = pqCodebook(candidates, idCol, vecCol, m, ks, dim, iters)
    val subDim = dim / m
    val codes = candidates
      .select(col(idCol).cast("long").as("neighbor_id"),
        pqEncodeExpr(col(vecCol), cb).as("codes"))
    // per-query ADC table, flattened to tbl[j*ks + c] (native kernel;
    // see pqEncodeExpr for why the unrolled form can't ship)
    val qt = queries
      .select(col(idCol).cast("long").as("query_id"),
        graft.plans.PqKernels.pqAdcTable(col(vecCol), cb).as("__tbl"))
    val scored = codes.crossJoin(broadcast(qt))
      .transform(dropSelfPairs(_, excludeSelfPairs))
      .select(col("query_id"), col("neighbor_id"),
        adcDist(m, ks).as("dist"))
    rankTopK(scored, "dist", k, asc = true)
  }

  /** PQ SHORTLIST-AND-RERANK — how PQ actually deploys: [[pqTopK]]'s
    * ADC pass generates a `shortlist`-sized candidate set per query
    * from codes alone, then ONLY those `shortlist`·|Q| rows re-attach
    * their raw vectors (the pinned SHUFFLE_HASH re-join, the
    * [[quantizedIvfTopK]] discipline) for an exact squared-L2
    * rerank. Recall becomes recall@shortlist of ADC — much higher
    * than ADC@k — while the corpus itself is still never shuffled as
    * floats. Exact L2 uses the dot identity a·a − 2a·b + b·b over the
    * native codegen'd kernel, the form the oracle regenerates
    * textually. */
  def pqRerankTopK(queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, k: Int, shortlist: Int,
      m: Int, ks: Int, dim: Int, iters: Int = 0): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist must be >= k=$k")
    val short = pqTopK(queries, candidates, idCol, vecCol, shortlist,
      m, ks, dim, iters).select("query_id", "neighbor_id")
    import graft.plans.VectorKernels.dotProduct
    val scored = short
      .join(queries.select(col(idCol).cast("long").as("query_id"),
        col(vecCol).as("q_vec")), "query_id")
      .join(candidates.select(col(idCol).cast("long").as("neighbor_id"),
        col(vecCol).as("c_vec")).hint("shuffle_hash"), "neighbor_id")
      .withColumn("l2", dotProduct(col("q_vec"), col("q_vec"))
        - lit(2.0) * dotProduct(col("q_vec"), col("c_vec"))
        + dotProduct(col("c_vec"), col("c_vec")))
    rankTopK(scored, "l2", k, asc = true)
  }

  /** Driver codebook from a stored PQ codebook frame ((j, c, cvec)
    * rows — m·ks of them, small by the PQ contract): the
    * [[codebookOf]] twin for the product-quantized family. Refuses a
    * frame with missing or duplicate (j, c) slots — a torn or
    * foreign artifact must never silently encode. */
  private def pqCodebookOf(df: DataFrame, m: Int,
      ks: Int): Array[Array[Array[Double]]] = {
    val out = Array.ofDim[Array[Double]](m, ks)
    df.select(col("j"), col("c"), col("cvec")).collect().foreach { r =>
      val (j, c) = (r.getInt(0), r.getInt(1))
      require(j >= 0 && j < m && c >= 0 && c < ks,
        s"stored PQ codebook slot ($j,$c) outside m=$m ks=$ks")
      require(out(j)(c) == null, s"duplicate PQ codebook slot ($j,$c)")
      out(j)(c) = r.getSeq[Number](2).map(_.doubleValue()).toArray
    }
    require(out.forall(_.forall(_ != null)),
      s"stored PQ codebook is missing slots (expected ${m * ks} rows)")
    out
  }

  /** The shared ADC distance fold: j-ordered sum of m table lookups
    * (`__tbl` flattened to tbl[j·ks + code + 1]) — pinned +-only
    * double arithmetic, bit-replicable by the oracle. */
  private def adcDist(m: Int, ks: Int): org.apache.spark.sql.Column =
    (0 until m).map { j =>
      element_at(col("__tbl"),
        lit(j * ks + 1) + element_at(col("codes"), j + 1))
    }.foldLeft(lit(0.0))(_ + _)

  /** Build the MUTABLE stored PQ index — the ss17 generation+
    * tombstone discipline applied to the DEPLOYMENT index (PQ codes
    * are the only corpus representation that shuffles at 100 TB: m
    * bytes per vector), closing the gap where [[pqTopK]]'s codes are
    * derived fresh per call and one changed embedding forced a full
    * re-encode. Four store tables:
    *
    *  - `codebookTable` (j, c, cvec): the m·ks sub-codebooks, PINNED
    *    at build — the CODEBOOK-DRIFT CONTRACT: reindexing vectors
    *    re-encodes them against this frozen geometry and never
    *    retrains it (codes encoded under different codebooks are not
    *    comparable — one ADC table serves one codebook). When the
    *    corpus has drifted far enough that the frozen codebook's
    *    quantization error hurts recall, that is a REBUILD
    *    ([[pqBuildIndexStored]] again), not a reindex — the same
    *    rule as IVF cell geometry, enforced by pinning
    *    codebook_version in the meta row;
    *  - `codesTable` (neighbor_id, codes, gen): the encoded corpus,
    *    bucketed by neighbor_id so a delta re-encode appends/upserts
    *    O(delta) ([[ParquetTableStore.appendBucketed]]); probes scan
    *    all buckets BY DESIGN — ADC is the linear-scan stage, at m
    *    bytes/vector;
    *  - `tombstoneTable` (neighbor_id, dead_below): generations below
    *    the mark are dead (the reindex shape);
    *  - `metaTable` (codes_version, tombstones_version,
    *    codebook_version, m, ks, dim): commits LAST, pinning the
    *    version TRIPLE plus the geometry (the round-12 DSIR lesson:
    *    unrecorded knobs drift silently — a probe derives m/ks/dim
    *    from the index, never from caller arguments). Rebuilding over
    *    an existing index first commits an invalidating row (pins -2)
    *    so probes racing the rebuild refuse retryably.
    *
    * Encoding is per-id independent (argmin against the fixed
    * codebook), so incremental re-encoding of only the changed ids
    * reproduces EXACTLY the codes a full re-encode over the mutated
    * corpus would compute — the identity gate ss20 pins bit-exactly.
    * Mutations on one index must be externally serialized (the bm25/
    * ivf contract). */
  def pqBuildIndexStored(corpus: DataFrame, idCol: String, vecCol: String,
      store: ParquetTableStore, m: Int, ks: Int, dim: Int,
      iters: Int = 0,
      codebookTable: String = "pq_codebook",
      codesTable: String = "pq_codes",
      tombstoneTable: String = "pq_tombstones",
      metaTable: String = "pq_meta",
      numBuckets: Int = 32): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // rebuild over an existing index: invalidate the pins FIRST (the
    // ivfBuildIndexStored discipline — the codebook commit below must
    // never pair with the old codes under still-valid pins)
    if (store.exists(metaTable))
      store.withCommitRetries()(store.commit(spark, metaTable,
        Seq((-2L, -2L, -2L, m, ks, dim)).toDF("codes_version",
          "tombstones_version", "codebook_version", "m", "ks", "dim")))
    val cb = pqCodebook(corpus, idCol, vecCol, m, ks, dim, iters)
    val cbRows = for (j <- cb.indices; c <- cb(j).indices)
      yield (j, c, cb(j)(c).toSeq)
    store.withCommitRetries()(store.commit(spark, codebookTable,
      cbRows.toDF("j", "c", "cvec")))
    // the driver copy re-derives from the COMMITTED frame (the
    // ivfIndexFrames single-derivation rule)
    val cbStored = pqCodebookOf(store.read(spark, codebookTable), m, ks)
    // codes cast to nullable-element array<int>: the kernel emits
    // non-null elements, but parquet round-trips relax nullability —
    // canonicalizing both write paths keeps appendBucketed's strict
    // schema check honest
    val codes = corpus.select(col(idCol).cast("long").as("neighbor_id"),
      pqEncodeExpr(col(vecCol), cbStored).cast("array<int>").as("codes"),
      lit(0L).as("gen"))
    store.withCommitRetries()(store.replaceBucketed(spark, codesTable,
      codes, Seq("neighbor_id"), numBuckets,
      sortWithin = Seq("neighbor_id")))
    val tv =
      if (store.exists(tombstoneTable)) {
        store.withCommitRetries()(store.commit(spark, tombstoneTable,
          store.read(spark, tombstoneTable).filter(lit(false))))
        store.currentVersion(tombstoneTable).get
      } else -1L
    val kv = store.currentVersion(codesTable).get
    val cv = store.currentVersion(codebookTable).get
    store.withCommitRetries()(store.commit(spark, metaTable,
      Seq((kv, tv, cv, m, ks, dim)).toDF("codes_version",
        "tombstones_version", "codebook_version", "m", "ks", "dim")))
    ()
  }

  /** The stored-PQ meta row: version pins + geometry, plus the meta
    * TABLE's own resolved version (`metaV`) — what the pair-level
    * consistency check in [[ivfPqTopKStored]] verifies against the
    * pair pin. */
  private final case class PqMeta(codesV: Long, tombV: Long, cbV: Long,
      m: Int, ks: Int, dim: Int, metaV: Long)

  private def pqMetaOf(spark: org.apache.spark.sql.SparkSession,
      store: ParquetTableStore, metaTable: String, who: String): PqMeta = {
    val (meta, metaV) = store.readVersioned(spark, metaTable)
    val p = meta.select(col("codes_version"), col("tombstones_version"),
      col("codebook_version"), col("m"), col("ks"), col("dim"))
      .limit(1).collect().headOption.getOrElse(
        throw new IllegalStateException(
          s"$who: $metaTable is empty — rebuild the index"))
    PqMeta(p.getLong(0), p.getLong(1), p.getLong(2),
      p.getInt(3), p.getInt(4), p.getInt(5), metaV)
  }

  /** The shared torn-state entry guard for stored-PQ mutations. */
  private def checkPqPins(spark: org.apache.spark.sql.SparkSession,
      store: ParquetTableStore, codesTable: String,
      tombstoneTable: String, codebookTable: String, metaTable: String,
      who: String): PqMeta = {
    val meta = pqMetaOf(spark, store, metaTable, who)
    val curK = store.currentVersion(codesTable).getOrElse(-1L)
    val curT = store.currentVersion(tombstoneTable).getOrElse(-1L)
    val curC = store.currentVersion(codebookTable).getOrElse(-1L)
    if (meta.codesV != curK || meta.tombV != curT || meta.cbV != curC)
      throw new IllegalStateException(
        s"$who: index torn — $metaTable pins codes v${meta.codesV}/" +
          s"tombstones v${meta.tombV}/codebook v${meta.cbV} but the " +
          s"tables are at v$curK/v$curT/v$curC; a prior mutation " +
          "crashed between commits. Run pqCompactIndex to repair, or " +
          "pqBuildIndexStored to rebuild")
    meta
  }

  /** RE-ENCODE CHANGED VECTORS in the stored PQ index — the ss17
    * delete-and-re-append path for the code family: fresh codes
    * append insert-only under a bumped per-id generation, a tombstone
    * row marks every prior generation dead, the meta row re-pins
    * LAST. Geometry (m, ks, dim) and the codebook come from the INDEX
    * (never caller arguments — drift refuses at the pin). One codes
    * scan derives the generations (the ts28 honest price); everything
    * else is delta-sized. */
  def pqReindexVectors(changed: DataFrame, idCol: String, vecCol: String,
      store: ParquetTableStore,
      codebookTable: String = "pq_codebook",
      codesTable: String = "pq_codes",
      tombstoneTable: String = "pq_tombstones",
      metaTable: String = "pq_meta"): Unit = {
    val spark = changed.sparkSession
    import spark.implicits._
    require(store.exists(codebookTable) && store.exists(codesTable) &&
      store.exists(metaTable),
      s"pqReindexVectors: index ($codebookTable, $codesTable, " +
        s"$metaTable) not built — run pqBuildIndexStored first")
    val nDup = changed.select(col(idCol).as("id")).groupBy("id")
      .agg(count(lit(1)).as("c")).filter(col("c") > 1).limit(1).count()
    require(nDup == 0,
      s"pqReindexVectors: changed carries duplicate $idCol values — " +
        "dedup the delta first")
    val meta = checkPqPins(spark, store, codesTable, tombstoneTable,
      codebookTable, metaTable, "pqReindexVectors")
    val ids = changed.select(col(idCol).cast("long").as("neighbor_id"))
    // generations derive from EVERY row of the changed ids (dead
    // included — the ts28 resurrect rule); PINNED because the frame
    // feeds three actions (the g3 lesson)
    val gens = store.read(spark, codesTable)
      .join(ids, Seq("neighbor_id"), "left_semi")
      .groupBy("neighbor_id")
      .agg((max(coalesce(col("gen"), lit(0L))) + 1L).as("gen"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val cbStored = pqCodebookOf(store.read(spark, codebookTable),
        meta.m, meta.ks)
      val newCodes = changed
        .select(col(idCol).cast("long").as("neighbor_id"),
          pqEncodeExpr(col(vecCol), cbStored).cast("array<int>").as("codes"))
        .join(gens, Seq("neighbor_id"), "left")
        .select(col("neighbor_id"), col("codes"),
          coalesce(col("gen"), lit(0L)).as("gen"))
      // commit order: codes append → tombstones → meta pins LAST
      store.withCommitRetries()(store.appendBucketed(spark, codesTable,
        newCodes, Seq("neighbor_id"), sortWithin = Seq("neighbor_id")))
      val deadMarks = gens.select(col("neighbor_id"),
        col("gen").as("dead_below"))
      if (deadMarks.limit(1).count() > 0)
        store.withCommitRetries()(
          store.upsert(spark, tombstoneTable, deadMarks, Seq("neighbor_id")))
      val kv = store.currentVersion(codesTable).get
      val tv = store.currentVersion(tombstoneTable).getOrElse(-1L)
      val cv = store.currentVersion(codebookTable).get
      store.withCommitRetries()(store.commit(spark, metaTable,
        Seq((kv, tv, cv, meta.m, meta.ks, meta.dim)).toDF("codes_version",
          "tombstones_version", "codebook_version", "m", "ks", "dim")))
      ()
    } finally gens.unpersist(blocking = false)
  }

  /** COMPACT the mutable stored PQ index: rewrite codes keeping only
    * live generations (preserved, not reset — idempotent re-run),
    * clear tombstones, re-pin meta — repairing any crashed-MUTATION
    * state whose data is consistent. Refuses the two unrepairable
    * shapes loudly with a rebuild instruction: an id with two live
    * generations (a reindex crashed between append and tombstone),
    * and a crashed REBUILD (invalidated pins or a codebook pin behind
    * the live codebook — the codes were encoded under a different
    * codebook and must never be re-blessed). */
  def pqCompactIndex(spark: org.apache.spark.sql.SparkSession,
      store: ParquetTableStore,
      codesTable: String = "pq_codes",
      tombstoneTable: String = "pq_tombstones",
      metaTable: String = "pq_meta",
      numBuckets: Int = 32,
      codebookTable: String = "pq_codebook"): Unit = {
    import spark.implicits._
    require(store.exists(codesTable) && store.exists(metaTable),
      s"pqCompactIndex: index ($codesTable, $metaTable) not built")
    val meta = pqMetaOf(spark, store, metaTable, "pqCompactIndex")
    val curC = store.currentVersion(codebookTable).getOrElse(-1L)
    if (meta.cbV < -1L || meta.cbV != curC)
      throw new IllegalStateException(
        "pqCompactIndex: a rebuild crashed mid-flight (codebook pin " +
          s"${meta.cbV} vs live $codebookTable v$curC) — the codes " +
          "were encoded under a different codebook; rebuild with " +
          "pqBuildIndexStored")
    val all = store.read(spark, codesTable)
    val tomb =
      if (store.exists(tombstoneTable))
        Some(store.read(spark, tombstoneTable)) else None
    val live = tomb match {
      case None => all
      case Some(t) => all
        .join(broadcast(t.select(col("neighbor_id"), col("dead_below"))),
          Seq("neighbor_id"), "left")
        .filter(col("dead_below").isNull ||
          coalesce(col("gen"), lit(0L)) >= col("dead_below"))
        .select(col("neighbor_id"), col("codes"), col("gen"))
    }
    val dupLiveGens = live
      .select(col("neighbor_id"), coalesce(col("gen"), lit(0L)).as("g"))
      .distinct().groupBy("neighbor_id").agg(count(lit(1)).as("c"))
      .filter(col("c") > 1).limit(1).count()
    if (dupLiveGens > 0)
      throw new IllegalStateException(
        s"pqCompactIndex: $codesTable carries more than one LIVE " +
          "generation for some id — a reindex crashed between its " +
          "codes append and its tombstone upsert. Rebuild with " +
          "pqBuildIndexStored")
    val hasDead = tomb.exists(_.limit(1).count() > 0)
    if (hasDead)
      store.withCommitRetries()(store.replaceBucketed(spark, codesTable,
        live, Seq("neighbor_id"), numBuckets,
        sortWithin = Seq("neighbor_id")))
    tomb.foreach { t =>
      store.withCommitRetries()(
        store.commit(spark, tombstoneTable, t.filter(lit(false))))
    }
    val kv = store.currentVersion(codesTable).get
    val tv = store.currentVersion(tombstoneTable).getOrElse(-1L)
    store.withCommitRetries()(store.commit(spark, metaTable,
      Seq((kv, tv, curC, meta.m, meta.ks, meta.dim)).toDF("codes_version",
        "tombstones_version", "codebook_version", "m", "ks", "dim")))
    ()
  }

  /** Probe the MUTABLE stored PQ index: the query batch precomputes
    * its ADC tables against the PINNED stored codebook, the code
    * column streams against the broadcast batch (pqTopK's scan — no
    * vector re-attach anywhere: the index IS the corpus
    * representation), reindexed-away generations drop via one
    * tombstone-sized broadcast, distances are the j-ordered lookup
    * fold. Geometry comes from the meta row, never the caller.
    * Refuses a torn state retryably via the version pins
    * (resolve-then-verify on all three tables). Bit-identical to
    * encoding the mutated corpus from scratch against the same
    * pinned codebook (gate ss20). */
  def pqTopKStored(queries: DataFrame, idCol: String, vecCol: String,
      store: ParquetTableStore, k: Int,
      excludeSelfPairs: Boolean = true,
      codebookTable: String = "pq_codebook",
      codesTable: String = "pq_codes",
      tombstoneTable: String = "pq_tombstones",
      metaTable: String = "pq_meta"): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val spark = queries.sparkSession
    val (live, cbStored, meta) = pqStoredLive(spark, store,
      codebookTable, codesTable, tombstoneTable, metaTable)
    val qt = queries
      .select(col(idCol).cast("long").as("query_id"),
        graft.plans.PqKernels.pqAdcTable(col(vecCol), cbStored).as("__tbl"))
    val scored = live
      .crossJoin(broadcast(qt))
      .transform(dropSelfPairs(_, excludeSelfPairs))
      .select(col("query_id"), col("neighbor_id"),
        adcDist(meta.m, meta.ks).as("dist"))
    rankTopK(scored, "dist", k, asc = true)
  }

  /** The meta-checked, tombstone-filtered LIVE stored codes
    * ((neighbor_id, codes) — dead generations dropped) plus the
    * pinned driver codebook and geometry — the shared read half of
    * [[pqTopKStored]] and [[ivfPqTopKStored]]. Resolve-then-verify on
    * all three version pins. */
  private def pqStoredLive(spark: org.apache.spark.sql.SparkSession,
      store: ParquetTableStore, codebookTable: String, codesTable: String,
      tombstoneTable: String, metaTable: String)
      : (DataFrame, Array[Array[Array[Double]]], PqMeta) = {
    val meta = pqMetaOf(spark, store, metaTable, "pqTopKStored")
    // resolve-then-verify each table against its pin (the
    // readBucketsOf discipline): refuse a mid-mutation state
    val (cbFrame, cbv) = store.readVersioned(spark, codebookTable)
    if (meta.cbV != cbv)
      throw new IllegalStateException(
        s"pq index mid-update: $metaTable pins codebook v${meta.cbV} " +
          s"but $codebookTable resolved v$cbv — retry after the " +
          "rebuild completes")
    val (codesAll, kv) = store.readVersioned(spark, codesTable)
    if (meta.codesV != kv)
      throw new IllegalStateException(
        s"pq index mid-update: $metaTable pins codes v${meta.codesV} " +
          s"but $codesTable resolved v$kv — retry after the mutation " +
          "completes")
    val tombResolved = if (store.exists(tombstoneTable))
      Some(store.readVersioned(spark, tombstoneTable)) else None
    val actualTomb = tombResolved.map(_._2).getOrElse(-1L)
    if (meta.tombV != actualTomb)
      throw new IllegalStateException(
        s"pq index mid-update: $metaTable pins tombstones " +
          s"v${meta.tombV} but $tombstoneTable resolved v$actualTomb " +
          "— retry after the reindex completes")
    val cbStored = pqCodebookOf(cbFrame, meta.m, meta.ks)
    val live = tombResolved.map(_._1) match {
      case None => codesAll
      case Some(t) => codesAll
        .join(broadcast(t.select(col("neighbor_id"), col("dead_below"))),
          Seq("neighbor_id"), "left")
        .filter(col("dead_below").isNull ||
          coalesce(col("gen"), lit(0L)) >= col("dead_below"))
    }
    (live.select(col("neighbor_id"), col("codes")), cbStored, meta)
  }

  /** THE DEPLOYMENT PROBE, stored and mutable end to end: the stored
    * IVF index generates candidates ([[ivfStoredCandidates]] —
    * pinned-codebook assignment, touched-cell bucket reads, live
    * per-cell cap) and the stored PQ codes rank them by ADC — no raw
    * corpus vector is read ANYWHERE. This is [[ivfPqTopK]]'s stored
    * twin and the shape a 100 TB vector service actually runs: both
    * index families mutate independently under the same log-
    * structured discipline (fold the same delta through
    * [[ivfReindexVectors]] AND [[pqReindexVectors]]); each probe leg
    * verifies its own version pins, so a torn state in EITHER family
    * refuses retryably — and the PAIR pin closes the cross-family
    * window: a probe landing between a paired mutator's IVF fold and
    * PQ fold would otherwise see two self-consistent families at
    * DIFFERENT corpus states (updated candidates ranked against stale
    * codes; fresh inserts silently dropped by the code join), so the
    * probe also verifies both resolved meta versions against the
    * pair-pin row [[ivfPqPairPin]] commits after BOTH folds, and
    * refuses retryably on divergence. The candidate re-attach carries
    * m CODE BYTES per candidate through a pinned SHUFFLE_HASH join —
    * never floats, never a corpus broadcast. Bit-identical to a
    * from-scratch [[ivfPqTopK]] over the mutated corpus under both
    * pinned codebooks (gate ss21). */
  def ivfPqTopKStored(queries: DataFrame, idCol: String, vecCol: String,
      store: ParquetTableStore, k: Int, probes: Int = 4,
      cellCap: Int = 10000, excludeSelfPairs: Boolean = true,
      ivfCodebookTable: String = "ivf_codebook",
      ivfMembersTable: String = "ivf_members",
      ivfTombstoneTable: String = "ivf_tombstones",
      ivfMetaTable: String = "ivf_meta",
      pqCodebookTable: String = "pq_codebook",
      pqCodesTable: String = "pq_codes",
      pqTombstoneTable: String = "pq_tombstones",
      pqMetaTable: String = "pq_meta",
      pairMetaTable: String = "ivfpq_pair_meta"): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val spark = queries.sparkSession
    val (cand, ivfMetaV) = ivfStoredCandidates(queries, idCol, vecCol,
      store, probes, cellCap, excludeSelfPairs, ivfCodebookTable,
      ivfMembersTable, ivfTombstoneTable, ivfMetaTable)
    val (liveCodes, cbStored, meta) = pqStoredLive(spark, store,
      pqCodebookTable, pqCodesTable, pqTombstoneTable, pqMetaTable)
    // PAIR-LEVEL consistency: both legs resolved self-consistent
    // states — now prove they are the SAME corpus state. The pin is
    // a store GROUP MARKER ([[graft.ops.ParquetTableStore
    // .commitGroup]] — one CAS over both meta versions, the
    // generalized multi-table commit) advanced only after both
    // folds, so a probe racing a paired mutation (or landing after a
    // crash between the folds) sees a marker behind at least one
    // resolved meta and refuses retryably.
    // marker first; a store written by the pre-group-marker revision
    // carries the pin as a one-row TABLE (ivf_meta_version,
    // pq_meta_version) instead — honor it as a read-only fallback so
    // existing stores keep answering, and let the next ivfPqPairPin /
    // ingest batch migrate it to the marker (which also drops the
    // stale table). Marker-absent AND table-absent refuses as before.
    val pairVs = store.groupVersions(pairMetaTable).getOrElse {
      if (store.exists(pairMetaTable)) {
        val r = store.read(spark, pairMetaTable)
          .select("ivf_meta_version", "pq_meta_version").head
        Map(ivfMetaTable -> r.getLong(0), pqMetaTable -> r.getLong(1))
      } else throw new IllegalStateException(
        s"ivfPqTopKStored: group marker $pairMetaTable missing — the " +
          "paired probe needs the cross-family pin committed after " +
          "BOTH folds (ivfPqPairPin; ivfPqIngest commits it every batch)")
    }
    val (pinIvf, pinPq) = (pairVs.getOrElse(ivfMetaTable, -1L),
      pairVs.getOrElse(pqMetaTable, -1L))
    if (pinIvf != ivfMetaV || pinPq != meta.metaV)
      throw new IllegalStateException(
        s"ivfpq pair mid-update: marker $pairMetaTable pins " +
          s"$ivfMetaTable v$pinIvf/$pqMetaTable v$pinPq " +
          s"but the metas resolved v$ivfMetaV/v${meta.metaV} — the two " +
          "families are at different corpus states (a paired mutation " +
          "is mid-flight, or crashed between its folds); retry after " +
          "the fold completes, or complete it and re-pin with " +
          "ivfPqPairPin")
    val qt = queries
      .select(col(idCol).cast("long").as("query_id"),
        graft.plans.PqKernels.pqAdcTable(col(vecCol), cbStored).as("__tbl"))
    val scored = cand
      .join(liveCodes.hint("shuffle_hash"), "neighbor_id")
      .join(broadcast(qt), "query_id")
      .select(col("query_id"), col("neighbor_id"),
        adcDist(meta.m, meta.ks).as("dist"))
    rankTopK(scored, "dist", k, asc = true)
  }

  /** THE PRODUCTION ANSWER SHAPE for the stored pair — shortlist-and-
    * rerank ([[ivfPqTopKStored]] + exact cosine), the composition
    * ss22's pinned non-monotonicity made necessary: raw ADC recall
    * does NOT improve with probes (more probes admit more ADC
    * impostors), so the deployed probe answers from a `shortlist`-
    * deep ADC candidate set per query (codes only — no raw corpus
    * floats move) and then re-attaches raw vectors for ONLY those
    * |Q|·shortlist pairs from `vectors` (the corpus the index
    * serves — typically the stored table itself) for an exact
    * cosine rerank. [[cosineScored]]'s join discipline: query side
    * broadcast by stats, corpus side pinned SHUFFLE_HASH — the
    * corpus is never broadcast and never shuffled as floats beyond
    * the shortlist rows. Inherits the pair-pin consistency refusals
    * (a torn or mid-update index pair refuses retryably before any
    * rerank work). Gate ss23 pins the whole chain bit-exact against
    * the unrolled oracle; the recall-recovery property itself is
    * ss22's spec. */
  def ivfPqRerankTopKStored(queries: DataFrame, vectors: DataFrame,
      idCol: String, vecCol: String, store: ParquetTableStore, k: Int,
      shortlist: Int, probes: Int = 4, cellCap: Int = 10000): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    require(shortlist >= k, s"shortlist $shortlist must be >= k=$k")
    val short = ivfPqTopKStored(queries, idCol, vecCol, store,
      k = shortlist, probes = probes, cellCap = cellCap)
      .select("query_id", "neighbor_id")
    rankTopK(cosineScored(short, queries, vectors, idCol, vecCol),
      "cos", k)
  }

  /** Commit the CROSS-FAMILY pair pin for the stored IVF-PQ index:
    * one GROUP MARKER ([[graft.ops.ParquetTableStore.commitGroup]])
    * CASed over the current versions of BOTH families' meta tables —
    * the store's generic multi-table commit, which this pin was the
    * round-14 bespoke prototype of. A paired mutator (both-family
    * build, both-family reindex, a compact of either family) calls
    * this AFTER its last family fold lands — [[ivfPqTopKStored]]
    * refuses retryably whenever either resolved meta diverges from
    * the marker, closing the window where each family is
    * self-consistent but the two sit at different corpus states.
    * [[graft.streaming.Streams.ivfPqIngest]] commits it every batch;
    * a crash before the pin leaves probes refusing until the
    * replayed batch re-folds (idempotently) and pins. Mutations on
    * one index pair are externally serialized (the bm25 contract);
    * the marker CAS turns any violation of that contract into a
    * retryable conflict instead of a silent overwrite. */
  def ivfPqPairPin(spark: org.apache.spark.sql.SparkSession,
      store: ParquetTableStore,
      ivfMetaTable: String = "ivf_meta",
      pqMetaTable: String = "pq_meta",
      pairMetaTable: String = "ivfpq_pair_meta"): Unit = {
    val iv = store.currentVersion(ivfMetaTable).getOrElse(
      throw new IllegalStateException(
        s"ivfPqPairPin: $ivfMetaTable missing — build the IVF family first"))
    val pv = store.currentVersion(pqMetaTable).getOrElse(
      throw new IllegalStateException(
        s"ivfPqPairPin: $pqMetaTable missing — build the PQ family first"))
    store.withCommitRetries() {
      store.commitGroup(Map(ivfMetaTable -> iv, pqMetaTable -> pv),
        store.groupPin(pairMetaTable))
    }
    // migrate-on-pin: a store written by the pre-marker revision kept
    // the pin as a one-row table under the same name — the marker now
    // supersedes it ([[ivfPqTopKStored]] resolves marker-first), so
    // drop the stale table rather than leave a lingering shadow pin
    // that a rollback could resurrect at an old corpus state
    if (store.exists(pairMetaTable)) store.dropTable(pairMetaTable)
    ()
  }

  /** BINARY SHORTLIST-AND-RERANK — the 1-bit member of the
    * quantization family deployed the way binary vectors actually
    * deploy: sign-bit Hamming distance (an angular-distance proxy,
    * see [[VectorCompression.binarize]]) generates a
    * `shortlist`-sized candidate set per query from 8-bytes-per-
    * 64-dims packed words alone, then ONLY those shortlist·|Q| pairs
    * re-attach raw vectors (stats-driven broadcast on the query
    * side, pinned SHUFFLE_HASH on the corpus side — the
    * [[pqRerankTopK]] discipline) for an exact cosine rerank.
    *
    * Scale shape: the corpus-wide pass scans packed longs against a
    * broadcast |Q|-row frame of query words — pure integer per-row
    * arithmetic, no shuffle until the shortlist window (rank ≤
    * shortlist plans as WindowGroupLimit); the float re-attach is
    * shortlist-bounded. Determinism: Hamming is an exact integer
    * (ties broken on neighbor_id), the rerank is the shared cosine
    * kernel — the whole chain is oracle-replicable, no epsilon. */
  def binaryRerankTopK(queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, k: Int, shortlist: Int, dim: Int,
      excludeSelfPairs: Boolean = true): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    require(shortlist >= k, s"shortlist $shortlist must be >= k=$k")
    import graft.ops.VectorCompression.{binarize, hamming}
    val qbits = queries.select(col(idCol).as("query_id"),
      binarize(col(vecCol), dim).as("q_bits"))
    val cbits = candidates.select(col(idCol).as("neighbor_id"),
      binarize(col(vecCol), dim).as("c_bits"))
    val scored = cbits.crossJoin(broadcast(qbits))
      .transform(dropSelfPairs(_, excludeSelfPairs))
      .select(col("query_id"), col("neighbor_id"),
        hamming(col("q_bits"), col("c_bits")).as("ham"))
    val short = rankTopK(scored, "ham", shortlist, asc = true)
      .select("query_id", "neighbor_id")
    rankTopK(
      cosineScored(short, queries, candidates, idCol, vecCol),
      "cos", k)
  }

  /** IVF-PQ — the production vector index (coarse cells prune the
    * corpus, PQ codes rank inside the probed cells): candidate
    * generation is [[ivfTopK]]'s cell machinery (sample codebook,
    * pinned cosine affinity, cellCap), but the scoring re-attach
    * carries m PQ CODES per candidate instead of dim floats, and
    * ranking is the ADC table-lookup fold. Non-residual variant
    * (codes quantize the raw vectors, not cell residuals) — the
    * residual refinement is a codebook-training concern the same
    * plumbing serves. At 100 TB: the cell index prunes the scan to
    * probes/numCentroids of the corpus, and what's left shuffles at
    * m bytes per vector. */
  def ivfPqTopK(queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, k: Int, numCentroids: Int,
      probes: Int, m: Int, ks: Int, dim: Int,
      cellCap: Int = 10000,
      excludeSelfPairs: Boolean = true): DataFrame = {
    val codebook = Ivf.sampleCodebook(candidates, idCol, vecCol, numCentroids)
    val capped = cappedMembers(candidates, idCol, vecCol, codebook, cellCap)
    val queryAssign = Ivf.assignmentsWithCodebook(queries, idCol, vecCol,
      codebook, probes)
      .select(col("id").as("query_id"), col("centroid_id"))
    val cand = queryAssign.join(capped, Seq("centroid_id"))
      .transform(dropSelfPairs(_, excludeSelfPairs))
      .select("query_id", "neighbor_id").distinct()
    // PQ scoring: candidates re-attach m CODES (not vectors)...
    val pqCb = pqCodebook(candidates, idCol, vecCol, m, ks, dim)
    val codes = candidates
      .select(col(idCol).cast("long").as("neighbor_id"),
        pqEncodeExpr(col(vecCol), pqCb).as("__codes"))
    // ...and the |Q|-sized table side broadcasts
    val qt = queries
      .select(col(idCol).cast("long").as("query_id"),
        graft.plans.PqKernels.pqAdcTable(col(vecCol), pqCb).as("__tbl"))
    val dist = (0 until m).map { j =>
      element_at(col("__tbl"),
        lit(j * ks + 1) + element_at(col("__codes"), j + 1))
    }.foldLeft(lit(0.0))(_ + _)
    val scored = cand
      .join(codes.hint("shuffle_hash"), "neighbor_id")
      .join(broadcast(qt), "query_id")
      .select(col("query_id"), col("neighbor_id"), dist.as("dist"))
    rankTopK(scored, "dist", k, asc = true)
  }

  /** METADATA-FILTERED ANN — "nearest neighbors WHERE label = x".
    * This is the pre-filter form: the predicate restricts the corpus
    * BEFORE indexing/probing, so top-k is exact over the qualifying
    * set (post-filtering an unfiltered ANN top-k under-returns when
    * the predicate is selective — the classic filtered-ANN trap,
    * spec-pinned). The predicate pushes into the candidate scan;
    * with IVF the index is built per filtered corpus — at 100 TB a
    * deployment keeps one stored index per hot partition-predicate
    * (the ss9 stored-index frames are the building block) and falls
    * back to pre-filter + brute force for rare predicates when the
    * qualifying set is small. */
  def filteredTopK(queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, k: Int,
      predicate: org.apache.spark.sql.Column,
      numCentroids: Int = 0, probes: Int = 4,
      cellCap: Int = 10000): DataFrame = {
    val qualifying = candidates.filter(predicate)
    if (numCentroids <= 0) bruteForceTopK(queries, qualifying, idCol, vecCol, k)
    else ivfTopK(queries, qualifying, idCol, vecCol, k, numCentroids,
      probes, cellCap)
  }

  /** Recall@k of an ANN result against exact ground truth: both
    * frames carry (query_id, neighbor_id) rows (any extra columns
    * ignored); returns one row per ground-truth query —
    * (query_id, hits, k), hits = |approx ∩ exact|. Integer-only
    * output: the standard ANN quality gate, runnable as a
    * verification query with no float-tolerance questions (the float
    * discipline lives in the two inputs' own rank pins). Queries the
    * approx side missed entirely still appear, with hits = 0.
    *
    * Scale shape: both inputs are k·|Q|-sized — the evaluation never
    * touches the corpus. One equi-join on (query_id, neighbor_id)
    * plus a map-side-combinable count; AQE broadcasts whichever side
    * is small (both are). */
  def recallAtK(exact: DataFrame, approx: DataFrame, k: Int): DataFrame = {
    val e = exact.select(col("query_id"), col("neighbor_id"))
    val a = approx.select(col("query_id"), col("neighbor_id"))
    val hits = e.join(a, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy(col("query_id")).agg(count(lit(1)).as("hits"))
    e.select(col("query_id")).distinct()
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("hits"), lit(0L)).as("hits"), lit(k).as("k"))
  }

  /** MAXIMAL-MARGINAL-RELEVANCE rerank (Carbonell & Goldstein 1998)
    * — the diversification stage of a retrieval stack: greedily pick
    * `k` of each query's candidates maximizing
    * `λ·rel − (1−λ)·max_sim_to_already_selected`, so near-duplicate
    * hits stop crowding the result list (for training-data work: the
    * anti-redundancy pass when retrieving context or few-shot pools).
    *
    * `candidates` carries (query_id, neighbor_id, cos) — any ANN
    * engine's output; `vectors` re-attaches candidate embeddings by
    * one k·|Q|-sized INNER join — a candidate whose id is absent
    * from `vectors` has no embedding to diversify against and is
    * DROPPED from the rerank (rerank against the same vector frame
    * the candidates were mined from, where the join is total by
    * construction). The vector column is cast to array<float>, so
    * float and double embeddings both work. Degenerate inputs never
    * stall the greedy argmax: a zero-norm vector's cosine (0/0)
    * counts as 0 similarity, and a NaN relevance score is skipped —
    * if only NaN-scored candidates remain, the list ends early
    * rather than emitting a bogus pick. The greedy loop runs per query inside
    * `mapGroups`: distributed ACROSS queries, sequential (bounded by
    * the candidate-list length) within one — the per-group arithmetic
    * is plain Scala over the SAME double shapes the oracles pin
    * (ascending-index dot folds, `dot/sqrt(dot·dot)` cosine,
    * `λ·rel − (1−λ)·maxSim` with `1−λ` computed in-engine), so the
    * selection and scores are bit-identical to the unrolled SQL
    * replica. Ties break on (score desc, id asc); the first pick's
    * diversity term is 0 by definition. */
  def mmrRerank(candidates: DataFrame, vectors: DataFrame, idCol: String,
      vecCol: String, k: Int, lambdaRel: Double = 0.7): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val spark = candidates.sparkSession
    import spark.implicits._
    val withVec = candidates
      .select(col("query_id").cast("long"), col("neighbor_id").cast("long"),
        col("cos").cast("double"))
      .join(vectors.select(col(idCol).cast("long").as("neighbor_id"),
        col(vecCol).cast("array<float>").as("__v")), Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("__v"))
      .as[(Long, Long, Double, Seq[Float])]
    def cosine(a: Seq[Float], b: Seq[Float]): Double = {
      var dab = 0.0; var daa = 0.0; var dbb = 0.0
      var i = 0
      while (i < a.length) {
        dab += a(i).toDouble * b(i).toDouble
        daa += a(i).toDouble * a(i).toDouble
        dbb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      // zero-norm vector: cosine is undefined (0/0) — treat as 0
      // similarity so a degenerate candidate can never poison the
      // greedy argmax with NaN (NaN fails > and ==, leaving no pick)
      val denom = math.sqrt(daa * dbb)
      if (denom == 0.0) 0.0 else dab / denom
    }
    withVec.groupByKey(_._1).flatMapGroups { (q, it) =>
      val cands = it.toArray
      val chosen = scala.collection.mutable.ArrayBuffer.empty[Int]
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Long, Double)]
      var rank = 1
      var exhausted = false
      while (!exhausted && rank <= math.min(k, cands.length)) {
        var bestIdx = -1
        var bestScore = Double.NegativeInfinity
        var bestId = Long.MaxValue
        var i = 0
        while (i < cands.length) {
          if (!chosen.contains(i)) {
            val c = cands(i)
            var maxSim = 0.0
            if (chosen.nonEmpty) {
              maxSim = Double.NegativeInfinity
              chosen.foreach { j =>
                val s = cosine(c._4, cands(j)._4)
                if (s > maxSim) maxSim = s
              }
            }
            val score = lambdaRel * c._3 - (1.0 - lambdaRel) * maxSim
            // a NaN score (NaN relevance in the input) is never a
            // valid pick — skip it rather than let it stall the argmax
            if (!score.isNaN && (score > bestScore ||
                (score == bestScore && c._2 < bestId))) {
              bestScore = score; bestIdx = i; bestId = c._2
            }
          }
          i += 1
        }
        if (bestIdx < 0) exhausted = true // only NaN-scored candidates remain
        else {
          chosen += bestIdx
          out += ((q, rank, bestId, bestScore))
          rank += 1
        }
      }
      out.iterator
    }.toDF("query_id", "mmr_rank", "neighbor_id", "score")
  }

  /** RECIPROCAL-RANK FUSION (Cormack, Clarke & Büttcher 2009) — the
    * standard hybrid-search combiner: each input ranking contributes
    * 1/(c + rank) per item, items missing from a list contribute 0,
    * and the fused top-`k` orders by (total score desc, id). The
    * modern retrieval stack is exactly this: a lexical ranking
    * ([[graft.ops.TextAnalysis.bm25TopK]]) fused with an embedding
    * ranking (any of the ANN engines here) — RRF needs no score
    * calibration between the two, only ranks.
    *
    * Each input's FIRST two columns must be (id, rank). Determinism:
    * every contribution is the same double on any engine
    * (1.0/(c + integer rank)), and the score sums the inputs in
    * ARGUMENT order as a plan-time expression (coalesce chain, no
    * runtime fold) — partitioning cannot move it.
    *
    * Scale shape: inputs are top-N ranking lists (k·|lists|-sized) —
    * the fusion itself never touches a corpus; the heavy lifting
    * stays in the input rankings, each already disciplined. The
    * full-outer join chain and the final window run on list-sized
    * frames. */
  def rrfFuse(rankings: Seq[DataFrame], k: Int, c: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    require(k >= 1, s"k must be positive, got $k")
    val sides = rankings.zipWithIndex.map { case (r, i) =>
      r.select(col(r.columns(0)).as("id"),
        (lit(1.0) / (lit(c.toDouble) + col(r.columns(1)).cast("double")))
          .as(s"__c$i"))
    }
    val joined = sides.reduce((a, b) => a.join(b, Seq("id"), "full_outer"))
    val score = sides.indices
      .map(i => coalesce(col(s"__c$i"), lit(0.0)))
      .reduce(_ + _)
    val w = Window.orderBy(col("score").desc, col("id").asc)
    joined.withColumn("score", score)
      .orderBy(col("score").desc, col("id").asc).limit(k)
      .withColumn("rank", row_number().over(w))
      .select(col("rank"), col("id"), round(col("score"), 6).as("score_r"))
  }
}
