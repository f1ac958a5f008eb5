package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.VectorKernels

/** IVF-style coarse quantization: assign every vector to its nearest
  * coarse-centroid cell(s), giving dedup/ANN a block key whose cell
  * population is ~n/numCentroids instead of corpus-sized.
  *
  * The default codebook is a deterministic SAMPLE: the `numCentroids`
  * lowest-id vectors (IVF with a sample-initialized codebook — the
  * standard zero-iteration construction). Determinism is what lets
  * the DuckDB oracle replicate the whole pipeline bit-for-bit, so the
  * sample codebook stays the oracle-checked default.
  *
  * [[lloydRefine]] is the OPT-IN balance path: a few
  * driver-coordinated spherical-k-means iterations (assign → per-cell
  * mean) that move a clumped sample codebook toward the data's real
  * structure. The refined codebook is a plain driver value fed to
  * [[assignmentsWithCodebook]] — per-iteration cost is one assignment
  * pass plus one map-side-combinable (cell, component) aggregation,
  * and the driver only ever holds k·dim doubles. Float-mean summation
  * order makes the refined centroids engine-specific, so this path is
  * deliberately NOT oracle-replicated (IvfSpec asserts its invariants
  * instead: monotone quantization quality, improved cell balance on a
  * clumped fixture).
  *
  * `probes` > 1 is the IVF answer to boundary pairs: each vector
  * lands in its `probes` nearest cells, so two near-identical vectors
  * straddling a cell boundary still co-occur in one cell with
  * probability ≈ 1. (LSH gets the same effect from multiple tables.)
  *
  * Scale shape: the codebook (numCentroids rows) is collapsed to ONE
  * array row and broadcast — small BY CONSTRUCTION (k ≪ n), unlike
  * the round-1 corpus broadcast this replaces. Assignment is then a
  * per-row argsort over the anchor array: O(n·k) compute,
  * embarrassingly parallel, ZERO shuffle of the corpus (a join+window
  * formulation would shuffle n·k scored rows just to rank them).
  */
object Ivf {

  /** Codebook as a driver value: (centroid_id, vector). k·dim
    * doubles — tiny by construction. */
  type Codebook = Seq[(Long, Seq[Double])]

  /** (id, centroid_id) pairs — one row per (vector, probe), against
    * the in-plan sample codebook (the oracle-checked default). */
  def assignments(df: DataFrame, idCol: String, vecCol: String,
      numCentroids: Int, probes: Int = 1): DataFrame = {
    require(numCentroids >= 1 && probes >= 1)
    val anchors = df
      .select(col(idCol).as("centroid_id"), col(vecCol).as("vec"))
      .orderBy(col("centroid_id")).limit(numCentroids)
      .agg(collect_list(struct(col("centroid_id"), col("vec"))).as("__anchors"))
    assignAgainst(df, idCol, vecCol, anchors, probes)
      .select("id", "centroid_id")
  }

  /** (id, centroid_id) pairs against an explicit driver-held
    * codebook (e.g. a [[lloydRefine]] result). */
  def assignmentsWithCodebook(df: DataFrame, idCol: String, vecCol: String,
      codebook: Codebook, probes: Int = 1): DataFrame = {
    require(codebook.nonEmpty && probes >= 1)
    assignAgainst(df, idCol, vecCol, anchorsFrame(df, codebook), probes)
      .select("id", "centroid_id")
  }

  /** The sample codebook as a driver value — the same `numCentroids`
    * lowest-id vectors [[assignments]] derives in-plan. CONTRACT: ids
    * must be numeric (castable to long) — a string id would cast to
    * null here while [[assignments]] orders the raw column, silently
    * disagreeing about which vectors anchor the cells. */
  def sampleCodebook(df: DataFrame, idCol: String, vecCol: String,
      numCentroids: Int): Codebook =
    df.select(col(idCol).cast("long").as("cid"), col(vecCol).as("v"))
      .orderBy("cid").limit(numCentroids)
      .collect()
      .map(r => (r.getLong(0),
        r.getSeq[Number](1).map(_.doubleValue()).toIndexedSeq))
      .toIndexedSeq

  /** `iters` spherical-k-means passes: assign each vector to its
    * nearest (cosine) centroid, replace each centroid with its cell's
    * component-wise mean (cosine ignores scale, so the mean needs no
    * normalization). Empty cells keep their previous vector. Each
    * pass is one distributed assignment + one aggregation whose
    * map-side partial combine shrinks the shuffle to
    * O(cells·dim·partitions); only k·dim means reach the driver. */
  def lloydRefine(df: DataFrame, idCol: String, vecCol: String,
      codebook: Codebook, iters: Int = 2): Codebook = {
    require(iters >= 0)
    var cb = codebook
    var it = 0
    while (it < iters) {
      val means = assignAgainst(df, idCol, vecCol, anchorsFrame(df, cb), probes = 1)
        .select(col("centroid_id"), posexplode(col("__vec")))
        .groupBy(col("centroid_id"), col("pos"))
        .agg(avg(col("col").cast("double")).as("m"))
        .collect()
        .groupBy(_.getLong(0))
        .map { case (cid, rows) =>
          cid -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toIndexedSeq }
      cb = cb.map { case (cid, v) => (cid, means.getOrElse(cid, v)) }
      it += 1
    }
    cb
  }

  /** A driver codebook as the same one-row broadcastable anchors
    * frame [[assignments]] builds in-plan. */
  private def anchorsFrame(df: DataFrame, codebook: Codebook): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    codebook.toDF("centroid_id", "vec")
      .agg(collect_list(struct(col("centroid_id"), col("vec"))).as("__anchors"))
  }

  /** Shared assignment tail: per-row rank of the broadcast anchor
    * array by (cos DESC, cid) — total ordering, so collect_list's
    * nondeterministic order can't leak into the result — via the
    * native [[VectorKernels.ivfTopCells]] kernel (round 4: the
    * composed slice(array_sort(transform(...))) form evaluated
    * interpreted and measured degrading ~10× in long sessions;
    * ranking semantics are identical, IvfKernelParitySpec). Keeps the
    * vector column for callers that need it (the Lloyd mean). */
  private def assignAgainst(df: DataFrame, idCol: String, vecCol: String,
      anchors: DataFrame, probes: Int): DataFrame =
    df.select(col(idCol).as("id"), col(vecCol).as("__vec"))
      .crossJoin(broadcast(anchors))
      .select(col("id"), col("__vec"),
        explode(VectorKernels.ivfTopCells(col("__vec"), col("__anchors"), probes))
          .as("centroid_id"))
}
