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

  /** [[kmeansTrain]]'s result: the final (cid, cvec) centroid frame,
    * the Lloyd rounds actually run, and (tol mode only) the
    * per-round mean spherical distortion avg(1 − cos). */
  final case class KmeansResult(centroids: DataFrame, iters: Int,
      objectives: Seq[Double])

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

  /** DISTRIBUTED Lloyd training to convergence — the corpus-scale
    * twin of [[lloydRefine]] (which holds its codebook on the
    * driver): centroids stay a FRAME end to end, each iteration is
    * one broadcast-anchor assignment pass (O(n·k) compute, zero
    * corpus shuffle) plus one (cell, pos) update exchange, and the
    * only driver value ever materialized is the per-iteration
    * objective scalar (tol mode). Iterates the EXACT ss7 step:
    * assignment by (cos DESC, cid) against the current centroids,
    * update = per-cell component-wise mean; empty cells keep their
    * previous vector. `ordered = true` folds each (cell, pos) sum in
    * id order (the ss6/ss7 window discipline) so the whole N-round
    * recurrence is bit-reproducible cross-engine — the ss18 gate
    * unrolls it in SQL; `ordered = false` (default) is the
    * production path whose groupBy sum gets map-side partial
    * combine (shuffle O(cells·dim·partitions), not O(n·dim)).
    *
    * `tol > 0` stops BEFORE the round whose assignment objective
    * (mean spherical distortion, avg(1 − cos(x, c(x)))) improved by
    * less than tol over the previous round — the distortion action
    * is only paid in this mode. Initial centroids are the
    * deterministic lowest-id sample (the [[assignments]]
    * convention), cast to double. Returns the final (cid, cvec)
    * centroid frame (parquet-materialized, safe to use after the
    * internal stages are freed), the rounds actually run, and — in
    * tol mode — the per-round objective sequence (the looped ss7
    * guarantee, observable). */
  def kmeansTrain(df: DataFrame, idCol: String, vecCol: String,
      numCentroids: Int, maxIters: Int, tol: Double = 0.0,
      ordered: Boolean = false): KmeansResult = {
    require(numCentroids >= 1, "numCentroids must be >= 1")
    require(maxIters >= 1, "maxIters must be >= 1")
    require(tol >= 0.0, "tol must be >= 0")
    val spark = df.sparkSession
    val staged = scala.collection.mutable.ArrayBuffer.empty[
      org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]]
    def stage(d: DataFrame): DataFrame = {
      val rdd = d.rdd.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      staged += rdd
      spark.createDataFrame(rdd, d.schema)
    }
    try {
      val corpus = stage(df.select(col(idCol).cast("long").as("id"),
        col(vecCol).as("__vec")))
      var cent = stage(corpus.orderBy("id").limit(numCentroids)
        .select(col("id").as("cid"),
          col("__vec").cast("array<double>").as("cvec")))
      var prevObj = Double.MaxValue
      val objectives = scala.collection.mutable.ArrayBuffer.empty[Double]
      var it = 0
      var stop = false
      while (it < maxIters && !stop) {
        val anchors = cent
          .select(col("cid").as("centroid_id"), col("cvec").as("vec"))
          .agg(collect_list(struct(col("centroid_id"), col("vec")))
            .as("__anchors"))
        // the per-round assignment is CORPUS-sized (unlike the k-row
        // centroid leaves) — persisted for its within-round reuse
        // (objective + fold) and freed as soon as the round's k-row
        // update is materialized, so a long tol-mode run holds ONE
        // corpus copy, not iters copies
        val assignedPlan = corpus.crossJoin(broadcast(anchors))
          .select(col("id"), col("__vec"),
            explode(VectorKernels.ivfTopCells(col("__vec"),
              col("__anchors"), 1)).as("cid"))
        val assignedRdd = assignedPlan.rdd.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val assigned = spark.createDataFrame(assignedRdd, assignedPlan.schema)
        try {
          if (tol > 0.0) {
            val obj = assigned.join(cent, "cid")
              .agg(avg(lit(1.0) -
                VectorKernels.cosineSim(col("__vec"), col("cvec"))))
              .head.getDouble(0)
            objectives += obj
            stop = prevObj - obj < tol
            prevObj = obj
          }
          if (!stop) {
            val foldLong = VectorAggregates.labelCentroids(
              assigned.select(col("cid"), col("id"), col("__vec")),
              "cid", "id", "__vec", ordered)
            val newVecs = foldLong.groupBy("cid")
              .agg(transform(
                array_sort(collect_list(struct(col("pos"), col("centroid")))),
                x => x.getField("centroid")).as("nvec"))
            cent = stage(cent.join(newVecs, Seq("cid"), "left")
              .select(col("cid"),
                coalesce(col("nvec"), col("cvec")).as("cvec")))
            // force the k-row leaf while the assignment is still
            // cached; the unpersist below must not trigger a re-derive
            cent.count()
            it += 1
          }
        } finally assignedRdd.unpersist(blocking = false)
      }
      val dir = Scratch.tempDir("graft-kmeans-")
      cent.write.mode("overwrite").parquet(dir)
      KmeansResult(spark.read.parquet(dir), it, objectives.toSeq)
    } finally staged.foreach(_.unpersist(blocking = false))
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
