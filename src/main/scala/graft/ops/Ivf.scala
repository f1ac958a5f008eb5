package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.VectorKernels

/** IVF-style coarse quantization: assign every vector to its nearest
  * coarse-centroid cell(s), giving dedup/ANN a block key whose cell
  * population is ~n/numCentroids instead of corpus-sized.
  *
  * The codebook is a deterministic SAMPLE: the `numCentroids`
  * lowest-id vectors (IVF with a sample-initialized codebook — the
  * standard zero-iteration construction; Lloyd refinement would
  * improve cell balance but costs driver-coordinated passes and makes
  * the result engine-unportable). Determinism is what lets the DuckDB
  * oracle replicate the whole pipeline bit-for-bit.
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

  /** (id, centroid_id) pairs — one row per (vector, probe). Ranking
    * is by cosine DESC with centroid id as the tie-break, so the
    * assignment is total and engine-portable. */
  def assignments(df: DataFrame, idCol: String, vecCol: String,
      numCentroids: Int, probes: Int = 1): DataFrame = {
    require(numCentroids >= 1 && probes >= 1)
    val anchors = df
      .select(col(idCol).as("centroid_id"), col(vecCol).as("vec"))
      .orderBy(col("centroid_id")).limit(numCentroids)
      .agg(collect_list(struct(col("centroid_id"), col("vec"))).as("__anchors"))
    // per-row: rank anchors by (-cos, cid) via struct array_sort; the
    // final sort is total, so collect_list's nondeterministic order
    // can't leak into the result
    df.select(col(idCol).as("id"), col(vecCol).as("__vec"))
      .crossJoin(broadcast(anchors))
      .select(col("id"),
        slice(array_sort(transform(col("__anchors"), a =>
          struct((lit(0.0) - VectorKernels.cosineSim(col("__vec"), a.getField("vec"))).as("neg"),
            a.getField("centroid_id").as("cid")))), 1, probes).as("__top"))
      .select(col("id"), explode(col("__top")).as("__p"))
      .select(col("id"), col("__p.cid").as("centroid_id"))
  }
}
