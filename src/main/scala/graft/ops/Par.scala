package graft.ops

import org.apache.spark.sql.DataFrame

/** Scale-adaptive parallelism helpers. */
object Par {

  /** Fan a frame out to the session's full parallelism BEFORE a
    * CPU-heavy per-row stage (feature explosion, per-token hashing,
    * tokenization) — but only when the frame's PLANNED parallelism is
    * below the core count.
    *
    * Why this exists (guide §2.5 "input skew", and the round-16
    * sf1skew post-mortem): scan-side pipelines inherit the file
    * layout's parallelism until the first exchange. A small table
    * written as one parquet file (or one row group) hands the whole
    * scan→explode→hash→partial-agg pipeline to 1-3 tasks, and a
    * feature pass that costs 100× the scan serializes on one core
    * while the rest of the machine idles — measured: the DSIR
    * char-gram pass over the sf0.1 documents table ran as a single
    * 8-10 s task with 31 cores idle.
    *
    * Why it is safe at 100 TB: the condition `planned partitions <
    * defaultParallelism` is FALSE for any at-scale input (a 100 TB
    * scan plans orders of magnitude more splits than the cluster has
    * cores), so the exchange never fires where shuffling the corpus
    * would be the failure mode — the repartition only triggers where
    * its cost (one pass of a sub-core-count input) is trivially
    * bought back by the parallel heavy stage. Callers apply it ONLY
    * above order-insensitive aggregation (integer counts, sorted
    * folds) — every catalog gate re-proves value equality against
    * the DuckDB oracle. */
  def fanOut(df: DataFrame): DataFrame = {
    // Fan ONLY scan-shaped frames (projections/filters/unions over
    // leaf relations). Two reasons, both measured in the round-16
    // battery: (a) the partition probe below plans the frame once
    // more than the real query does, which is free for a scan but
    // doubles a composed pipeline's analysis cost (tp10/tp11
    // regressed 2-4 s from exactly that); (b) a composed input has
    // exchanges upstream, so its parallelism is already the
    // session's — the wedge this helper exists for is the
    // scan-inherits-file-layout case only.
    import org.apache.spark.sql.catalyst.plans.logical._
    def scanShaped(p: LogicalPlan): Boolean = p match {
      case _: LeafNode => true
      case u: Union => u.children.forall(scanShaped)
      case pr: Project => scanShaped(pr.child)
      case f: Filter => scanShaped(f.child)
      case s: SubqueryAlias => scanShaped(s.child)
      case _ => false
    }
    if (!scanShaped(df.queryExecution.analyzed)) df
    else {
      val spark = df.sparkSession
      val target = spark.sparkContext.defaultParallelism
      // Planned-split ESTIMATE from logical stats — the round-16
      // probe (`df.rdd.getNumPartitions`) forced physical planning +
      // an RDD conversion per call, a fixed tax per wrapped operator
      // invocation (paid per iteration in probe-loop gates). The
      // estimate mirrors FilePartition.maxSplitBytes: splitSize =
      // min(maxPartitionBytes, max(openCostInBytes, bytes/target)),
      // so a sub-(target·openCost) input reads "fewer splits than
      // cores" exactly where the old probe did, and any at-scale
      // input (stats ≥ cores × 128 MB) stays untouched. Stats come
      // from the already-analyzed logical plan (file-listing sizes
      // for scans — no job, no physical plan).
      val conf = spark.sessionState.conf
      val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
      val maxSplit = BigInt(conf.filesMaxPartitionBytes)
      val openCost = BigInt(conf.filesOpenCostInBytes).max(BigInt(1))
      val splitSize = maxSplit.min(openCost.max(bytes / target))
      val estSplits = ((bytes + splitSize - 1) / splitSize).max(BigInt(1))
      if (estSplits >= target) df
      else df.repartition(target)
    }
  }
}
