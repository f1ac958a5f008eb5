package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over near-duplicate pair graphs — the
  * transitive-closure step between pair mining ([[Dedup]] d2/d4/d5/d7
  * outputs) and cluster-level decisions (keep one doc per duplicate
  * CLASS, not per pair; the greedy pair drop in
  * [[Dedup.dropPairedDuplicates]] is the cheap approximation, this is
  * the exact one).
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC 2014) —
  * converges in O(log n) rounds on any graph, vs. graph-diameter
  * rounds for naive min-label propagation (a pathological near-dup
  * chain is exactly where naive propagation degrades). Each round is
  * two aggregate+join passes over the edge list, all key shuffles —
  * nothing is ever collected to the driver and no per-node adjacency
  * list is materialized (high-degree nodes stay distributed).
  */
object ConnectedComponents {

  /** Map every id in `pairs(id_a, id_b)` to the smallest id reachable
    * through the pair graph (its cluster representative). Output:
    * (id, cluster_id), one row per distinct id in `pairs`; roots map
    * to themselves.
    *
    * Materialization contract: iterative convergence requires
    * per-round actions, so unlike the lazy pair miners this operator
    * is EAGER — `pairs` is evaluated exactly once, rounds
    * persist/unpersist deterministically (zero retained blocks on
    * return), and the fixpoint is staged to `scratchDir` (a temp dir
    * by default) and returned as a clean parquet scan, so callers can
    * re-join it repeatedly without recompute. At cluster scale this is
    * the standard shape for a CC job: checkpoint the fixpoint to
    * storage, read it back.
    */
  def duplicateClusters(pairs: DataFrame, maxRounds: Int = 50,
      scratchDir: Option[String] = None): DataFrame = {
    val spark = pairs.sparkSession
    val p = pairs.select(col(pairs.columns(0)).cast("long").as("u"),
        col(pairs.columns(1)).cast("long").as("v"))
      .where(col("u").isNotNull && col("v").isNotNull &&
        col("u") =!= col("v"))

    // Each round references the previous edge set several times; left
    // as nested logical plans that's an exponential TREE (measured: an
    // OOM in plan stringification before round 10). Staging every
    // round through a persisted RDD makes it a LogicalRDD LEAF —
    // constant plan size, each round computed exactly once. All
    // rounds' blocks are freed together on return (edge sets are
    // pair-graph-sized, far below corpus scale, and spill to disk).
    val staged = scala.collection.mutable.ArrayBuffer.empty[
      org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]]
    def stage(df: DataFrame): DataFrame = {
      val rdd = df.rdd.persist(StorageLevel.MEMORY_AND_DISK)
      staged += rdd
      spark.createDataFrame(rdd, df.schema)
    }
    def freeAll(): Unit = staged.foreach(_.unpersist(blocking = false))

    try {
      var e = stage(canonical(p))
      var n = e.count()
      var rounds = 0
      var converged = n == 0
      while (!converged && rounds < maxRounds) {
        val next = stage(smallStar(largeStar(e)))
        val m = next.count()
        // distinct sets of equal size with an empty one-sided
        // difference are equal — a full L∘S round that was a no-op
        // makes every later round a no-op too.
        converged = m == n && next.exceptAll(e).limit(1).count() == 0
        e = next
        n = m
        rounds += 1
      }
      if (!converged) throw new IllegalStateException(
        s"connected components did not converge in $maxRounds rounds")
      // Fixpoint is a star forest with every edge (root=component min,
      // leaf): leaves label from their root, roots label themselves.
      val labels = e.select(col("hi").as("id"), col("lo").as("cluster_id"))
        .unionByName(e.select(col("lo").as("id"), col("lo").as("cluster_id")))
        .distinct()
      // default scratch is JVM-exit-cleaned (Scratch); long-running
      // callers pass scratchDir and reuse it per batch
      val dir = scratchDir.getOrElse(Scratch.tempDir("graft-cc-"))
      labels.write.mode("overwrite").parquet(dir)
      spark.read.parquet(dir)
    } finally freeAll()
  }

  /** INCREMENTAL cluster maintenance: fold a NEW batch's pair graph
    * into an existing (id, cluster_id) label map without
    * re-clustering the corpus — the d10 discipline applied to the
    * transitive closure. New pairs have their endpoints REWRITTEN to
    * their stored representatives (unknown ids represent
    * themselves), the fixpoint then runs on that rep graph — sized
    * by the DELTA's connectivity, not the corpus — and the resulting
    * rep→rep merges are joined back over the stored map in one pass.
    *
    * Labels keep the min-id invariant: every stored rep is already
    * its component's min, and the rep-graph CC takes the min of
    * merged reps, so the final label is the global min id of the
    * merged component — EXACTLY what from-scratch clustering over
    * (old ∪ new) pairs produces (gate d12 pins this identity against
    * a full recursive-CTE oracle).
    *
    * Output: one row per id in `stored` ∪ ids(newPairs), labeled
    * (id, cluster_id). Scale shape: two broadcast-or-shuffle joins
    * keyed by id to rewrite endpoints + one join to relabel the
    * stored map; the EAGER fixpoint (the only iterative part)
    * touches only the delta's rep edges. */
  def mergeClusters(stored: DataFrame, newPairs: DataFrame,
      scratchDir: Option[String] = None,
      driverMaxEdges: Int = 0): DataFrame =
    mergedWithProvenance(stored, newPairs, scratchDir, driverMaxEdges)
      .select("id", "cluster_id")

  /** The CHANGED subset of [[mergeClusters]]'s output — ids whose
    * label coarsened in this fold plus ids new to the table: exactly
    * the rows an O(delta) keyed upsert must write (labels only move
    * toward the component min, so the unchanged majority is
    * byte-identical to the stored version and hard-links across).
    * Same plan as [[mergeClusters]] — the relabel join already knows
    * which reps moved — so this costs no extra pass over the stored
    * table. */
  def mergeClustersChanged(stored: DataFrame, newPairs: DataFrame,
      scratchDir: Option[String] = None,
      driverMaxEdges: Int = 0): DataFrame =
    mergedWithProvenance(stored, newPairs, scratchDir, driverMaxEdges)
      .filter(col("__changed"))
      .select("id", "cluster_id")

  private def mergedWithProvenance(stored: DataFrame, newPairs: DataFrame,
      scratchDir: Option[String] = None,
      driverMaxEdges: Int = 0): DataFrame = {
    val lbl = stored.select(col(stored.columns(0)).cast("long").as("__id"),
      col(stored.columns(1)).cast("long").as("__rep"))
    val p = newPairs.select(
      col(newPairs.columns(0)).cast("long").as("u"),
      col(newPairs.columns(1)).cast("long").as("v"))
      .where(col("u").isNotNull && col("v").isNotNull)
    def rewrite(side: String): DataFrame => DataFrame = df =>
      df.join(lbl.select(col("__id").as(side), col("__rep").as(s"__r_$side")),
          Seq(side), "left")
        .withColumn(side, coalesce(col(s"__r_$side"), col(side)))
        .drop(s"__r_$side")
    val repEdges = rewrite("v")(rewrite("u")(p))
      .where(col("u") =!= col("v"))
    // The fixpoint runs on rep-graph edges only (delta-sized); an
    // empty rep graph (batch connects nothing) skips it entirely.
    // With driverMaxEdges > 0, a rep graph at or under the bound is
    // labeled by a driver-side union-find instead: the rep graph is
    // bounded by the batch's pair count — ingest-batch-sized BY THE
    // SAME CONTRACT that lets the incremental probe broadcast the
    // batch side — and the distributed fixpoint costs tens of fixed-
    // overhead stages per round, which dominates per-batch latency
    // at exactly the delta sizes streaming ingest produces. One
    // limit-collect decides: if it returns ≤ driverMaxEdges rows it
    // IS the whole rep graph (labeled exactly, min-id invariant
    // preserved); one extra row falls back to the staged
    // large/small-star fixpoint unchanged.
    val merges =
      if (driverMaxEdges > 0) {
        val sample = repEdges.select(col("u"), col("v"))
          .limit(driverMaxEdges + 1).collect()
        if (sample.length <= driverMaxEdges) {
          val spark = repEdges.sparkSession
          import spark.implicits._
          driverLabels(sample.iterator.map(r => (r.getLong(0), r.getLong(1))))
            .toDF("id", "cluster_id")
        } else duplicateClusters(repEdges, scratchDir = scratchDir)
      } else if (repEdges.isEmpty) repEdges.sparkSession.emptyDataFrame
        .select(lit(0L).as("id"), lit(0L).as("cluster_id")).limit(0)
      else duplicateClusters(repEdges, scratchDir = scratchDir)
    val m = merges.select(col("id").as("__m_id"),
      col("cluster_id").as("__m_rep"))
    // every id we must label: the stored corpus plus the batch's ids.
    // Provenance rides along (__new = id absent from the table;
    // __m_rep hit + differs = label coarsened) so the CHANGED subset
    // — exactly what an O(delta) keyed upsert must write — falls out
    // of the SAME relabel join, no second pass over the stored table.
    val batchIds = p.select(col("u").as("__id"))
      .unionByName(p.select(col("v").as("__id"))).distinct()
      .join(lbl.select("__id"), Seq("__id"), "left_anti")
      .withColumn("__rep", col("__id"))
    lbl.withColumn("__new", lit(false))
      .unionByName(batchIds.withColumn("__new", lit(true)))
      .join(m, col("__rep") === col("__m_id"), "left")
      .select(col("__id").as("id"),
        coalesce(col("__m_rep"), col("__rep")).as("cluster_id"),
        (col("__new") || (col("__m_rep").isNotNull &&
          col("__m_rep") =!= col("__rep"))).as("__changed"))
  }

  /** Exact min-id component labels for a small edge list, computed
    * with a union-find that always attaches the larger root under
    * the smaller — so every root IS its component's minimum id and
    * the output matches [[duplicateClusters]] row for row. Returns
    * one (node, minId) per distinct node in `edges`. */
  private def driverLabels(edges: Iterator[(Long, Long)]): Seq[(Long, Long)] = {
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    val nodes = scala.collection.mutable.HashSet.empty[Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x
      while (parent.getOrElse(c, c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    edges.foreach { case (u, v) =>
      if (u != v) {
        nodes += u; nodes += v
        val (ru, rv) = (find(u), find(v))
        if (ru != rv) {
          val (lo, hi) = if (ru < rv) (ru, rv) else (rv, ru)
          parent(hi) = lo
        }
      }
    }
    nodes.iterator.map(n => (n, find(n))).toSeq.sorted
  }

  /** Undirected edge in canonical (lo < hi) form, self-loops dropped. */
  private def canonical(df: DataFrame): DataFrame =
    df.select(least(col("u"), col("v")).as("lo"),
        greatest(col("u"), col("v")).as("hi"))
      .where(col("lo") =!= col("hi")).distinct()

  /** Connect each node's strictly-larger neighbors to the minimum of
    * its closed neighborhood. The min is ≤ the node < the neighbor,
    * so the output is canonical by construction. */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.select(col("lo").as("n"), col("hi").as("m"))
      .unionByName(e.select(col("hi").as("n"), col("lo").as("m")))
    val mins = sym.groupBy("n").agg(min("m").as("mn"))
      .select(col("n"), least(col("n"), col("mn")).as("lab"))
    sym.where(col("m") > col("n"))
      .join(mins, "n")
      .select(col("lab").as("lo"), col("m").as("hi"))
      .where(col("lo") =!= col("hi")).distinct()
  }

  /** Orient each edge towards its larger endpoint, then connect that
    * endpoint and its smaller neighbors to the smallest of them. */
  private def smallStar(e: DataFrame): DataFrame = {
    val mins = e.groupBy("hi").agg(min("lo").as("mn"))
    e.join(mins, "hi")
      .select(col("mn").as("lo"), col("lo").as("hi"))
      .unionByName(mins.select(col("mn").as("lo"), col("hi")))
      .where(col("lo") =!= col("hi")).distinct()
  }
}
