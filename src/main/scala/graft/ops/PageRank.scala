package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** PageRank over an edge list — the iterative-importance companion to
  * the [[ConnectedComponents]] fixpoint: where CC answers "which rows
  * are the same thing", PageRank answers "which nodes matter", the
  * ranking a curation pipeline runs over citation/link/co-occurrence
  * graphs to weight sources.
  *
  * Distributed shape (the canonical one): per iteration, ONE src-keyed
  * join attaches (rank, outdeg) to each edge and ONE dst-keyed
  * aggregate sums the incoming contributions — two key shuffles over
  * edge-sized data, nothing node- or corpus-sized ever broadcasts or
  * collects. Rank vectors are node-sized rows, re-staged each
  * iteration through a persisted RDD leaf (the CC discipline: constant
  * plan size instead of an exponentially nesting logical tree), all
  * blocks freed on return, the final vector staged to parquet and
  * handed back as a clean scan.
  *
  * Semantics contract (pinned for the oracle): r₀ = 1/N;
  * rᵢ₊₁(v) = (1−d)/N + d·Σ_{(u,v)∈E} rᵢ(u)/outdeg(u). Dangling-node
  * mass is NOT redistributed (the simplified recurrence both engines
  * replicate term-for-term); self-loops are dropped at edge
  * derivation. */
object PageRank {

  /** Directed co-order edges: within each order, the part on line i
    * points at the part on line i+1 — the basket-transition graph.
    * One (orderkey) window pass, distinct edges, self-loops dropped.
    * The window order is (linenumber, partkey) — the fixture carries
    * duplicate (orderkey, linenumber) pairs, so linenumber alone is
    * not total and lead() would be NONDETERMINISTIC (worse than a
    * flaky gate: DuckDB inlines CTEs, so each oracle reference of the
    * edge set would re-draw a different graph). Tied (linenumber,
    * partkey) rows are value-identical, so the led value sequence is
    * deterministic under this order. */
  def coOrderEdges(lineitem: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("l_orderkey"))
      .orderBy(col("l_linenumber"), col("l_partkey"))
    lineitem.select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
      .withColumn("__dst", lead(col("l_partkey"), 1).over(w))
      .filter(col("__dst").isNotNull && col("__dst") =!= col("l_partkey"))
      .select(col("l_partkey").as("src"), col("__dst").as("dst"))
      .distinct()
  }

  /** (id, r): damped PageRank after exactly `iterations` rounds. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int, damping: Double = 0.85,
      scratchDir: Option[String] = None): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    require(damping > 0 && damping < 1, "damping must be in (0, 1)")
    val spark = edges.sparkSession

    val staged = scala.collection.mutable.ArrayBuffer.empty[
      org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]]
    def stage(df: DataFrame): DataFrame = {
      val rdd = df.rdd.persist(StorageLevel.MEMORY_AND_DISK)
      staged += rdd
      spark.createDataFrame(rdd, df.schema)
    }
    def freeAll(): Unit = staged.foreach(_.unpersist(blocking = false))

    try {
      // edges and out-degrees are read every iteration — stage once
      val e = stage(edges
        .select(col(srcCol).cast("long").as("src"),
          col(dstCol).cast("long").as("dst"))
        .where(col("src").isNotNull && col("dst").isNotNull &&
          col("src") =!= col("dst"))
        .distinct())
      val nodes = stage(e.select(col("src").as("id"))
        .unionByName(e.select(col("dst").as("id"))).distinct())
      val deg = stage(e.groupBy("src")
        .agg(count(lit(1)).cast("double").as("outdeg")))
      val n = nodes.count().toDouble

      var ranks = nodes.select(col("id"), lit(1.0 / n).as("r"))
      for (_ <- 1 to iterations) {
        val contrib = e.join(deg, "src")
          .join(ranks.withColumnRenamed("id", "src"), "src")
          .select(col("dst").as("id"), (col("r") / col("outdeg")).as("c"))
          .groupBy("id").agg(sum(col("c")).as("inc"))
        ranks = stage(nodes.join(contrib, Seq("id"), "left")
          .select(col("id"),
            (lit((1.0 - damping) / n) +
              lit(damping) * coalesce(col("inc"), lit(0.0))).as("r")))
      }
      // default scratch is JVM-exit-cleaned (Scratch); long-running
      // callers pass scratchDir and reuse it per batch
      val dir = scratchDir.getOrElse(Scratch.tempDir("graft-pr-"))
      ranks.write.mode("overwrite").parquet(dir)
      spark.read.parquet(dir)
    } finally freeAll()
  }
}
