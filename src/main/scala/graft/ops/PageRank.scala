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

  /** PER-NODE TRIANGLE COUNTS over the undirected view of an edge
    * list — the classic graph-cohesion signal (clustering
    * coefficients, community density, link-spam detection on a web
    * graph). Input edges may be directed/duplicated/self-looped; the
    * op canonicalizes to distinct undirected (u < v) pairs first.
    *
    * Algorithm (Suri & Vassilvitskii 2011, the MapReduce standard):
    * orient every undirected edge from its LOWER-(degree, id)
    * endpoint to the higher; each triangle then has exactly ONE node
    * with two outgoing edges, so the wedge self-join enumerates every
    * triangle exactly once, and the orientation bounds any node's
    * out-neighborhood by O(√m) on ANY graph — the wedge mass is
    * O(m^1.5) worst case instead of Σ deg² (a single celebrity node
    * can't go quadratic). Wedges close against the canonical edge
    * set by one equi-join; per-node counts explode the three corners.
    * Every exchange is an equi-join or combinable count — no
    * cartesian anywhere. Output: (id, n_triangles) for EVERY node in
    * the graph (zeros kept). */
  def triangleCounts(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val raw = edges.select(col(srcCol).as("u"), col(dstCol).as("v"))
      .filter(col("u") =!= col("v"))
    val und = raw.select(least(col("u"), col("v")).as("u"),
      greatest(col("u"), col("v")).as("v")).distinct()
    val deg = und.select(col("u").as("id"))
      .union(und.select(col("v").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    val withDeg = und
      .join(deg.select(col("id").as("u"), col("deg").as("du")), Seq("u"))
      .join(deg.select(col("id").as("v"), col("deg").as("dv")), Seq("v"))
    // (deg, id)-order orientation; und already guarantees u < v, so
    // the id tie-break collapses into du <= dv (equal degrees keep
    // the lower id as the source)
    val oriented = withDeg.select(
      when(col("du") <= col("dv"),
        struct(col("u").as("a"), col("v").as("b")))
        .otherwise(struct(col("v").as("a"), col("u").as("b"))).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"))
    val wedges = oriented.select(col("a"), col("b").as("x"))
      .join(oriented.select(col("a"), col("b").as("y")), Seq("a"))
      .filter(col("x") < col("y"))
    // the wedge's open side is canonical (x < y), so it closes
    // directly against the canonical undirected edge set
    val tri = wedges.join(
      und.select(col("u").as("x"), col("v").as("y")), Seq("x", "y"))
    val corners = tri
      .select(explode(array(col("a"), col("x"), col("y"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("n_triangles"))
    deg.select("id").join(corners, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
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
