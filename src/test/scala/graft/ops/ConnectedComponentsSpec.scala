package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Duplicate-cluster semantics: exact transitive closure with min-id
  * representatives, in O(log n) star rounds. */
class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def clusters(pairs: (Long, Long)*): Map[Long, Long] =
    ConnectedComponents.duplicateClusters(pairs.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("a chain collapses to one cluster rooted at the min id") {
    // the shape that defeats greedy pair-drop AND naive min-label
    // propagation (diameter rounds); stars converge logarithmically
    val got = clusters((2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (1L, 2L))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 1L, 6L -> 1L))
  }

  test("separate components keep separate representatives") {
    val got = clusters((10L, 20L), (20L, 30L), (5L, 7L), (100L, 101L))
    assert(got == Map(10L -> 10L, 20L -> 10L, 30L -> 10L,
      5L -> 5L, 7L -> 5L, 100L -> 100L, 101L -> 100L))
  }

  test("cycles, duplicate pairs, and self-loops are harmless") {
    val got = clusters((1L, 2L), (2L, 3L), (3L, 1L), (1L, 2L), (4L, 4L))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("empty pair set yields an empty, well-typed result") {
    val out = ConnectedComponents.duplicateClusters(
      Seq.empty[(Long, Long)].toDF("id_a", "id_b"))
    assert(out.columns.toSeq == Seq("id", "cluster_id"))
    assert(out.count() == 0)
  }

  test("no persisted blocks survive the call") {
    clusters((1L, 2L), (2L, 3L), (7L, 9L))
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "duplicateClusters must unpersist every round")
  }

  test("matches brute-force closure on a random graph") {
    val rnd = new scala.util.Random(17)
    val pairs = Seq.fill(60)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(p => p._1 != p._2)
    val got = clusters(pairs: _*)
    // brute force: repeated relabel until fixpoint
    var lab = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      .map(i => i -> i).toMap
    var changed = true
    while (changed) {
      changed = false
      for ((a, b) <- pairs) {
        val m = math.min(lab(a), lab(b))
        if (lab(a) != m || lab(b) != m) {
          lab = lab.updated(a, m).updated(b, m); changed = true
        }
      }
    }
    assert(got == lab)
  }

  test("mergeClusters: incremental ≡ from-scratch on random deltas") {
    val rnd = new scala.util.Random(7)
    val base = Seq.fill(60)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(p => p._1 != p._2)
    // the delta reaches known ids AND brand-new ones (40-54)
    val delta = Seq.fill(30)((rnd.nextInt(55).toLong, rnd.nextInt(55).toLong))
      .filter(p => p._1 != p._2)
    val stored = ConnectedComponents.duplicateClusters(base.toDF("id_a", "id_b"))
    val inc = ConnectedComponents.mergeClusters(stored, delta.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = ConnectedComponents.duplicateClusters(
      (base ++ delta).toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // full covers ids in some pair; incremental additionally carries
    // stored singletons — restricted to full's domain they agree,
    // and nothing in inc contradicts a full label
    assert(full.keySet.subsetOf(inc.keySet))
    full.foreach { case (id, rep) => assert(inc(id) == rep, s"id $id") }
  }

  test("mergeClusters: merge-through-new-id, pure-new component, no-op delta") {
    // stored: {1,2} and {5,6}
    val stored = ConnectedComponents.duplicateClusters(
      Seq((1L, 2L), (5L, 6L)).toDF("id_a", "id_b"))
    // bridge both stored components through a brand-new id 100,
    // plus a disjoint all-new component {200, 201}
    val inc = ConnectedComponents.mergeClusters(stored,
      Seq((2L, 100L), (100L, 6L), (200L, 201L)).toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(inc == Map(1L -> 1L, 2L -> 1L, 5L -> 1L, 6L -> 1L,
      100L -> 1L, 200L -> 200L, 201L -> 200L), inc)
    // a delta entirely INSIDE one stored component is a no-op: the
    // rep graph is all self-loops, the fixpoint never runs
    val noop = ConnectedComponents.mergeClusters(stored,
      Seq((1L, 2L)).toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(noop == Map(1L -> 1L, 2L -> 1L, 5L -> 5L, 6L -> 5L), noop)
  }
}
