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
}
