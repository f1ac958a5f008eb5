package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[PageRank]]: the pinned recurrence on a hand graph (replicated in
  * plain Scala), dangling semantics, edge-derivation determinism, and
  * the CC-style materialization hygiene. */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  test("ranks match the recurrence computed in plain Scala") {
    // star into b plus a back-edge: a→b, c→b, b→a (c dangling-free,
    // b's mass cycles back to a, c never receives — every term of the
    // recurrence is exercised, including the dangling loss via c)
    val edges = Seq((1L, 2L), (3L, 2L), (2L, 1L)).toDF("s", "d")
    val got = PageRank.pageRank(edges, "s", "d", iterations = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    // plain-Scala replica of the same recurrence
    val n = 3.0
    val dmp = 0.85
    var r = Map(1L -> 1 / n, 2L -> 1 / n, 3L -> 1 / n)
    for (_ <- 1 to 4) {
      val inc = Map(
        1L -> r(2L) / 1.0,            // b→a, outdeg(b)=1
        2L -> (r(1L) / 1.0 + r(3L) / 1.0)) // a→b, c→b
      r = Seq(1L, 2L, 3L).map(id =>
        id -> ((1.0 - dmp) / n + dmp * inc.getOrElse(id, 0.0))).toMap
    }
    assert(got.keySet == Set(1L, 2L, 3L), got)
    got.foreach { case (id, v) =>
      assert(math.abs(v - r(id)) < 1e-12, s"node $id: got $v want ${r(id)}")
    }
    // c is a pure source: floor rank only
    assert(math.abs(got(3L) - 0.15 / 3) < 1e-12, got)
  }

  test("coOrderEdges: deterministic under duplicate line numbers, no self-loops") {
    val li = Seq(
      // order 1: duplicate linenumber 1 — the fixture's real hazard;
      // (linenumber, partkey) order makes the sequence 5,7,9
      (1L, 1, 7L), (1L, 1, 5L), (1L, 2, 9L),
      // order 2: consecutive same part → self-loop, dropped
      (2L, 1, 4L), (2L, 2, 4L)
    ).toDF("l_orderkey", "l_linenumber", "l_partkey")
    val got = PageRank.coOrderEdges(li)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((5L, 7L), (7L, 9L)), got)
  }

  test("pageRank retains no blocks and returns a re-joinable scan") {
    val edges = (1L to 30L).map(i => (i, i % 30 + 1)).toDF("s", "d")
    val ranks = PageRank.pageRank(edges, "s", "d", iterations = 3)
    assert(ranks.count() == 30)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      s"retained: ${spark.sparkContext.getPersistentRDDs.values.map(_.name)}")
    // 30-cycle is rank-uniform: every node exactly 1/30
    val vals = ranks.select("r").collect().map(_.getDouble(0))
    vals.foreach(v => assert(math.abs(v - 1.0 / 30) < 1e-12, v))
  }

  test("triangleCounts: K4 plus a tail, canonicalized from messy directed input") {
    import spark.implicits._
    // K4 on {1,2,3,4} (4 triangles, each node in 3) + tail 4-5 (node
    // 5 in none) — fed as DIRECTED edges with duplicates, reversed
    // copies, and a self-loop, all of which must canonicalize away
    val k4 = for {
      a <- 1L to 4L; b <- 1L to 4L if a != b
    } yield (a, b) // both directions = built-in reversal/duplication
    val messy = (k4 ++ Seq((4L, 5L), (5L, 4L), (4L, 5L), (3L, 3L)))
      .toDF("s", "d")
    val got = PageRank.triangleCounts(messy, "s", "d")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L, 5L -> 0L),
      got.toString)
    // total triangles = sum(corners)/3 = 4
    assert(got.values.sum == 12L)
  }

  test("triangleCountsAppend: fold ≡ from-scratch; replay no-ops; torn state fails loud") {
    import spark.implicits._
    val store = new ParquetTableStore(tmpDir("tri-append"))
    // K4 on {1,2,3,4} + tail 4-5, split so the fold exercises all
    // three cases: batch 1 = {1-2, 1-3, 2-3, 3-4} (one triangle);
    // batch 2 = {1-4, 2-4, 4-5}: 1-4 closes {1,3,4} via two stored
    // edges (case 1); {1,2,4} needs both new edges 1-4, 2-4 + stored
    // 1-2 (case 2); 4-5 adds node 5 with no triangles. A reversed
    // duplicate of a stored edge rides along — the anti-join must
    // absorb it.
    val b1 = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("s", "d")
    val b2 = Seq((1L, 4L), (2L, 4L), (4L, 5L), (2L, 1L)).toDF("s", "d")
    val first = PageRank.triangleCountsAppend(b1, "s", "d", store)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(first == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 0L), first)
    val folded = PageRank.triangleCountsAppend(b2, "s", "d", store)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val scratch = PageRank.triangleCounts(
      b1.unionByName(b2), "s", "d")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(folded == scratch, s"folded=$folded scratch=$scratch")
    assert(folded == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L, 5L -> 0L))
    // a REPLAYED delta finds every edge already stored: zero
    // increments, identical counts (the idempotence contract)
    val replayed = PageRank.triangleCountsAppend(b2, "s", "d", store)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(replayed == folded, replayed)
    // torn state (a fold crashed between the edges and meta commits):
    // the next fold must fail LOUDLY, not double-count
    store.upsertBucketed(spark, "tri_edges",
      Seq((9L, 10L)).toDF("u", "v"), Seq("u", "v"))
    val e = intercept[IllegalStateException] {
      PageRank.triangleCountsAppend(
        Seq((5L, 6L)).toDF("s", "d"), "s", "d", store)
    }
    assert(e.getMessage.contains("stale"), e.getMessage)
  }

  test("triangleCountsAppend: a racing fold loses its pinned CAS before any count mutates") {
    import spark.implicits._
    import java.nio.file.Path
    val root = tmpDir("tri-race")
    val plain = new ParquetTableStore(root)
    // seed: a path 1-2-3 (no triangles yet)
    PageRank.triangleCountsAppend(
      Seq((1L, 2L), (2L, 3L)).toDF("s", "d"), "s", "d", plain)
    // Fold B (edge 1-3, would close {1,2,3}) races fold C (edge 2-4):
    // both derive from the SAME stored snapshot. The harness lets C
    // land a REAL complete fold inside B's first CAS — B's edges
    // commit is pinned to the pre-C pointer, so B must throw before
    // it touches the counts table (the double-count window the
    // unpinned commits had: both folds' count increments landing).
    var armed = true
    var competitorRan = false
    val racingIo: StoreIo = new StoreIo {
      override def swapPointer(p: Path, c: String): Unit =
        PosixStoreIo.swapPointer(p, c)
      override def shareFile(s: Path, d: Path): Unit =
        PosixStoreIo.shareFile(s, d)
      override def deletePointerIfCurrent(p: Path, e: String): Unit =
        PosixStoreIo.deletePointerIfCurrent(p, e)
      override def swapPointerIfCurrent(p: Path, c: String,
          exp: Option[String]): Unit = {
        if (armed && p.getParent.getFileName.toString == "tri_edges") {
          armed = false
          PageRank.triangleCountsAppend(
            Seq((2L, 4L)).toDF("s", "d"), "s", "d", plain)
          competitorRan = true
        }
        PosixStoreIo.swapPointerIfCurrent(p, c, exp)
      }
    }
    val storeB = new ParquetTableStore(root, io = racingIo)
    intercept[ConcurrentCommitException] {
      PageRank.triangleCountsAppend(
        Seq((1L, 3L)).toDF("s", "d"), "s", "d", storeB)
    }
    assert(competitorRan)
    // the loser mutated NOTHING: counts/meta reflect exactly the
    // winner's fold, and the caller's retry (re-invoking the fold)
    // lands B over the winner's state
    val afterRace = plain.read(spark, "tri_counts")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(afterRace == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L),
      afterRace)
    val retried = PageRank.triangleCountsAppend(
      Seq((1L, 3L)).toDF("s", "d"), "s", "d", plain)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val scratch = PageRank.triangleCounts(
      Seq((1L, 2L), (2L, 3L), (2L, 4L), (1L, 3L)).toDF("s", "d"), "s", "d")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(retried == scratch, s"retried=$retried scratch=$scratch")
  }
}
