package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Lloyd refinement invariants (the non-oracle IVF balance path). */
class IvfSpec extends SparkSpec {
  import spark.implicits._

  // Clumped fixture: the k lowest ids (= the sample codebook) are all
  // EXACT copies of e1, so zero-iteration IVF collapses — every
  // vector ties across the 4 identical anchors and lands in cell 1.
  // Ids 1..50 are e1, ids 51..100 are e2: two perfectly separable
  // clusters the refinement must discover.
  private def fixture: DataFrame = {
    val e1 = Seq(1.0f, 0.0f, 0.0f, 0.0f)
    val e2 = Seq(0.0f, 1.0f, 0.0f, 0.0f)
    ((1L to 50L).map(i => (i, e1)) ++ (51L to 100L).map(i => (i, e2)))
      .toDF("id", "vec")
  }

  private def maxCell(assign: DataFrame): Long =
    assign.groupBy("centroid_id").count().agg(max("count")).head.getLong(0)

  private def meanCosToCentroid(df: DataFrame, cb: Ivf.Codebook): Double = {
    val byCid = cb.toMap
    val assigned = Ivf.assignmentsWithCodebook(df, "id", "vec", cb)
      .join(df, "id")
      .collect()
    val cos = assigned.map { r =>
      val v = r.getSeq[Float](2).map(_.toDouble)
      val c = byCid(r.getLong(1))
      val dot = v.zip(c).map { case (a, b) => a * b }.sum
      val nv = math.sqrt(v.map(x => x * x).sum)
      val nc = math.sqrt(c.map(x => x * x).sum)
      dot / (nv * nc)
    }
    cos.sum / cos.length
  }

  test("sampleCodebook matches the in-plan anchors") {
    val cb = Ivf.sampleCodebook(fixture, "id", "vec", 4)
    assert(cb.map(_._1) == Seq(1L, 2L, 3L, 4L))
    assert(cb.forall(_._2 == Seq(1.0, 0.0, 0.0, 0.0)))
    // assignmentsWithCodebook over the sample codebook replicates
    // assignments (same anchors, same ranking)
    val a = Ivf.assignments(fixture, "id", "vec", 4, probes = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Ivf.assignmentsWithCodebook(fixture, "id", "vec", cb, probes = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }

  test("lloydRefine improves cell balance and quantization quality on the clumped fixture") {
    val df = fixture
    val sample = Ivf.sampleCodebook(df, "id", "vec", 4)

    // degenerate start: all 100 vectors collapse into one cell
    val before = Ivf.assignmentsWithCodebook(df, "id", "vec", sample)
    assert(maxCell(before) == 100L)
    val qBefore = meanCosToCentroid(df, sample)

    val refined = Ivf.lloydRefine(df, "id", "vec", sample, iters = 2)
    val after = Ivf.assignmentsWithCodebook(df, "id", "vec", refined)
    // the two true clusters separate: no cell holds more than half
    assert(maxCell(after) == 50L, s"maxCell=${maxCell(after)}")
    val qAfter = meanCosToCentroid(df, refined)
    // spherical k-means objective improves monotonically; here the
    // clusters are exactly recoverable, so quality reaches 1.0
    assert(qAfter > qBefore, s"$qAfter <= $qBefore")
    assert(math.abs(qAfter - 1.0) < 1e-12)
  }

  test("lloydRefine keeps empty-cell centroids and is deterministic") {
    val df = fixture
    val sample = Ivf.sampleCodebook(df, "id", "vec", 4)
    val r1 = Ivf.lloydRefine(df, "id", "vec", sample, iters = 2)
    val r2 = Ivf.lloydRefine(df, "id", "vec", sample, iters = 2)
    assert(r1 == r2, "refinement must be deterministic for a fixed fixture")
    // cells that never receive members keep their previous vector
    val cids = Ivf.assignmentsWithCodebook(df, "id", "vec", r1)
      .select("centroid_id").distinct().as[Long].collect().toSet
    val untouched = r1.filterNot(c => cids.contains(c._1))
    assert(untouched.forall(_._2 == Seq(1.0, 0.0, 0.0, 0.0)))
  }

  // ---- kmeansTrain (ss18: the distributed convergence loop) ----

  private def centMap(df: DataFrame): Map[Long, Seq[Double]] =
    df.collect().map(r => r.getLong(0) ->
      r.getSeq[Double](1).toIndexedSeq).toMap

  test("kmeansTrain matches lloydRefine on the clumped fixture (same recurrence, frame-held)") {
    val df = fixture
    val frames = Ivf.kmeansTrain(df, "id", "vec", numCentroids = 4,
      maxIters = 2).centroids
    val driver = Ivf.lloydRefine(df, "id", "vec",
      Ivf.sampleCodebook(df, "id", "vec", 4), iters = 2).toMap
    val got = centMap(frames)
    assert(got.keySet == driver.keySet)
    got.foreach { case (cid, v) =>
      v.zip(driver(cid)).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-12, s"cell $cid: $a vs $b") } }
  }

  test("kmeansTrain tol mode: distortion monotone, converges, stops early") {
    val r = Ivf.kmeansTrain(fixture, "id", "vec", numCentroids = 4,
      maxIters = 10, tol = 1e-9)
    assert(r.iters < 10, s"expected early stop, ran ${r.iters}")
    assert(r.objectives.nonEmpty)
    // the looped ss7 guarantee: mean spherical distortion never rises
    r.objectives.sliding(2).foreach {
      case Seq(a, b) => assert(b <= a + 1e-12, s"distortion rose: $a -> $b")
      case _ =>
    }
    // the two exact clusters are recoverable: final distortion 0
    assert(math.abs(r.objectives.last) < 1e-12, r.objectives.toString)
  }

  test("kmeansTrain ordered and unordered folds agree to float-sum tolerance") {
    val df = fixture
    val a = centMap(Ivf.kmeansTrain(df, "id", "vec", 4, 2,
      ordered = false).centroids)
    val b = centMap(Ivf.kmeansTrain(df, "id", "vec", 4, 2,
      ordered = true).centroids)
    assert(a.keySet == b.keySet)
    a.foreach { case (cid, v) =>
      v.zip(b(cid)).foreach { case (x, y) =>
        assert(math.abs(x - y) < 1e-9, s"cell $cid: $x vs $y") } }
  }
}
