package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DecontaminationSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "a b c d e f g h i j k l"),              // leaks into bench 10
    (2L, "totally different words about nothing in particular here now"),
    (3L, "p q r s t u v w p q r s t u v w")        // one bench gram, twice
  ).toDF("doc_id", "text")

  private val bench = Seq(
    (10L, "c d e f g h i j k l"), // doc 1 minus two leading words
    (20L, "p q r s t u v w")      // exactly one 8-gram
  ).toDF("bench_id", "text")

  test("manufactured leak found with the right overlap; clean doc survives") {
    val pairs = Decontamination.contaminationPairs(docs, "doc_id", "text",
      bench, "bench_id", "text", n = 8, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // doc 1 shares exactly the bench doc's 3 distinct 8-grams
    assert(pairs == Set((1L, 10L, 3L)), s"got $pairs")
    val survivors = Decontamination.dropContaminated(docs, "doc_id", "text",
      bench, "bench_id", "text", n = 8, minShared = 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors == Set(2L, 3L))
  }

  test("a repeated benchmark phrase counts as ONE shared gram") {
    // doc 3 contains bench 20's single 8-gram twice; distinct counting
    // keeps n_shared at 1, so minShared=2 does not flag it...
    val strict = Decontamination.contaminationPairs(docs, "doc_id", "text",
      bench, "bench_id", "text", n = 8, minShared = 2)
      .filter(col("bench_id") === 20).count()
    assert(strict == 0)
    // ...and minShared=1 reports it with n_shared = 1, not 2
    val loose = Decontamination.contaminationPairs(docs, "doc_id", "text",
      bench, "bench_id", "text", n = 8, minShared = 1)
      .filter(col("bench_id") === 20)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(loose == Set((3L, 1L)), s"got $loose")
  }

  test("fuzzy decontamination catches the paraphrase exact 8-grams miss") {
    // the leak: bench doc 30 rewords EVERY 8th token of doc 5 — the
    // tightest spacing that breaks every exact 8-gram. Each of the 10
    // replacements kills its 3 covering shingles, so 3-shingle
    // jaccard lands at 48/108 ≈ 0.44: at threshold 0.4 the DEFAULT
    // recall-first geometry (recallBandGeometry: 36 bands × 3 rows)
    // must catch it with NO knob override — the historical fixed
    // (32, 8) default collided with probability j⁴ per band and was
    // near-blind at j 0.44 (recall ~0.4 even at its own threshold)
    val base = (1 to 80).map(i => s"w$i")
    val reworded = base.zipWithIndex
      .map { case (w, i) => if (i % 8 == 7) s"x$i" else w }
    val train = docs.union(
      Seq((5L, base.mkString(" "))).toDF("doc_id", "text"))
    val evalSet = bench.union(
      Seq((30L, reworded.mkString(" "))).toDF("bench_id", "text"))
    // exact-window decontamination is structurally blind to it
    val exact = Decontamination.contaminationPairs(train, "doc_id", "text",
      evalSet, "bench_id", "text", n = 8, minShared = 1)
      .filter(col("bench_id") === 30).count()
    assert(exact == 0, "a per-8-token rewording must break every 8-gram")
    // the fuzzy net finds it (and doc 1's verbatim leak too) with
    // the threshold as the ONLY knob — geometry derives from it
    val fuzzy = Decontamination.fuzzyContaminationPairs(train, "doc_id",
      "text", evalSet, "bench_id", "text", threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fuzzy.contains((5L, 30L)), s"got $fuzzy")
    val survivors = Decontamination.dropFuzzyContaminated(train, "doc_id",
      "text", evalSet, "bench_id", "text", threshold = 0.4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!survivors.contains(5L))
    // pinning one knob without the other is a contract error
    intercept[IllegalArgumentException] {
      Decontamination.fuzzyContaminationPairs(train, "doc_id", "text",
        evalSet, "bench_id", "text", numHashes = 32, threshold = 0.4)
    }
  }

  test("fuzzy pass finds a leak whose doc id EQUALS its bench id") {
    // doc ids and bench ids are unrelated namespaces that both
    // typically number 0..N — an id collision is a coincidence, not a
    // self-pair, and the d10-style self-pair skip would silently KEEP
    // the contaminated doc (the one failure mode the pass must not
    // have)
    val long = (1 to 40).map(i => s"tok$i").mkString(" ")
    val train = Seq((7L, long)).toDF("doc_id", "text")
    val evalSet = Seq((7L, long)).toDF("bench_id", "text") // same id!
    val pairs = Decontamination.fuzzyContaminationPairs(train, "doc_id",
      "text", evalSet, "bench_id", "text", threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((7L, 7L)), s"id-colliding leak missed: $pairs")
    val survivors = Decontamination.dropFuzzyContaminated(train, "doc_id",
      "text", evalSet, "bench_id", "text", threshold = 0.8)
    assert(survivors.count() == 0, "contaminated doc kept on id collision")
  }

  test("recallBandGeometry guarantees recall at the threshold within the caps") {
    for (t <- Seq(0.3, 0.4, 0.5, 0.6, 0.8); miss <- Seq(0.1, 0.05)) {
      val (numHashes, bands) = Dedup.recallBandGeometry(t, miss)
      val r = numHashes / bands
      assert(numHashes == bands * r, s"t=$t: hashes must fill bands")
      assert(bands <= 64 && numHashes <= 256, s"t=$t: caps violated")
      val recall = 1.0 - math.pow(1.0 - math.pow(t, r), bands)
      assert(recall >= 1.0 - miss,
        s"t=$t miss=$miss: recall $recall below target with $bands×$r")
    }
    // depth maximizes under the caps: the t=0.5 default is 37×4, the
    // geometry the Decontamination docstring promises
    assert(Dedup.recallBandGeometry(0.5) == (148, 37))
    // a threshold too low for the caps degrades to 1-row bands
    assert(Dedup.recallBandGeometry(0.02) == (64, 64))
    // the floor-of-2 band bump is applied BEFORE the affordability
    // check: even in the b=1 corner (threshold ~1, lax missRate) the
    // returned numHashes respects the maxHashes cap
    val (nh, b) = Dedup.recallBandGeometry(0.99, missRate = 0.9,
      maxBands = 40, maxHashes = 40)
    assert(nh <= 40 && nh == b * (nh / b), s"got ($nh, $b)")
  }

  test("no retained blocks after materialization") {
    Decontamination.dropContaminated(docs, "doc_id", "text",
      bench, "bench_id", "text").count()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }

  test("stored index: tranche registration + probe == one-shot pairs") {
    val store = new ParquetTableStore(tmpDir("dc-store"))
    // suites registered separately, including a double registration
    // of the first tranche (replayed crash) — upsert keyed on
    // (bench_id, g) must absorb it
    Decontamination.indexBenchmarks(bench.filter(col("bench_id") === 10),
      "bench_id", "text", store)
    Decontamination.indexBenchmarks(bench.filter(col("bench_id") === 10),
      "bench_id", "text", store)
    Decontamination.indexBenchmarks(bench.filter(col("bench_id") === 20),
      "bench_id", "text", store)
    val stored = Decontamination.probeStoredContamination(docs, "doc_id",
      "text", store, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val oneShot = Decontamination.contaminationPairs(docs, "doc_id",
      "text", bench, "bench_id", "text", minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(stored == oneShot && stored.nonEmpty)
    // the double registration left no duplicate gram rows
    val grams = store.read(spark, "decontam_grams")
    assert(grams.count() == grams.distinct().count())
    // scale shape: the stored gram table broadcasts (eval-suite-sized
    // by contract) — corpus text must never reach a shuffled join
    val plan = Decontamination.probeStoredContamination(docs, "doc_id",
      "text", store, minShared = 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    // a drifted gram width can only match nothing — the probe and a
    // re-registration must refuse it loudly, never silently pass
    // contaminated docs
    val e1 = intercept[IllegalArgumentException] {
      Decontamination.probeStoredContamination(docs, "doc_id", "text",
        store, n = 4, minShared = 1)
    }
    assert(e1.getMessage.contains("n=8"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      Decontamination.indexBenchmarks(bench, "bench_id", "text", store,
        n = 4)
    }
    assert(e2.getMessage.contains("n=8"), e2.getMessage)
  }
}
