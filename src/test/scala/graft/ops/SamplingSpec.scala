package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SamplingSpec extends SparkSpec {

  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  test("split is stable under corpus growth (held-out stays held out)") {
    val subset = Sampling.hashSplit(docs.filter(col("doc_id") < 100), "doc_id", 80)
      .select("doc_id", "split")
    val full = Sampling.hashSplit(docs, "doc_id", 80)
      .select(col("doc_id"), col("split").as("split_full"))
    val reassigned = subset.join(full, "doc_id")
      .filter(col("split") =!= col("split_full")).count()
    assert(reassigned == 0)
  }

  test("split proportions approximate the requested percentage") {
    val frac = Sampling.hashSplit(docs, "doc_id", 80)
      .agg(avg(when(col("split") === "train", 1.0).otherwise(0.0)))
      .head.getDouble(0)
    assert(frac > 0.7 && frac < 0.9, s"train fraction $frac")
  }

  test("salt decorrelates splits without re-dealing either") {
    val a = Sampling.hashSplit(docs, "doc_id", 50, salt = "v1:")
      .select(col("doc_id"), col("split").as("s1"))
    val b = Sampling.hashSplit(docs, "doc_id", 50, salt = "v2:")
      .select(col("doc_id"), col("split").as("s2"))
    val agree = a.join(b, "doc_id")
      .agg(avg(when(col("s1") === col("s2"), 1.0).otherwise(0.0)))
      .head.getDouble(0)
    // independent fair coins agree ~50%; identical splits would be 100%
    assert(agree > 0.35 && agree < 0.65, s"agreement $agree")
  }

  test("stratified sample returns exactly n per stratum, deterministically") {
    val s1 = Sampling.stratifiedSample(docs, "source", "doc_id", 5)
    val sizes = s1.groupBy("source").count().collect()
    assert(sizes.nonEmpty)
    sizes.foreach(r => assert(r.getLong(1) == 5, s"stratum ${r.get(0)}"))
    val s2 = Sampling.stratifiedSample(docs, "source", "doc_id", 5)
    assert(s1.select("doc_id").except(s2.select("doc_id")).count() == 0)
  }

  test("stratum cap is pushed below the full sort (WindowGroupLimit)") {
    val plan = Sampling.stratifiedSample(docs, "source", "doc_id", 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("mixByHash: fractional mix tracks the mixture table, zero-shuffle, stable") {
    import spark.implicits._
    val mix = Seq(("s0", 100L), ("s1", 50L), ("s2", 0L)).toDF("src", "pct")
    val corpus = docs.withColumn("grp",
      concat(lit("s"), (col("doc_id") % 3).cast("string")))
    val got = Sampling.mixByHash(corpus, "grp", "doc_id", mix, "src", "pct")
    val byGrp = got.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = corpus.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byGrp("s0") == totals("s0"), "pct=100 keeps everything")
    assert(!byGrp.contains("s2"), "pct=0 drops the stratum")
    val frac = byGrp("s1").toDouble / totals("s1")
    assert(frac > 0.35 && frac < 0.65, s"pct=50 draw off: $frac")
    // a stratum ABSENT from the mixture table is dropped entirely
    val noS0 = Sampling.mixByHash(corpus, "grp", "doc_id",
      mix.filter(col("src") =!= "s0"), "src", "pct")
    assert(noS0.filter(col("grp") === "s0").count() == 0)
    // per-key assignment is the hashSplit bucket: growth-stable and
    // identical across runs
    val again = Sampling.mixByHash(corpus, "grp", "doc_id", mix, "src", "pct")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == got.select("doc_id").collect().map(_.getLong(0)).toSet)
    // zero shuffle: no Exchange in the plan apart from none at all
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"mix must not shuffle the corpus:\n$plan")
  }

  test("seededShuffle: reproducible total order, seed re-deals it") {
    val a = Sampling.seededShuffle(docs, "doc_id", "ep1")
      .select("doc_id").collect().map(_.getLong(0))
    val b = Sampling.seededShuffle(docs, "doc_id", "ep1")
      .select("doc_id").collect().map(_.getLong(0))
    assert(a.sameElements(b), "same seed must reproduce the permutation")
    assert(a.toSet == docs.select("doc_id").collect()
      .map(_.getLong(0)).toSet, "a permutation loses nothing")
    val c = Sampling.seededShuffle(docs, "doc_id", "ep2")
      .select("doc_id").collect().map(_.getLong(0))
    // epoch reshuffle: the orders must disagree almost everywhere
    val agree = a.zip(c).count { case (x, y) => x == y }
    assert(agree < a.length / 10, s"seeds failed to decorrelate: $agree")
    // and neither order is the ingest order
    val ingest = docs.orderBy("doc_id").select("doc_id")
      .collect().map(_.getLong(0))
    assert(!a.sameElements(ingest))
  }

  test("leakageSafeSplit: no near-dup cluster straddles the boundary") {
    import spark.implicits._
    val corpus = docs.select(col("doc_id").as("id"), col("text"))
    val withDups = corpus.unionByName(corpus.filter(col("id") % 4 === 0)
      .select((col("id") + 10000).as("id"),
        regexp_replace(col("text"), "^\\S+\\s+", "").as("text")))
    val pairs = Dedup.minhashLshPairs(withDups, "id", "text",
      threshold = 0.5)
    val split = Sampling.leakageSafeSplit(withDups, "id", pairs, 70)
      .select(col("id"), col("split"))
    // every mined pair must land on ONE side — zero straddlers
    val straddlers = pairs
      .join(split.withColumnRenamed("id", "id_a")
        .withColumnRenamed("split", "sa"), "id_a")
      .join(split.withColumnRenamed("id", "id_b")
        .withColumnRenamed("split", "sb"), "id_b")
      .filter(col("sa") =!= col("sb")).count()
    assert(straddlers == 0)
    // both sides are populated (the split still splits)
    assert(split.select("split").distinct().count() == 2)
    // a plain per-doc split DOES straddle on this corpus — the
    // failure mode this operator exists to prevent
    val naive = Sampling.hashSplit(withDups, "id", 70)
      .select(col("id"), col("split"))
    val naiveStraddlers = pairs
      .join(naive.withColumnRenamed("id", "id_a")
        .withColumnRenamed("split", "sa"), "id_a")
      .join(naive.withColumnRenamed("id", "id_b")
        .withColumnRenamed("split", "sb"), "id_b")
      .filter(col("sa") =!= col("sb")).count()
    assert(naiveStraddlers > 0, "fixture no longer exercises leakage")
  }

  test("leakageSafeSplit with no pairs is exactly hashSplit") {
    import spark.implicits._
    val noPairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val a = Sampling.leakageSafeSplit(docs, "doc_id", noPairs, 80)
      .select(col("doc_id"), col("split"))
    val b = Sampling.hashSplit(docs, "doc_id", 80)
      .select(col("doc_id"), col("split"))
    assert(a.except(b).count() == 0 && b.except(a).count() == 0)
  }

  test("seededShuffle sorts by range partition, never hash-shuffles") {
    val plan = Sampling.seededShuffle(docs, "doc_id", "ep1")
      .queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"), plan)
    assert(!plan.contains("Exchange hashpartitioning"),
      s"global shuffle must be one range sort:\n$plan")
  }

  test("temperatureWeights: sums to 1, tau=1 is natural, higher tau flattens") {
    def weights(tau: Double): Map[String, (Long, Double)] =
      Sampling.temperatureWeights(docs, "lang", tau).collect()
        .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2)))).toMap
    val w1 = weights(1.0)
    val w2 = weights(2.0)
    val w5 = weights(5.0)
    val total = docs.count().toDouble
    assert(math.abs(w1.values.map(_._2).sum - 1.0) < 1e-12)
    assert(math.abs(w2.values.map(_._2).sum - 1.0) < 1e-12)
    // tau = 1 reproduces natural proportions exactly
    w1.foreach { case (_, (n, w)) =>
      assert(math.abs(w - n / total) < 1e-12, s"n=$n w=$w") }
    // flattening is monotone in tau: the head stratum's weight drops,
    // the tail stratum's rises, toward uniform 1/|strata|
    val head = w1.maxBy(_._2._1)._1
    val tail = w1.minBy(_._2._1)._1
    assert(w2(head)._2 < w1(head)._2 && w5(head)._2 < w2(head)._2)
    assert(w2(tail)._2 > w1(tail)._2 && w5(tail)._2 > w2(tail)._2)
    assert(math.abs(w5(head)._2 - 1.0 / w1.size) <
      math.abs(w1(head)._2 - 1.0 / w1.size))
  }

  test("temperatureMix: tail strata keep more than natural share, head less; no corpus shuffle") {
    val natural = docs.groupBy("lang").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val total = natural.values.sum.toDouble
    val target = (total / 2).toLong
    val mixed = Sampling.temperatureMix(docs, "lang", "doc_id",
      tau = 2.0, targetRows = target)
    val keptShare = mixed.groupBy("lang").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val head = natural.maxBy(_._2)._1
    val tail = natural.minBy(_._2)._1
    // kept fraction of the tail stratum must exceed the head's —
    // the whole point of temperature rebalancing
    val headFrac = keptShare(head).toDouble / natural(head)
    val tailFrac = keptShare(tail).toDouble / natural(tail)
    assert(tailFrac > headFrac, s"tail $tailFrac vs head $headFrac")
    // membership is a subset of the corpus and deterministic
    val again = Sampling.temperatureMix(docs, "lang", "doc_id",
      tau = 2.0, targetRows = target).select("doc_id")
    assert(mixed.select("doc_id").except(again).count() == 0)
    // the draw is a per-row predicate over a broadcast mixture —
    // the corpus itself never shuffles
    val plan = mixed.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("weightedKeep: keep rate tracks the weight, 0 and 1 are exact, zero shuffle") {
    // weight 1 keeps everything, weight 0 nothing — the endpoints
    // are exact, not probabilistic
    assert(Sampling.weightedKeep(docs, "doc_id", lit(1.0)).count() ==
      docs.count())
    assert(Sampling.weightedKeep(docs, "doc_id", lit(0.0)).count() == 0)
    // a 0.3 constant weight keeps ~30% (hash-uniform draw)
    val frac = Sampling.weightedKeep(docs, "doc_id", lit(0.3)).count()
      .toDouble / docs.count()
    assert(frac > 0.2 && frac < 0.4, s"keep fraction $frac")
    // deterministic, and the salt re-deals the draw
    val a = Sampling.weightedKeep(docs, "doc_id", lit(0.5)).select("doc_id")
    val b = Sampling.weightedKeep(docs, "doc_id", lit(0.5)).select("doc_id")
    assert(a.except(b).count() == 0)
    val c = Sampling.weightedKeep(docs, "doc_id", lit(0.5), salt = "v2:")
      .select("doc_id")
    assert(c.except(a).count() > 0)
    val plan = Sampling.weightedKeep(docs, "doc_id", lit(0.5))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("domainCappedKeep: mills downsampled toward the cap, tail passes whole") {
    import spark.implicits._
    // mill: 3000 docs on one domain; tail: 3 domains of 80 docs each;
    // plus docs with NO domain (null and "") — not a domain, so the
    // cap must never drop or downsample them even at mill volume
    val rows = (1L to 3000L).map(i => (i, "mill.example.com")) ++
      (1L to 240L).map(i => (3000L + i, s"site${i % 3}.example.org")) ++
      (1L to 400L).map(i => (4000L + i, if (i % 2 == 0) null else ""))
    val df = rows.toDF("doc_id", "domain")
    val kept = Sampling.domainCappedKeep(df, "doc_id", "domain",
      maxDocsPerDomain = 300)
    val byDomain = kept.groupBy("domain").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // cap/n = 0.1 for the mill: expected 300 kept, hash-uniform
    val mill = byDomain("mill.example.com")
    assert(mill > 200 && mill < 400, s"mill kept $mill of 3000 (cap 300)")
    // tail domains are under the cap: weight 1, kept EXACTLY whole
    (0 to 2).foreach { s =>
      assert(byDomain(s"site$s.example.org") == 80L, byDomain.toString) }
    // domainless docs pass through untouched — all 400, exactly
    val domainless = kept
      .filter(col("domain").isNull || col("domain") === "").count()
    assert(domainless == 400L, s"domainless kept $domainless of 400")
    // deterministic
    val again = Sampling.domainCappedKeep(df, "doc_id", "domain",
      maxDocsPerDomain = 300).select("doc_id")
    assert(kept.select("doc_id").except(again).count() == 0)
  }

  test("hashTopKSample: k rows, reproducible, TakeOrdered plan with no exchange") {
    val s1 = Sampling.hashTopKSample(docs, "doc_id", k = 50)
    assert(s1.count() == 50)
    val s2 = Sampling.hashTopKSample(docs, "doc_id", k = 50)
    assert(s1.select("doc_id").except(s2.select("doc_id")).count() == 0)
    // different salt re-deals the draw
    val s3 = Sampling.hashTopKSample(docs, "doc_id", k = 50, salt = "v2:")
    assert(s3.select("doc_id").except(s1.select("doc_id")).count() > 0)
    val plan = s1.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("Exchange"),
      s"global k-sample must not shuffle:\n$plan")
  }

  test("tokenBudgetCap: budget bounds spend, best-first, one-doc overshoot max") {
    import spark.implicits._
    val d = docs
      .withColumn("tok", size(split(trim(col("text")), "\\s+")).cast("long"))
      .withColumn("pref", col("n_chars").cast("double"))
    val budget = 500L
    val kept = Sampling.tokenBudgetCap(d, "source", col("tok"), budget,
      Seq(col("pref").desc, col("doc_id").asc))
    // every survivor STARTS within budget; spend ≤ budget + its last doc
    assert(kept.filter(col("cum_tokens") - col("tok") >= budget).count() == 0)
    // every non-empty source keeps at least its best doc
    assert(kept.select("source").distinct().count() ==
      d.select("source").distinct().count())
    // the kept set is exactly the prefix of the preference order:
    // no dropped doc ranks above any kept doc within its source
    val ranked = d.withColumn("rn",
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy(col("pref").desc, col("doc_id").asc)))
    val keptRn = ranked.join(kept.select("doc_id"), "doc_id")
      .groupBy("source").agg(max("rn").as("max_kept"), count(lit(1)).as("n_kept"))
    assert(keptRn.filter(col("max_kept") =!= col("n_kept")).count() == 0,
      "kept set must be a prefix of the preference order")
    // deterministic across runs
    val again = Sampling.tokenBudgetCap(d, "source", col("tok"), budget,
      Seq(col("pref").desc, col("doc_id").asc)).select("doc_id")
    assert(kept.select("doc_id").except(again).count() == 0)
  }

  test("gumbelTopK: k rows, seed-reproducible, weight-monotone in expectation, TakeOrdered") {
    import spark.implicits._
    // two weight classes far enough apart that the Gumbel noise
    // (range ≈ [-2, 7] at these hash resolutions) cannot invert them:
    // every top-k draw at tau=1 must come from the high class
    val rows = (1L to 200L).map(i =>
      (i, if (i <= 100) 100.0 else 0.0)).toDF("id", "w")
    val top = Sampling.gumbelTopK(rows, "id", "w", k = 20, seed = "s1")
    assert(top.count() == 20)
    assert(top.filter(col("w") < 100.0).count() == 0,
      "a low-weight row outdrew a +100 weight gap")
    // same seed = same draw; new seed re-deals
    val again = Sampling.gumbelTopK(rows, "id", "w", k = 20, seed = "s1")
    assert(top.select("id").except(again.select("id")).count() == 0)
    val other = Sampling.gumbelTopK(rows, "id", "w", k = 20, seed = "s2")
    assert(other.select("id").except(top.select("id")).count() > 0)
    // flat weights: the draw is the noise alone — a without-
    // replacement uniform sample, still k distinct rows
    val flat = Sampling.gumbelTopK(rows.withColumn("w", lit(1.0)),
      "id", "w", k = 50, seed = "s1")
    assert(flat.select("id").distinct().count() == 50)
    // tau scales the weight's influence: at huge tau the +100 gap
    // drowns in noise and some low-weight rows must appear
    val hot = Sampling.gumbelTopK(rows, "id", "w", k = 50,
      tau = 1e6, seed = "s1")
    assert(hot.filter(col("w") < 100.0).count() > 0,
      "tau=1e6 should reduce selection to the uniform draw")
    // global top-k plan: TakeOrdered, no full-sort exchange
    val plan = top.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("charGrams: window arithmetic, short and null texts, signal-bearing spaces") {
    import spark.implicits._
    val out = Seq((1L, "AbCd"), (2L, "ab"), (3L, null: String),
      (4L, "a b")).toDF("id", "t")
      .select(col("id"), TextAnalysis.charGrams(col("t"), 3).as("g"))
      .collect().map(r => r.getLong(0) -> Option(r.getSeq[String](1)))
      .toMap
    assert(out(1L).get == Seq("abc", "bcd")) // lowercased, len-n+1 windows
    assert(out(2L).get == Seq.empty)         // shorter than n
    assert(out(3L).isEmpty || out(3L).get == Seq.empty) // null-safe
    assert(out(4L).get == Seq("a b"))        // spaces carry signal
  }

  test("shardAssign: growth-stable membership, dense seeded positions, salt decorrelation") {
    import spark.implicits._
    val docs = (1L to 200L).map(i => (i, s"doc $i words here"))
      .toDF("id", "text")
    val a = Sampling.shardAssign(docs, "id", nShards = 8, salt = "s:")
      .select("id", "shard", "shard_pos")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    // membership is a pure function of (key, salt): growing the corpus
    // never moves an existing row to another shard
    val grown = Sampling.shardAssign(
      docs.unionByName((201L to 400L).map(i => (i, s"new $i")).toDF("id", "text")),
      "id", nShards = 8, salt = "s:")
      .filter(col("id") <= 200).select("id", "shard")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a.forall { case (id, (sh, _)) => grown(id) == sh })
    // positions are dense 0..n-1 within each shard
    a.groupBy(_._2._1).foreach { case (_, rows) =>
      assert(rows.values.map(_._2).toSeq.sorted == (0 until rows.size))
    }
    // a different salt deals a genuinely different layout
    val b = Sampling.shardAssign(docs, "id", nShards = 8, salt = "t:")
      .select("id", "shard").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a.exists { case (id, (sh, _)) => b(id) != sh })
    // manifest endpoints are the order's first/last keys
    val m = Sampling.shardManifest(docs, "id", "text", 8, "s:")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(3), r.getLong(4))).toMap
    a.groupBy(_._2._1).foreach { case (sh, rows) =>
      val ordered = rows.toSeq.sortBy(_._2._2)
      assert(m(sh)._1 == rows.size)
      assert(m(sh)._2 == ordered.head._1 && m(sh)._3 == ordered.last._1)
    }
  }

  test("exportShards/verifyShards: clean export verifies; tampers are caught per shard") {
    import spark.implicits._
    val data = (1L to 200L).map(i => (i, s"doc $i words here"))
      .toDF("id", "text")
    val path = tmpDir("shard-verify")
    Sampling.exportShards(data, "id", "text", nShards = 8,
      salt = "s:", path)
    def verdicts() = Sampling.verifyShards(spark, path, "id", "text")
      .select("shard", "verified")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val clean = verdicts()
    assert(clean.size == 8 && clean.values.forall(identity))

    // tamper 1: DROP one row from shard 3 (count, tokens, maybe
    // endpoints, hash all drift) — only that shard fails
    val s3 = s"$path/shards/shard=3"
    val rows3 = spark.read.parquet(s3)
      .select("id", "text", "shard_pos").collect()
    val victim = rows3.map(_.getLong(0)).max
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows3.filterNot(_.getLong(0) == victim).toSeq),
      spark.read.parquet(s3).schema)
      .coalesce(1).write.mode("overwrite").parquet(s3)
    val dropped = verdicts()
    assert(!dropped(3L) && dropped.filterNot(_._1 == 3L).values.forall(identity))

    // repair shard 3, then tamper 2: SWAP two middle positions — count,
    // token mass, and endpoints all still match; only the
    // order-sensitive content hash catches it
    val path2 = tmpDir("shard-verify2")
    Sampling.exportShards(data, "id", "text", nShards = 8,
      salt = "s:", path2)
    val s3b = s"$path2/shards/shard=3"
    val rows3b = spark.read.parquet(s3b)
      .select("id", "text", "shard_pos").collect()
    assert(rows3b.length >= 4, "fixture shard too small to swap inside")
    val ordered = rows3b.sortBy(_.getInt(2))
    val (p1, p2) = (ordered(1).getInt(2), ordered(2).getInt(2))
    val swapped = rows3b.map { r =>
      val p = r.getInt(2)
      val np = if (p == p1) p2 else if (p == p2) p1 else p
      (r.getLong(0), r.getString(1), np)
    }.toSeq.toDF("id", "text", "shard_pos")
    swapped.coalesce(1).write.mode("overwrite").parquet(s3b)
    val reordered = verdicts()
    assert(!reordered(3L) &&
      reordered.filterNot(_._1 == 3L).values.forall(identity))
    val detail = Sampling.verifyShards(spark, path2, "id", "text")
      .filter(col("shard") === 3L).head
    // the swap is invisible to counts and endpoints by construction
    assert(detail.getAs[Long]("n_docs") ==
      rows3b.length && !detail.getAs[Boolean]("verified"))

    // tamper 3: a manifest row whose shard dir vanished
    val path3 = tmpDir("shard-verify3")
    Sampling.exportShards(data, "id", "text", nShards = 8,
      salt = "s:", path3)
    def rm(p: java.nio.file.Path): Unit = {
      if (java.nio.file.Files.isDirectory(p)) {
        val s = java.nio.file.Files.list(p)
        try s.iterator().forEachRemaining(rm) finally s.close()
      }
      java.nio.file.Files.deleteIfExists(p)
      ()
    }
    rm(java.nio.file.Paths.get(s"$path3/shards/shard=5"))
    val missing = Sampling.verifyShards(spark, path3, "id", "text")
      .select("shard", "verified")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(!missing(5L) && missing.filterNot(_._1 == 5L).values.forall(identity))
  }
}
