package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{ConnectedComponents, Dedup, PageRank, Sampling, Sessions, SimilaritySearch}

/** Scale probe for the dedup/ANN family: replicate the sf corpus
  * `mult`× (id-offset copies — a duplicate-HEAVY corpus, the worst
  * case a dedup operator faces, since every doc gains mult-1 exact
  * copies) and measure each operator at 1× and mult×, with the
  * knobs both fixed (shows where quadratic terms would bite) and
  * scaled (cells ~ sqrt(n), the documented 100 TB discipline).
  *
  * Usage: runMain graft.tools.ScaleProbe <sfDir> [mult]
  * Output: one PROBE line per (op, scale, knobs) — recorded in
  * PLANS.md's scale-probe table. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val mult = if (args.length > 1) args(1).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def docs(m: Int): DataFrame = {
      val d = Tables.documents(spark, dir).select(col("doc_id").as("id"), col("text"))
      (0 until m).map(i => d.select((col("id") + i * 10000000L).as("id"), col("text")))
        .reduce(_ unionByName _)
    }
    def vecs(m: Int): DataFrame = {
      val e = Tables.embeddings(spark, dir).select(col("vec_id").as("id"), col("embedding"))
      (0 until m).map(i => e.select((col("id") + i * 10000000L).as("id"), col("embedding")))
        .reduce(_ unionByName _)
    }
    // documents with the stratum column (sm2's shape)
    def docsS(m: Int): DataFrame = {
      val d = Tables.documents(spark, dir)
        .select(col("doc_id").as("id"), col("source"), col("text"))
      (0 until m).map(i => d.select((col("id") + i * 10000000L).as("id"),
          col("source"), col("text")))
        .reduce(_ unionByName _)
    }
    // events replicated by user-id offset: the key SPACE grows with m
    // (more users), per-key history stays fixed — the realistic way a
    // clickstream scales
    def evts(m: Int): DataFrame = {
      val e = Tables.events(spark, dir)
        .select(col("user_id"), col("event_id"), col("ts"))
      (0 until m).map(i => e.select(
          (col("user_id") + i * 10000000L).as("user_id"),
          (col("event_id") + i * 10000000L).as("event_id"), col("ts")))
        .reduce(_ unionByName _)
    }

    // events with the state column (w8's shape)
    def evtsT(m: Int): DataFrame = {
      val e = Tables.events(spark, dir)
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      (0 until m).map(i => e.select(
          (col("user_id") + i * 10000000L).as("user_id"),
          (col("event_id") + i * 10000000L).as("event_id"), col("ts"),
          col("event_type")))
        .reduce(_ unionByName _)
    }

    // optional third arg: comma-separated name prefixes to probe
    // (e.g. "ts12,ss10" re-probes just the new ops of a round)
    val only: Option[Seq[String]] =
      if (args.length > 2) Some(args(2).split(',').toSeq) else None
    // whether any requested prefix selects `name` — probe() uses it to
    // skip timing, and the incremental blocks use it to skip their
    // UNTIMED index builds too (a targeted re-probe of one family must
    // not pay another family's setup)
    def selected(name: String): Boolean =
      !only.exists(ps => !ps.exists(name.startsWith))
    // cumulative shuffle-write bytes, fed by stage-completion events —
    // probes report the per-probe delta so exchange-size disciplines
    // (e.g. d13's 8-byte hashed gram key) carry measured bytes, not
    // just wall time. Listener delivery is async; the short drain
    // sleep is plenty at probe granularity (MB-scale deltas).
    val shuffleWrite = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          shuffleWrite.addAndGet(
            sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      })
    def drainedShuffleWrite(): Long = { Thread.sleep(300); shuffleWrite.get }
    def probe(name: String, df: => DataFrame): Unit = {
      if (!selected(name)) return
      val s0 = drainedShuffleWrite()
      val t0 = System.nanoTime()
      val n = df.count()
      val secs = (System.nanoTime() - t0) / 1e9
      val mb = (drainedShuffleWrite() - s0) / 1e6
      println(f"PROBE $name%-34s $secs%8.2f s  rows=$n%10d  shuffleMB=$mb%9.1f")
    }
    // noop-write materialization for frames whose count() prunes the
    // interesting subtree (e.g. a unique-keyed outer join + projection:
    // cardinality is provable, so count() computes nothing)
    def probeNoop(name: String, df: => DataFrame): Unit = {
      if (!selected(name)) return
      val s0 = drainedShuffleWrite()
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      val secs = (System.nanoTime() - t0) / 1e9
      val mb = (drainedShuffleWrite() - s0) / 1e6
      println(f"PROBE $name%-34s $secs%8.2f s  rows=     (noop)  shuffleMB=$mb%9.1f")
    }

    // warmup
    docs(1).write.mode("overwrite").format("noop").save()

    for (m <- Seq(1, mult)) {
      val nDocs = 5000L * m // sf0.1 fixture size, for knob math only
      probe(s"d1_exact_x$m", Dedup.exactDuplicates(docs(m), "id", "text"))
      probe(s"d2_minhash_x$m", Dedup.minhashLshPairs(docs(m), "id", "text",
        shingleLen = 3, numHashes = 32, bands = 8, threshold = 0.6, bucketCap = 1000))
      probe(s"d4_ngram_x$m", Dedup.ngramJaccardPairs(docs(m), "id", "text",
        n = 5, numHashes = 32, bands = 8, threshold = 0.7, bucketCap = 1000))
      // the documented char-gram guidance measured: 8-row bands (~j^8
      // selectivity) against the 4-row default (~j^4) — char-5-gram
      // noise similarity (~0.3) is what makes d4 the pair-mass hog
      if (m > 1)
        probe(s"d4_ngram_x${m}_rpb8", Dedup.ngramJaccardPairs(docs(m), "id", "text",
          n = 5, numHashes = 32, bands = 4, threshold = 0.7, bucketCap = 1000))
      // AUTO band geometry (round 8): the derived (numHashes, bands)
      // vs the fixed reference knob at the same verify threshold. The
      // saturation rows report the band structure's own aggregates —
      // per-block mass staying flat under auto while the fixed knob's
      // hottest buckets crowd with m IS the auto rule working.
      val (autoK, autoB) = Dedup.autoBandGeometry(nDocs, 0.8)
      probe(s"d2_minhash_x${m}_t08_32x8", Dedup.minhashLshPairs(docs(m),
        "id", "text", shingleLen = 3, numHashes = 32, bands = 8,
        threshold = 0.8, bucketCap = 1000))
      probe(s"d2_minhash_x${m}_auto${autoB}x${autoK / autoB}",
        Dedup.minhashLshPairsAuto(docs(m), "id", "text",
          threshold = 0.8, bucketCap = 1000))
      def satRow(name: String, k: Int, b: Int): Unit = {
        if (!selected(name)) return
        val sigs = Dedup.lshSignatures(docs(m), "id", "text", 3)
        val r = Dedup.blockSaturation(Dedup.lshBandMembership(sigs, k, b),
          Seq("band", "band_hash"), cap = 1000).head
        println(f"PROBE $name%-34s blocks=${r.getLong(0)}%9d at_cap=${r.getLong(1)}%5d max_pop=${r.getLong(2)}%8d")
      }
      satRow(s"d2_bandsat_x${m}_8x4", 32, 8)
      satRow(s"d2_bandsat_x${m}_auto${autoB}x${autoK / autoB}", autoK, autoB)
      // the x30 headline case (d4 at the fixed 4-row default measured
      // 495 s in round 7): the auto rule derives the deeper geometry
      // from the same count — at t=0.7 the recall target costs a wide
      // hash pool (maxBands cap binding is visible in the label), and
      // the wall-time delta vs d4_ngram_x$m is the knob's price paid
      // in linear signature work instead of quadratic candidates
      if (m > 1) {
        val (k7, b7) = Dedup.autoBandGeometry(nDocs, 0.7)
        probe(s"d4_ngram_x${m}_auto${b7}x${k7 / b7}",
          Dedup.ngramJaccardPairsAuto(docs(m), "id", "text",
            threshold = 0.7, bucketCap = 1000))
      }
      // ADVERSARIAL SKEW (round-13): one boilerplate string planted at
      // 10% corpus frequency — every copy signs identically, so ONE
      // bucket per band holds 10% of the corpus. The designed
      // mitigation is the deterministic per-bucket cap (a hot bucket
      // is bounded at cap rows → ≤ cap²/2 candidate pairs REGARDLESS
      // of m); the uncapped row is the measured hazard it prevents
      // (pair mass ~(n/10)²·bands — quadratic in the hot mass).
      // Skew.saltedJoin does NOT apply here and the probe documents
      // why: salting splits one key's ROWS across partitions (fixing
      // a straggler task), but the kill term in a skewed LSH mine is
      // the O(hot²) candidate-pair MASS, which no row placement
      // reduces — only the cap (with blockSaturation as the audit
      // trail) bounds it. The per-block row_number that applies the
      // cap does stream the hot bucket through one task, but that
      // cost is LINEAR in the hot mass (measured: the capped rows
      // stay flat while uncapped grows superlinearly).
      def skewDocs(mm: Int): DataFrame = docs(mm).select(col("id"),
        when(col("id") % 10 === 0,
          lit((1 to 40).map(i => s"boiler$i").mkString(" ")))
          .otherwise(col("text")).as("text"))
      probe(s"skew_d2_cap1000_x$m", Dedup.minhashLshPairs(skewDocs(m),
        "id", "text", shingleLen = 3, numHashes = 32, bands = 8,
        threshold = 0.6, bucketCap = 1000))
      probe(s"skew_d2_uncapped_x$m", Dedup.minhashLshPairs(skewDocs(m),
        "id", "text", shingleLen = 3, numHashes = 32, bands = 8,
        threshold = 0.6, bucketCap = Int.MaxValue))
      if (selected(s"skew_d2_bandsat_x$m")) {
        val sigs = Dedup.lshSignatures(skewDocs(m), "id", "text", 3)
        val r = Dedup.blockSaturation(
          Dedup.lshBandMembership(sigs, 32, 8),
          Seq("band", "band_hash"), cap = 1000).head
        println(f"PROBE skew_d2_bandsat_x$m%-22s blocks=${r.getLong(0)}%9d at_cap=${r.getLong(1)}%5d max_pop=${r.getLong(2)}%8d")
      }
      // the closure over the capped skewed pairs: the hot cluster is
      // cap-bounded, so d9 stays pair-graph-sized
      probe(s"skew_d9_clusters_x$m", ConnectedComponents.duplicateClusters(
        Dedup.minhashLshPairs(skewDocs(m), "id", "text", shingleLen = 3,
          numHashes = 32, bands = 8, threshold = 0.6, bucketCap = 1000)
          .select("id_a", "id_b")))
      // fixed knobs: cell population grows linearly with m (the trap)
      probe(s"d5_ivf_x${m}_cells64", Dedup.embeddingNearDupPairsIvf(vecs(m),
        "id", "embedding", numCentroids = 64, probes = 2, threshold = 0.9,
        cellCap = 1000))
      if (m > 1) {
        // scaled knobs: cells ~ sqrt(n) keeps per-cell population flat
        val cells = math.max(64, math.sqrt(16500.0 * m).toInt)
        probe(s"d5_ivf_x${m}_cells$cells", Dedup.embeddingNearDupPairsIvf(vecs(m),
          "id", "embedding", numCentroids = cells, probes = 2, threshold = 0.9,
          cellCap = 1000))
      }
      // semantic dedup (d19): the d5 auto mine + CC closure + survivor
      // anti-join on top — the delta vs the d5 auto row is the closure
      // + apply cost, which is pair-graph-sized, not corpus-sized.
      // DEFAULTS = adaptive closure (limit-collect picks the driver
      // union-find when the pair graph fits the heap-derived bound)
      probe(s"d19_semantic_x$m", Dedup.semanticDedupAuto(vecs(m),
        "id", "embedding", probes = 2, threshold = 0.9, cellCap = 1000))
      // the forced distributed fixpoint — what the adaptive default
      // replaces when the dup-heavy pair graph is only megabytes; the
      // delta vs the row above IS the auto-selection win
      if (m > 1)
        probe(s"d19_semantic_x${m}_fixpoint", Dedup.semanticDedupAuto(vecs(m),
          "id", "embedding", probes = 2, threshold = 0.9, cellCap = 1000,
          driverMaxEdges = 0))
      // multimodal near-dup (mm7): the decode-per-partition featurize
      // path must scale linearly with the media mass, and the m-clique
      // replication stresses the miner exactly like d19's worst case
      probe(s"mm7_visual_neardup_x$m", {
        import spark.implicits._
        val d = Tables.documents(spark, dir)
        val rep = (0 until m).map(i => d.select(
            (col("doc_id") + i * 10000000L).as("doc_id"),
            col("text"), col("n_chars")))
          .reduce(_ unionByName _)
        val items = graft.multimodal.Multimodal.syntheticMedia(rep)
          .as[graft.multimodal.Multimodal.MediaItem]
        val feats = graft.multimodal.Multimodal
          .decodeAndFeaturize(items, dim = 8).toDF()
          .select(col("media_id").as("id"), col("features").as("embedding"))
        Dedup.embeddingNearDupPairsIvfAuto(feats, "id", "embedding",
          probes = 2, threshold = 0.999, cellCap = 1000)
      })
      // incremental semantic dedup (d20): the IVF index is built
      // UNTIMED (amortized over batches); the timed part is one
      // fixed-size batch probe + verify. Read against
      // d19_semantic_x$m: that is the full re-mine + re-closure the
      // probe replaces.
      if (selected(s"d20_incremental_x$m")) {
        val tmp = java.nio.file.Files
          .createTempDirectory(s"probe-d20-x$m").toString
        try {
          val corpus = vecs(m)
          val (cb, mem) = SimilaritySearch.ivfIndexFrames(corpus,
            "id", "embedding",
            numCentroids = math.max(64, math.sqrt(2000.0 * m).toInt),
            cellCap = 1000)
          cb.write.mode("overwrite").parquet(s"$tmp/cb")
          mem.write.mode("overwrite").parquet(s"$tmp/mem")
          val batch = Tables.embeddings(spark, dir)
            .filter(col("vec_id") % 10 === 0)
            .select((col("vec_id") + 90000000L).as("id"),
              concat(array((element_at(col("embedding"), 1) + lit(0.25f))
                .cast("float")),
                slice(col("embedding"), 2, 63)).as("embedding"))
          probe(s"d20_incremental_x$m", Dedup.incrementalSemanticPairs(
            batch, "id", "embedding",
            spark.read.parquet(s"$tmp/cb"),
            spark.read.parquet(s"$tmp/mem"), corpus,
            probes = 2, threshold = 0.9))
        } finally org.apache.commons.io.FileUtils
          .deleteDirectory(new java.io.File(tmp))
      }
      // audio near-dup (mm8): REAL WAV decode per item — the decode
      // path must scale linearly with the media mass like mm7's, and
      // the m-clique replication stresses the IVF miner identically
      probe(s"mm8_audio_neardup_x$m", {
        import spark.implicits._
        val d = Tables.documents(spark, dir)
        val rep = (0 until m).map(i => d.select(
            (col("doc_id") + i * 10000000L).as("doc_id"), col("text")))
          .reduce(_ unionByName _)
        val items = graft.multimodal.Multimodal.syntheticWavMedia(rep)
          .as[graft.multimodal.Multimodal.MediaItem]
        val feats = graft.multimodal.Multimodal
          .decodeAndFeaturize(items, dim = 8,
            provider = graft.multimodal.ModalityCodecProvider).toDF()
          .select(col("media_id").as("id"), col("features").as("embedding"))
        Dedup.embeddingNearDupPairsIvfAuto(feats, "id", "embedding",
          probes = 2, threshold = 0.999, cellCap = 1000)
      })
      // video near-dup (mm9): real AVI demux + BMP frame decode per
      // item — linear in the media mass like mm8's WAV path
      probe(s"mm9_video_neardup_x$m", {
        import spark.implicits._
        val d = Tables.documents(spark, dir)
        val rep = (0 until m).map(i => d.select(
            (col("doc_id") + i * 10000000L).as("doc_id"), col("text")))
          .reduce(_ unionByName _)
        val items = graft.multimodal.Multimodal.syntheticAviMedia(rep)
          .as[graft.multimodal.Multimodal.MediaItem]
        val feats = graft.multimodal.Multimodal
          .decodeAndFeaturize(items, dim = 16,
            provider = graft.multimodal.ModalityCodecProvider).toDF()
          .select(col("media_id").as("id"), col("features").as("embedding"))
        Dedup.embeddingNearDupPairsIvfAuto(feats, "id", "embedding",
          probes = 2, threshold = 0.999, cellCap = 1000)
      })
      // cross-corpus LM (ts24): the model tables stay reference-sized
      // while the corpus grows m× — the scoring joins (keyed w1/w2,
      // Zipf-skewed, AQE-handled) and the per-doc fold must track the
      // corpus token mass linearly
      probe(s"ts24_cross_lm_x$m", {
        val ref = Tables.documents(spark, dir)
          .filter(col("lang") === "en").select(col("text"))
        graft.ops.TextAnalysis.bigramLmScoreCross(ref, "text",
          docs(m), "id", "text")
      })
      // domain-capped keep (tp9): one domain-keyed count-distinct +
      // a per-row hash predicate — must stay scan-rate at any m
      probe(s"tp9_domain_cap_x$m", {
        val withDomain = docs(m).select(col("id"),
          concat(lit("site"), col("id") % 23, lit(".example.org"))
            .as("domain"))
        graft.ops.Sampling.domainCappedKeep(withDomain, "id", "domain",
          maxDocsPerDomain = 40)
      })
      // boilerplate strip (ts23): line mass grows with the corpus but
      // the frequent set stays boilerplate-sized (broadcast); the
      // exchanges are the line-count aggregation and the per-doc
      // positional reassembly — both linear in the line mass
      probe(s"ts23_boilerplate_x$m", {
        val paged = docs(m).select(col("id"),
          concat_ws("\n", lit("ACCEPT COOKIES TO CONTINUE"), col("text"),
            concat(lit("unique "), col("id"))).as("text"))
        graft.ops.TextAnalysis.stripBoilerplateLines(paged, "id", "text",
          minDocs = 10)
      })
      // fuzzy decontamination (dc3): corpus grows m×, the eval set
      // stays FIXED (small by contract) — the pass must stay scan-rate
      // because only bench-band collisions ever exchange
      probe(s"dc3_fuzzy_decon_x$m", {
        val bench = Tables.documents(spark, dir)
          .filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + 50000000L).as("bench_id"),
            regexp_replace(col("text"), "^\\S+\\s+\\S+\\s+", "").as("text"))
        graft.ops.Decontamination.fuzzyContaminationPairs(
          docs(m), "id", "text", bench, "bench_id", "text",
          // the dc3 gate's pinned geometry, so probe rows stay
          // comparable across rounds (default is now recall-derived)
          numHashes = 32, bands = 8, threshold = 0.5)
      })
      // the recall-first DEFAULT geometry (37 bands × 4 rows at
      // t=0.5, recall 0.91 vs the pinned pair's 0.40): the price of
      // not silently keeping near-threshold contamination is ~4.6×
      // signature+band work — this row keeps that cost measured
      probe(s"dc3_fuzzy_recall_x$m", {
        val bench = Tables.documents(spark, dir)
          .filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + 50000000L).as("bench_id"),
            regexp_replace(col("text"), "^\\S+\\s+\\S+\\s+", "").as("text"))
        graft.ops.Decontamination.fuzzyContaminationPairs(
          docs(m), "id", "text", bench, "bench_id", "text",
          threshold = 0.5)
      })
      // 32- vs 60-bit sketch: same radius, same cap. The 32-bit rows
      // count INCLUDES false sketch collisions (unrelated docs within
      // hamming 2 of each other purely from 32-bit crowding) and its
      // band buckets saturate as m grows — the wide sketch's relative
      // cost/row advantage at mult× IS the saturation measurement.
      probe(s"d7_hamming32_x$m", Dedup.simhashHammingPairs(docs(m), "id", "text",
        maxDist = 2, bucketCap = 1000, width = 32))
      probe(s"d7b_hamming60_x$m", Dedup.simhashHammingPairs(docs(m), "id", "text",
        maxDist = 2, bucketCap = 1000, width = 60))
      // CC clusters over the LSH pair graph: dup-heavy replication
      // makes every doc a clique member — rounds stay O(log n) but
      // the edge mass is the cost driver
      probe(s"d9_clusters_x$m", ConnectedComponents.duplicateClusters(
        Dedup.minhashLshPairs(docs(m), "id", "text",
          shingleLen = 3, numHashes = 32, bands = 8, threshold = 0.6,
          bucketCap = 1000).select("id_a", "id_b")))
      // cluster-best apply on top of the same mine+CC: the delta vs
      // the d9 row is the apply itself (one WindowGroupLimit exchange
      // + one combinable sizes aggregate on the same key)
      probe(s"d11_cluster_best_x$m", {
        val corpus = docs(m).withColumn("q9",
          round(graft.ops.TextAnalysis.qualityScore(col("text")), 9))
        Dedup.keepBestPerCluster(corpus, "id",
          Dedup.minhashLshPairs(corpus, "id", "text",
            shingleLen = 3, numHashes = 32, bands = 8, threshold = 0.6,
            bucketCap = 1000).select("id_a", "id_b"),
          col("q9"))
      })
      // PageRank: m disjoint copies of the co-order graph — node and
      // edge space ×m, per-iteration cost two edge-sized key shuffles
      probe(s"g1_pagerank_x$m", {
        val l = Tables.lineitem(spark, dir)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"))
        val li = (0 until m).map(i => l.select(
            (col("l_orderkey") + i * 10000000L).as("l_orderkey"),
            col("l_linenumber"),
            (col("l_partkey") + i * 10000000L).as("l_partkey")))
          .reduce(_ unionByName _)
        PageRank.pageRank(PageRank.coOrderEdges(li), "src", "dst",
          iterations = 3)
      })
      // fuzzy blocking under replication is the adversarial case:
      // every replica shares its original's normalized key, so block
      // population ×m and in-block pair mass ×m² — the cap is what
      // holds the line (the same economics as d4; production order is
      // exact-dedup first, fuzzy on survivors)
      probe(s"d14_fuzzy_x$m", Dedup.blockedFuzzyPairs(docs(m), "id", "text",
        keyLen = 40, maxDist = 5, bucketCap = 1000))
      // HOT-KEY join (the viral-video shape): one key carries ~half
      // the probe rows — the AQE-vs-salting measurement SURVEY §7.4
      // calls for (j13 gates the salted join's correctness). Four
      // rows tell the whole story: (1) with a broadcastABLE dim the
      // hot key is a non-problem (no probe-side shuffle exists) —
      // the first-choice fix; when the dim CANNOT broadcast
      // (threshold forced off, modeling a big dim), (2) the raw
      // shuffle join with AQE's skewedJoin split, (3) the same with
      // AQE's split disabled (the unmitigated hot reducer), and
      // (4) explicit salting, which pre-splits the hot key without
      // relying on runtime stats.
      locally {
        def hotLineitem: DataFrame = {
          val l = Tables.lineitem(spark, dir)
            .select(col("l_orderkey"), col("l_partkey"), col("l_linenumber"))
          val rep = (0 until m).map(i => l.select(
              (col("l_orderkey") + i * 10000000L).as("l_orderkey"),
              col("l_partkey"), col("l_linenumber")))
            .reduce(_ unionByName _)
          rep.select(
            when(pmod(col("l_orderkey"), lit(2)) === 0, lit(1L))
              .otherwise(col("l_partkey")).as("p_partkey"),
            col("l_linenumber"))
        }
        val small = Tables.part(spark, dir)
          .select(col("p_partkey"), col("p_name"))
        probe(s"skew_broadcast_hotjoin_x$m",
          hotLineitem.join(small, Seq("p_partkey")))
        val bcast = "spark.sql.autoBroadcastJoinThreshold"
        val skewFix = "spark.sql.adaptive.skewJoin.enabled"
        val prev = spark.conf.get(bcast)
        spark.conf.set(bcast, "-1")
        try {
          probe(s"skew_shuffle_aqe_hotjoin_x$m",
            hotLineitem.join(small, Seq("p_partkey")))
          spark.conf.set(skewFix, "false")
          probe(s"skew_shuffle_noaqe_hotjoin_x$m",
            hotLineitem.join(small, Seq("p_partkey")))
          spark.conf.set(skewFix, "true")
          probe(s"skew_salted_hotjoin_x$m",
            graft.ops.Skew.saltedJoin(hotLineitem, small, "p_partkey",
              parts = 32))
        } finally { spark.conf.set(bcast, prev); spark.conf.set(skewFix, "true") }
      }
      probe(s"w4_sessionize_x$m", Sessions.sessionSummary(evts(m),
        "user_id", "ts", gapSeconds = 1800, tieBreak = "event_id"))
      // SCD2 intervals: same one-key-exchange discipline as w4 — key
      // space ×m, per-key run history fixed
      probe(s"w8_scd2_x$m", Sessions.stateIntervals(
        evtsT(m), "user_id", "ts", "event_type", "event_id"))
      // cohort retention: the distinct (user, week) collapse is the
      // only corpus-sized exchange; everything after is user-count
      probe(s"w7_cohort_x$m", {
        val um = evtsT(m).select(col("user_id"),
          date_trunc("week", col("ts")).as("m0")).distinct()
        val ch = um.groupBy("user_id").agg(min(col("m0")).as("c"))
        um.join(ch, "user_id")
          .groupBy(col("c"),
            (datediff(col("m0"), col("c")) / 7).cast("long").as("k"))
          .agg(countDistinct(col("user_id")).as("n_active"))
      })
      probe(s"sm2_stratified_x$m", Sampling.stratifiedSample(docsS(m),
        "source", "id", 20))
      // mixture weights: corpus reduces to #strata rows at the
      // combiners — the probe shows scan-rate regardless of m
      probe(s"sm6_temp_weights_x$m",
        Sampling.temperatureWeights(docsS(m), "source", tau = 2.0))
      // token budget cap: fixed budget, growing corpus — survivors
      // stay budget-sized per stratum, the per-stratum sort is the
      // linear cost (the contract is best-first, so it is inherent)
      probe(s"sm7_token_cap_x$m", {
        val d = docsS(m)
          .withColumn("q9",
            round(graft.ops.TextAnalysis.qualityScore(col("text")), 9))
          .withColumn("tok",
            graft.ops.TextAnalysis.tokenCountWs(col("text")).cast("long"))
        Sampling.tokenBudgetCap(d, "source", col("tok"), budget = 800L,
          Seq(col("q9").desc, col("id").asc))
      })
      // decontamination: the corpus grows, the eval set does NOT (the
      // realistic shape) — contamination mass grows with the corpus'
      // leaked fraction, the broadcast side stays fixed
      probe(s"dc1_decontam_x$m", {
        val bench = Tables.documents(spark, dir)
          .filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + 50000000L).as("bench_id"),
            regexp_replace(col("text"), "^\\S+\\s+\\S+\\s+", "").as("text"))
        graft.ops.Decontamination.contaminationPairs(docs(m), "id", "text",
          bench, "bench_id", "text", n = 8, minShared = 2)
      })
      // bigram LM: the count tables grow sub-linearly (vocab), the
      // scoring join mass ∝ total bigrams (scan-linear), the per-doc
      // fold is one (id) exchange — the Zipf-skewed (w1,w2) join is
      // the watched hazard (AQE skew split)
      probe(s"ts12_bigram_lm_x$m", graft.ops.TextAnalysis.bigramLmScore(
        docs(m), "id", "text"))
      // PQ ADC: codebook and query batch FIXED, corpus grows m-fold —
      // the cost model is the scan-linear ideal (codes never shuffle,
      // the group-limit caps the exchange at k rows/query/partition);
      // rerank adds one shortlist-sized SHUFFLE_HASH re-attach
      probe(s"ss10_pq_adc_x$m", {
        val v = vecs(m)
        SimilaritySearch.pqTopK(v.filter(col("id") < 10), v,
          "id", "embedding", k = 5, m = 8, ks = 16, dim = 64)
      })
      probe(s"ss11_pq_rerank_x$m", {
        val v = vecs(m)
        SimilaritySearch.pqRerankTopK(v.filter(col("id") < 10), v,
          "id", "embedding", k = 5, shortlist = 20, m = 8, ks = 16,
          dim = 64)
      })
      // BPE: the vocabulary is FIXED under replication (same words,
      // 10x the frequency) — training cost should be flat; the one
      // corpus-scale stage is the word count
      probe(s"ts13_bpe_x$m", {
        import spark.implicits._
        graft.ops.Bpe.learnMerges(docs(m), "text", numMerges = 6)
          .toDF()
      })
      // production merge count: 224 merges as 224 sequential driver
      // round-trips (classic) vs 7 batched rounds — the scale dial
      // the ts13b gate pins; run once, the vocab is m-independent
      if (m == 1) {
        probe(s"ts13_bpe_224merges_x$m",
          graft.ops.Bpe.learnMerges(docs(1), "text", numMerges = 224))
        probe(s"ts13b_bpe_7x32batched_x$m",
          graft.ops.Bpe.learnMergesBatched(docs(1), "text", rounds = 7,
            batchSize = 32))
      }
      // TF-IDF: tf rows x m, vocab fixed; the term join build side
      // stays vocabulary-sized
      probe(s"ts15_tfidf_x$m", graft.ops.TextAnalysis.tfidfTopK(
        docs(m), "id", "text", k = 5))
      // count-min build vs exact token top-k over the same stream:
      // the sketch pass carries constant-size state through the agg
      // (shuffleMB ≈ 0) where the exact side pays the token exchange —
      // the measured bytes ARE the 100 TB argument for sketching
      probe(s"ts16_cms_build_x$m", {
        import spark.implicits._
        val toks = docs(m).select(
          explode(split(trim(col("text")), "\\s+")).as("item"))
          .filter(col("item") =!= "")
        val sk = graft.ops.Sketches.cmsBuild(toks, "item")
        Seq(sk.totalCount()).toDF("total")
      })
      // BM25 at m×: the corpus token stream reduces AT THE SCAN to
      // query-term postings, so the ranking must track the scan cost,
      // not the token mass (doc-length stats are the only full-token
      // aggregation and they combine map-side)
      probe(s"ts17_bm25_x$m", graft.ops.TextAnalysis.bm25TopK(
        docs(m), "id", "text", Seq("hash", "join", "vector"), k = 10))
      // stored BM25 probe (ts21): the inverted index is built UNTIMED
      // (amortized over queries, the d20 discipline); the timed part
      // is one query probing term-pruned postings + broadcast stats.
      // Read against ts17_bm25_x$m: that is the full corpus
      // re-tokenize + re-aggregate the stored probe replaces.
      if (selected(s"ts21_stored_bm25_x$m")) {
        val tmp = java.nio.file.Files
          .createTempDirectory(s"probe-ts21-x$m").toString
        try {
          val store = new graft.ops.ParquetTableStore(tmp)
          graft.ops.TextAnalysis.bm25BuildIndex(docs(m), "id", "text", store)
          probe(s"ts21_stored_bm25_x$m",
            graft.ops.TextAnalysis.bm25TopKStored(spark, store,
              Seq("hash", "join", "vector"), k = 10))
        } finally org.apache.commons.io.FileUtils
          .deleteDirectory(new java.io.File(tmp))
      }
      // NB classifier train+score at m×: two combinable aggregations
      // (token×label counts) + the position-ordered fold — must track
      // the corpus linearly like the ts12 LM it shares disciplines with
      probe(s"ts18_nb_classifier_x$m", {
        val d = docs(m)
        val pass = graft.ops.TextAnalysis.gopherFilter(d, "text",
          maxDupTokenPct = 60, maxTopBigramPct = 5,
          minTokens = 25, maxTokens = 100)
          .select(col("id")).withColumn("__q", lit(true))
        val labeled = d.join(pass, Seq("id"), "left")
          .withColumn("quality", coalesce(col("__q"), lit(false)))
        graft.ops.TextAnalysis.nbQualityScores(labeled, "id", "text",
          "quality")
      })
      probe(s"ts16_exact_topk_x$m", {
        val toks = docs(m).select(
          explode(split(trim(col("text")), "\\s+")).as("item"))
          .filter(col("item") =!= "")
        toks.groupBy("item").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("item")).limit(20)
      })
      // repeated n-grams, dup-heavy worst case: replication makes
      // EVERY gram cross-doc, so the >=minDocs filter keeps the
      // whole gram mass instead of killing the singleton tail — the
      // honest adversarial input for this audit
      probe(s"d13_ngram_audit_x$m", Dedup.repeatedNgramSpans(
        docs(m), "id", "text", n = 12, minDocs = 2))
      // the exact-text-key twin: same plan shape, variable-length gram
      // strings as the exchange key — the shuffleMB delta vs the
      // hashed default is the 100 TB argument in bytes
      probe(s"d13_ngram_textkey_x$m", Dedup.repeatedNgramSpans(
        docs(m), "id", "text", n = 12, minDocs = 2, hashedKey = false))
      // the span CUT (d18): dup-heavy replication makes every window
      // of every copy a duplicate — the worst-case cut mass (every
      // doc but the first copy empties). noop-materialized: count()
      // would prune the whole cut subtree (unique-keyed outer join
      // cannot change cardinality)
      probeNoop(s"d18_span_cut_x$m", Dedup.cutRepeatedNgramSpans(
        docs(m), "id", "text", n = 12))
      // funnel: key space grows with m, per-key history fixed
      probe(s"w5_funnel_x$m", {
        val e = Tables.events(spark, dir)
          .select(col("user_id"), col("event_id"), col("ts"),
            col("event_type"), col("value"))
        val rep = (0 until m).map(i => e.select(
            (col("user_id") + i * 10000000L).as("user_id"),
            (col("event_id") + i * 10000000L).as("event_id"),
            col("ts"), col("event_type"), col("value")))
          .reduce(_ unionByName _)
        Sessions.funnelStages(rep.filter(col("value") > 100.0),
          "user_id", "ts", "event_type", "event_id",
          Seq("signup", "view", "click", "purchase"),
          universe = Some(rep))
      })
      // chunk -> pack: both scan-rate; output rows grow linearly
      probe(s"sp1_chunk_pack_x$m", graft.ops.Packing.packSummary(
        graft.ops.TextAnalysis.chunk(docs(m), "id", "text", 64, 48)
          .withColumn("ck", concat_ws(":", col("id"), col("chunk_no"))),
        "ck", "n_tokens", budgetTokens = 256, numShards = 32))
      // incremental near-dup: the corpus is ALREADY indexed (stored
      // artifacts, built untimed below — a deployment amortizes that
      // over every batch); the timed part is one fixed-size batch
      // probe. Read against d2_minhash_x$m above: that is the full
      // re-mine the probe replaces. Candidate mass still grows ∝ m
      // here because the replicated corpus makes every batch doc
      // near-dup to m copies — the honest dup-heavy worst case.
      if (selected(s"d10_incremental_x$m")) {
        val tmp = java.nio.file.Files
          .createTempDirectory(s"probe-d10-x$m").toString
        try {
          val sigs = Dedup.lshSignatures(docs(m), "id", "text")
          sigs.write.mode("overwrite").parquet(s"$tmp/sigs")
          Dedup.lshBandIndex(sigs, bucketCap = 1000)
            .write.mode("overwrite").parquet(s"$tmp/index")
          val batch = Tables.documents(spark, dir)
            .filter(col("doc_id") % 10 === 0)
            .select((col("doc_id") + 90000000L).as("id"),
              regexp_replace(col("text"), "^\\S+\\s+", "").as("text"))
          probe(s"d10_incremental_x$m", Dedup.incrementalLshPairs(
            batch, "id", "text", spark.read.parquet(s"$tmp/index"),
            spark.read.parquet(s"$tmp/sigs"), threshold = 0.6))
        } finally org.apache.commons.io.FileUtils
          .deleteDirectory(new java.io.File(tmp))
      }
      // incremental clustering: stored labels + index built untimed
      // (amortized over every batch); timed = one fixed batch's
      // probe + rep-graph merge. Read against d9_clusters_x$m: that
      // is the full re-cluster this replaces.
      if (selected(s"d12_incr_clusters_x$m")) {
        val tmp = java.nio.file.Files
          .createTempDirectory(s"probe-d12-x$m").toString
        try {
          val corpus = docs(m)
          val pairs = Dedup.minhashLshPairs(corpus, "id", "text",
            shingleLen = 3, numHashes = 32, bands = 8, threshold = 0.6,
            bucketCap = 1000).select("id_a", "id_b")
          ConnectedComponents.duplicateClusters(pairs)
            .write.mode("overwrite").parquet(s"$tmp/clusters")
          val sigs = Dedup.lshSignatures(corpus, "id", "text")
          sigs.write.mode("overwrite").parquet(s"$tmp/sigs")
          Dedup.lshBandIndex(sigs, bucketCap = 1000)
            .write.mode("overwrite").parquet(s"$tmp/index")
          val batch = Tables.documents(spark, dir)
            .filter(col("doc_id") % 10 === 0)
            .select((col("doc_id") + 95000000L).as("id"),
              regexp_replace(col("text"), "^\\S+\\s+", "").as("text"))
          probe(s"d12_incr_clusters_x$m", ConnectedComponents.mergeClusters(
            spark.read.parquet(s"$tmp/clusters"),
            Dedup.incrementalLshPairs(batch, "id", "text",
              spark.read.parquet(s"$tmp/index"),
              spark.read.parquet(s"$tmp/sigs"), threshold = 0.6)
              .select("corpus_id", "new_id")))
        } finally org.apache.commons.io.FileUtils
          .deleteDirectory(new java.io.File(tmp))
      }
      // stored IVF probe: index built untimed; the timed probe
      // assigns only the 10-query batch and joins the stored members
      if (selected(s"ss9_stored_probe_x$m")) {
        val tmp = java.nio.file.Files
          .createTempDirectory(s"probe-ss9-x$m").toString
        try {
          val (cb, members) = SimilaritySearch.ivfIndexFrames(vecs(m),
            "id", "embedding",
            numCentroids = math.max(32, math.sqrt(2000.0 * m).toInt),
            cellCap = 1000)
          cb.write.mode("overwrite").parquet(s"$tmp/cb")
          members.write.mode("overwrite").parquet(s"$tmp/members")
          probe(s"ss9_stored_probe_x$m", SimilaritySearch.probeStoredIvf(
            vecs(1).filter(col("id") < 10), vecs(m), "id", "embedding",
            spark.read.parquet(s"$tmp/cb"),
            spark.read.parquet(s"$tmp/members"), k = 5, probes = 8))
        } finally org.apache.commons.io.FileUtils
          .deleteDirectory(new java.io.File(tmp))
      }
      probe(s"ss2_lsh_ann_x$m", SimilaritySearch.lshTopK(
        vecs(1).filter(col("id") < 10), vecs(m), "id", "embedding",
        k = 5, planes = 6, tables = 4, bucketCap = 200))
      probe(s"ss3_ivf_ann_x$m", SimilaritySearch.ivfTopK(
        vecs(1).filter(col("id") < 10), vecs(m), "id", "embedding",
        k = 5, numCentroids = math.max(32, math.sqrt(2000.0 * m).toInt),
        probes = 8, cellCap = 1000))
      probe(s"ss5_q8_ivf_ann_x$m", SimilaritySearch.quantizedIvfTopK(
        vecs(1).filter(col("id") < 10), vecs(m), "id", "embedding",
        k = 5, numCentroids = math.max(32, math.sqrt(2000.0 * m).toInt),
        probes = 8, cellCap = 1000))
      // recall canary: fixed |Q|, growing corpus — the exact side is
      // the |Q| x n brute-force scan (linear, the canary's cost), the
      // IVF side rides the scaled-cells index, the eval join itself
      // stays k x |Q|-sized at every m
      probe(s"ss8_recall_x$m", {
        val q = vecs(1).filter(col("id") < 10)
        SimilaritySearch.recallAtK(
          SimilaritySearch.bruteForceTopK(q, vecs(m), "id", "embedding",
            k = 5),
          SimilaritySearch.ivfTopK(q, vecs(m), "id", "embedding", k = 5,
            numCentroids = math.max(32, math.sqrt(2000.0 * m).toInt),
            probes = 2, cellCap = 1000),
          k = 5)
      })
      // one distributed Lloyd step: assignment rides the scan against
      // a broadcast codebook, the update is one (cell, pos) exchange
      // of dim x n rows — linear by construction, measured here
      probe(s"ss7_kmeans_step_x$m", {
        val e = vecs(m)
        val assign = graft.ops.Ivf.assignments(e, "id", "embedding",
          numCentroids = math.max(32, math.sqrt(2000.0 * m).toInt),
          probes = 1)
        graft.ops.VectorAggregates.labelCentroids(e.join(assign, "id"),
          "centroid_id", "id", "embedding")
      })
      // interval join: daily service windows over the growing event
      // log — interval count grows with distinct days (fixed here),
      // points with m; the bucket equi-join stays linear
      probe(s"j11_range_join_x$m", {
        val ev = evts(m).select(col("event_id"), col("ts"))
        val windows = evts(1)
          .select(to_date(col("ts")).as("day")).distinct()
          .select(col("day"),
            (col("day").cast("timestamp") +
              expr("INTERVAL 6 HOURS")).as("lo"),
            (col("day").cast("timestamp") +
              expr("INTERVAL 18 HOURS")).as("hi"))
        graft.ops.TemporalJoins.rangeJoin(ev, "ts", windows, "lo", "hi",
          bucketSeconds = 21600)
          .groupBy("day").agg(count(lit(1)).as("n"))
      })
      val _ = nDocs
    }

    // STREAMING-LOOP cost decomposition (round-10 item: the two
    // heaviest bench lines had no probe curve). Three knobs isolated:
    //  - PHASES at fixed doc mass (p1/p2/p4): each extra AvailableNow
    //    invocation pays one standup + per-batch commit round — the
    //    slope of total vs phases is the per-invocation fixed cost
    //    (later phases also pay the cross-corpus probe, so the slope
    //    reads as an UPPER bound on pure standup);
    //  - STANDUP-ONLY (the `_empty` row): an invocation over an
    //    already-checkpointed inbox with no new files — the floor
    //    every scheduled run pays even when there is nothing to do;
    //  - MASS (the x`mult` row, single phase): marginal per-doc cost
    //    at 10× the corpus, dup-heavy like every probe here.
    def stGrid(opName: String, mkRun: (String, String,
        graft.ops.ParquetTableStore) =>
        org.apache.spark.sql.streaming.StreamingQuery): Unit = {
      if (!selected(opName)) return
      val base = Tables.documents(spark, dir)
        .select(col("doc_id").as("id"), col("text"))
      def cell(label: String, phases: Int, mass: => Seq[DataFrame]): Unit = {
        val root = graft.ops.Scratch.tempDir(s"probe-$opName-$label-")
        val store = new graft.ops.ParquetTableStore(s"$root/store")
        val inDir = s"$root/in"
        val ck = s"$root/ck"
        val slices = mass
        val s0 = drainedShuffleWrite()
        val t0 = System.nanoTime()
        slices.foreach { sl =>
          sl.coalesce(1).write.mode("append").parquet(inDir)
          mkRun(inDir, ck, store).awaitTermination()
        }
        val secs = (System.nanoTime() - t0) / 1e9
        val mb = (drainedShuffleWrite() - s0) / 1e6
        val n1 = s"${opName}_$label"
        println(f"PROBE $n1%-34s $secs%8.2f s  rows=  (phases=$phases)  shuffleMB=$mb%9.1f")
        // standup-only: same checkpointed query, zero new files
        val e0 = drainedShuffleWrite()
        val t1 = System.nanoTime()
        mkRun(inDir, ck, store).awaitTermination()
        val esecs = (System.nanoTime() - t1) / 1e9
        val emb = (drainedShuffleWrite() - e0) / 1e6
        val n2 = s"${opName}_${label}_empty"
        println(f"PROBE $n2%-34s $esecs%8.2f s  rows=  (standup)      shuffleMB=$emb%9.1f")
      }
      def phased(p: Int): Seq[DataFrame] =
        (0 until p).map(i => base.filter(pmod(col("id"), lit(p)) === i))
      // untimed warmup on a 2% slice: the first ingest pays the whole
      // LSH/commit path's JIT+codegen (~4-5 s measured), which would
      // otherwise land entirely on the p1 row and invert the grid
      locally {
        val root = graft.ops.Scratch.tempDir(s"probe-$opName-warm-")
        val store = new graft.ops.ParquetTableStore(s"$root/store")
        base.filter(pmod(col("id"), lit(50)) === 0).coalesce(1)
          .write.parquet(s"$root/in")
        mkRun(s"$root/in", s"$root/ck", store).awaitTermination()
      }
      cell("p1", 1, phased(1))
      cell("p2", 2, phased(2))
      cell("p4", 4, phased(4))
      cell(s"x$mult", 1, Seq(docs(mult)))
    }
    // ts25: lexical APPEND cost must track the DELTA, not the corpus
    // (the d10 discipline measured for the BM25 index): build the
    // index over the m× corpus, then fold in a FIXED 500-doc delta —
    // the append row should stay ~flat across m while the rebuild row
    // grows with it. The default id-validation scan (one postings
    // id-column read) is included — it is part of the honest append
    // cost; `validateNewIds=false` removes it for trusted feeds.
    if (selected("ts25")) {
      val base = Tables.documents(spark, dir)
        .select(col("doc_id").as("id"), col("text"))
      val delta = base.filter(col("id") % 10 === 0)
        .select((col("id") + 990000000L).as("id"), col("text"))
      for (m <- Seq(1, mult)) {
        val root = graft.ops.Scratch.tempDir(s"probe-ts25-x$m-")
        val store = new graft.ops.ParquetTableStore(s"$root/store")
        val s0 = drainedShuffleWrite()
        val t0 = System.nanoTime()
        graft.ops.TextAnalysis.bm25BuildIndex(docs(m), "id", "text", store)
        val bsecs = (System.nanoTime() - t0) / 1e9
        val bmb = (drainedShuffleWrite() - s0) / 1e6
        val n1 = s"ts25_build_x$m"
        println(f"PROBE $n1%-34s $bsecs%8.2f s  rows=  (rebuild)      shuffleMB=$bmb%9.1f")
        val a0 = drainedShuffleWrite()
        val t1 = System.nanoTime()
        graft.ops.TextAnalysis.bm25AppendIndex(delta, "id", "text", store)
        val asecs = (System.nanoTime() - t1) / 1e9
        val amb = (drainedShuffleWrite() - a0) / 1e6
        val n2 = s"ts25_append500_x$m"
        println(f"PROBE $n2%-34s $asecs%8.2f s  rows=  (delta)        shuffleMB=$amb%9.1f")
        probe(s"ts25_probe_x$m", graft.ops.TextAnalysis.bm25TopKStored(
          spark, store, Seq("sort", "window", "stream"), k = 10))
      }
    }
    // g3: incremental triangles — build the artifacts over the m×
    // graph, then fold a FIXED delta; the fold should track the edge
    // SCAN rate (linear in m — anti-join + adjacency + closing joins
    // read the stored set) while the rebuild pays the O(m^1.5) wedge
    // mass, so the gap widens with m. Edges replicate by node offset
    // (disjoint copies of the co-order graph: triangle structure
    // preserved per copy, total mass ×m).
    if (selected("g3")) {
      def edges(m: Int): DataFrame = {
        val e = graft.ops.PageRank.coOrderEdges(Tables.lineitem(spark, dir))
        (0 until m).map(i => e.select(
            (col("src") + i * 10000000L).as("src"),
            (col("dst") + i * 10000000L).as("dst")))
          .reduce(_ unionByName _)
      }
      for (m <- Seq(1, mult)) {
        val root = graft.ops.Scratch.tempDir(s"probe-g3-x$m-")
        val store = new graft.ops.ParquetTableStore(s"$root/store")
        val base = edges(m).filter((col("src") + col("dst")) % 17 =!= 0)
        val delta = edges(1).filter((col("src") + col("dst")) % 17 === 0)
        val t0 = System.nanoTime()
        graft.ops.PageRank.triangleCountsAppend(base, "src", "dst", store)
        println(f"PROBE g3_build_x$m%-27s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=  (build)        shuffleMB=      n/a")
        val t1 = System.nanoTime()
        graft.ops.PageRank.triangleCountsAppend(delta, "src", "dst", store)
        println(f"PROBE g3_fold_x$m%-28s ${(System.nanoTime() - t1) / 1e9}%8.2f s  rows=  (fixed delta)  shuffleMB=      n/a")
        // probeNoop, NOT count() (the ts27 lesson re-learned on this
        // exact row): counts come from a unique-keyed left join, so a
        // count() is provably node-cardinality and Catalyst prunes
        // the ENTIRE triangle enumeration — the 2.4 s "rebuild" the
        // first probe recorded was an empty plan; the real one is
        // ~37 s at x10
        probeNoop(s"g3_rebuild_x$m", graft.ops.PageRank.triangleCounts(
          edges(m), "src", "dst"))
      }
    }
    // g4: incremental PageRank — warm-started fold at tol vs a cold
    // build of the same final graph. The win is ROUNDS (meta.iters:
    // the warm vector starts near the fixpoint) plus the O(delta)
    // edge commit; per-round cost stays edge-mass-linear by contract
    // (contributions flow along every edge), so wall tracks
    // iters × edge mass.
    if (selected("g4")) {
      def edges(m: Int): DataFrame = {
        val e = graft.ops.PageRank.coOrderEdges(Tables.lineitem(spark, dir))
        (0 until m).map(i => e.select(
            (col("src") + i * 10000000L).as("src"),
            (col("dst") + i * 10000000L).as("dst")))
          .reduce(_ unionByName _)
      }
      for (m <- Seq(1, mult)) {
        val root = graft.ops.Scratch.tempDir(s"probe-g4-x$m-")
        val store = new graft.ops.ParquetTableStore(s"$root/store")
        val base = edges(m).filter((col("src") + col("dst")) % 17 =!= 0)
        val delta = edges(1).filter((col("src") + col("dst")) % 17 === 0)
        def iters(st: graft.ops.ParquetTableStore): Int =
          st.read(spark, "pr_meta").head.getAs[Int]("iters")
        val t0 = System.nanoTime()
        graft.ops.PageRank.pageRankAppend(base, "src", "dst", store,
          iterations = 200, tol = 1e-6)
        println(f"PROBE g4_build_x$m%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=  (iters=${iters(store)})  shuffleMB=      n/a")
        val t1 = System.nanoTime()
        graft.ops.PageRank.pageRankAppend(delta, "src", "dst", store,
          iterations = 200, tol = 1e-6)
        println(f"PROBE g4_warm_fold_x$m%-24s ${(System.nanoTime() - t1) / 1e9}%8.2f s  rows=  (iters=${iters(store)})  shuffleMB=      n/a")
        val root2 = graft.ops.Scratch.tempDir(s"probe-g4c-x$m-")
        val store2 = new graft.ops.ParquetTableStore(s"$root2/store")
        val t2 = System.nanoTime()
        graft.ops.PageRank.pageRankAppend(base.unionByName(delta),
          "src", "dst", store2, iterations = 200, tol = 1e-6)
        println(f"PROBE g4_cold_rebuild_x$m%-21s ${(System.nanoTime() - t2) / 1e9}%8.2f s  rows=  (iters=${iters(store2)})  shuffleMB=      n/a")
      }
    }
    // ss17: mutable stored IVF — reindex a FIXED 500-vector delta
    // against the m× index (delta assignment + ONE members scan for
    // the generations), then probe the mutated corpus through the
    // tombstone filter; the rebuild alternative is the build row,
    // which re-assigns the whole corpus and grows with m.
    if (selected("ss17")) {
      for (m <- Seq(1, mult)) {
        val root = graft.ops.Scratch.tempDir(s"probe-ss17-x$m-")
        val store = new graft.ops.ParquetTableStore(s"$root/store")
        val k = math.max(32, math.sqrt(2000.0 * m).toInt)
        val t0 = System.nanoTime()
        graft.ops.SimilaritySearch.ivfBuildIndexStored(vecs(m), "id",
          "embedding", store, numCentroids = k)
        println(f"PROBE ss17_build_x$m%-26s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=  (build)        shuffleMB=      n/a")
        val changed = vecs(1).filter(col("id") < 500)
          .select(col("id"), reverse(col("embedding")).as("embedding"))
        val t1 = System.nanoTime()
        graft.ops.SimilaritySearch.ivfReindexVectors(changed, "id",
          "embedding", store)
        println(f"PROBE ss17_reindex_x$m%-24s ${(System.nanoTime() - t1) / 1e9}%8.2f s  rows=  (fixed delta)  shuffleMB=      n/a")
        val mutated = vecs(m).select(col("id"),
          when(col("id") < 500, reverse(col("embedding")))
            .otherwise(col("embedding")).as("embedding"))
        probe(s"ss17_probe_x$m", graft.ops.SimilaritySearch.ivfTopKStored(
          mutated.filter(col("id") >= 100 && col("id") < 110), mutated,
          "id", "embedding", store, k = 5, probes = 8, cellCap = 1000))
      }
    }
    // u13: zone maps on a bucketed ingest table — m log-structured
    // appends (each replica covers its own narrow id range, the
    // time-correlated shape), then a range read inside replica 0's
    // range: the pruned read's file set stays FLAT with m (one
    // append's files) while the full-scan filter reads m× the files.
    if (selected("u13")) {
      for (m <- Seq(1, mult)) {
        val root = graft.ops.Scratch.tempDir(s"probe-u13-x$m-")
        val store = new graft.ops.ParquetTableStore(s"$root/store",
          keepVersions = 4)
        store.declareZoneColumns("ev", Seq("event_id"))
        def evSlice(i: Int) = Tables.events(spark, dir)
          .select((col("event_id") + i * 10000000L).as("event_id"),
            col("user_id"), col("event_type"))
        (0 until m).foreach(i => store.appendBucketed(spark, "ev",
          evSlice(i), Seq("event_id"), numBuckets = 32))
        val (kept, total) = store.zoneMapFileCounts(spark, "ev",
          "event_id", 1000L, 30000L)
        println(f"PROBE u13_zonemap_files_x$m%-21s kept=$kept%5d of $total%5d")
        probe(s"u13_pruned_read_x$m", store.readZonePruned(spark, "ev",
          "event_id", 1000L, 30000L))
        probe(s"u13_full_filter_x$m", store.read(spark, "ev")
          .filter(col("event_id").between(1000L, 30000L)))
      }
    }
    // ss20: mutable stored PQ — re-encode a FIXED 500-vector delta
    // against the m× codes table (delta encode + ONE codes scan for
    // the generations) and probe through the tombstone filter; the
    // rebuild alternative is the build row, which re-encodes the
    // whole corpus and grows with m. The probe row grows with m BY
    // DESIGN (ADC is the linear scan stage, at m bytes/vector).
    if (selected("ss20")) {
      for (m <- Seq(1, mult)) {
        val root = graft.ops.Scratch.tempDir(s"probe-ss20-x$m-")
        val store = new graft.ops.ParquetTableStore(s"$root/store")
        val t0 = System.nanoTime()
        graft.ops.SimilaritySearch.pqBuildIndexStored(vecs(m), "id",
          "embedding", store, m = 8, ks = 16, dim = 64)
        println(f"PROBE ss20_build_x$m%-26s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=  (build)        shuffleMB=      n/a")
        val changed = vecs(1).filter(col("id") < 500)
          .select(col("id"), reverse(col("embedding")).as("embedding"))
        val t1 = System.nanoTime()
        graft.ops.SimilaritySearch.pqReindexVectors(changed, "id",
          "embedding", store)
        println(f"PROBE ss20_reindex_x$m%-24s ${(System.nanoTime() - t1) / 1e9}%8.2f s  rows=  (fixed delta)  shuffleMB=      n/a")
        val queries = vecs(1).filter(col("id") < 10).select(col("id"),
          when(col("id") % 7 === 0, reverse(col("embedding")))
            .otherwise(col("embedding")).as("embedding"))
        probe(s"ss20_probe_x$m", graft.ops.SimilaritySearch.pqTopKStored(
          queries, "id", "embedding", store, k = 5))
      }
    }
    // ss22: recall of the MUTATED stored IVF-PQ pair at ×1/×m, cells
    // scaled ~sqrt(n) and probes at a fixed quarter of the cells (the
    // documented 100 TB discipline) — the claim is that the recall
    // BAND holds as the corpus and the index grow together; a fixed
    // 32-cell geometry would instead starve (cells 10× as populated,
    // the cap binding away true neighbors)
    if (selected("ss22")) {
      for (m <- Seq(1, mult)) {
        val corpus = vecs(m)
        val nReal = corpus.count()
        val cells = math.max(32,
          math.ceil(math.sqrt(nReal.toDouble)).toInt)
        val probes = math.max(8, cells / 4)
        val root = graft.ops.Scratch.tempDir(s"probe-ss22-x$m-")
        val store = new graft.ops.ParquetTableStore(s"$root/store")
        graft.ops.SimilaritySearch.ivfBuildIndexStored(corpus, "id",
          "embedding", store, numCentroids = cells)
        graft.ops.SimilaritySearch.pqBuildIndexStored(corpus, "id",
          "embedding", store, m = 8, ks = 16, dim = 64)
        graft.ops.SimilaritySearch.ivfPqPairPin(spark, store)
        val delta = corpus.filter(col("id") % 7 === 0)
          .select(col("id"), reverse(col("embedding")).as("embedding"))
        graft.ops.SimilaritySearch.ivfReindexVectors(delta, "id",
          "embedding", store)
        graft.ops.SimilaritySearch.pqReindexVectors(delta, "id",
          "embedding", store)
        graft.ops.SimilaritySearch.ivfPqPairPin(spark, store)
        val mut = corpus.select(col("id"),
          when(col("id") % 7 === 0, reverse(col("embedding")))
            .otherwise(col("embedding")).as("embedding"))
        val queries = mut.filter(col("id") < 10)
        val t0 = System.nanoTime()
        val hits = graft.ops.SimilaritySearch.recallAtK(
          graft.ops.SimilaritySearch.bruteForceTopK(queries, mut, "id",
            "embedding", k = 10),
          graft.ops.SimilaritySearch.ivfPqTopKStored(queries, "id",
            "embedding", store, k = 10, probes = probes,
            cellCap = 100000),
          k = 10).agg(sum("hits")).head.getLong(0)
        println(f"PROBE ss22_recall_x$m%-25s ${(System.nanoTime() - t0) / 1e9}%8.2f s  hits=$hits%3d/100  cells=$cells probes=$probes")
      }
    }
    // ss24: the HYBRID canary at ×1/×m — both stored legs mutate
    // (tombstone-reindexed BM25 postings, reindexed IVF members),
    // then the fused top-10 is scored against the gold fusion
    // (from-scratch BM25 over the mutated corpus + brute-force
    // cosine). Cells/probes scale like the ss22 row, so the band
    // claim is about the COMPOSITION holding as both indexes grow,
    // not a fixed geometry starving
    if (selected("ss24")) {
      for (m <- Seq(1, mult)) {
        val corpus = docs(m)
        val emb = vecs(m)
        val nReal = emb.count()
        val cells = math.max(32,
          math.ceil(math.sqrt(nReal.toDouble)).toInt)
        val probes = math.max(8, cells / 4)
        val root = graft.ops.Scratch.tempDir(s"probe-ss24-x$m-")
        val store = new graft.ops.ParquetTableStore(s"$root/store")
        graft.ops.TextAnalysis.bm25BuildIndex(corpus, "id", "text", store)
        graft.ops.TextAnalysis.bm25ReindexDocs(
          corpus.filter(col("id") % 7 === 0)
            .select(col("id"),
              regexp_replace(col("text"), "^\\S+\\s+", "").as("text")),
          "id", "text", store)
        graft.ops.SimilaritySearch.ivfBuildIndexStored(emb, "id",
          "embedding", store, numCentroids = cells)
        graft.ops.SimilaritySearch.ivfReindexVectors(
          emb.filter(col("id") % 7 === 0)
            .select(col("id"), reverse(col("embedding")).as("embedding")),
          "id", "embedding", store)
        val mutDocs = corpus.select(col("id"),
          when(col("id") % 7 === 0,
            regexp_replace(col("text"), "^\\S+\\s+", ""))
            .otherwise(col("text")).as("text"))
        val mutEmb = emb.select(col("id"),
          when(col("id") % 7 === 0, reverse(col("embedding")))
            .otherwise(col("embedding")).as("embedding"))
        val q = mutEmb.filter(col("id") === 0)
        val t0 = System.nanoTime()
        val fusedStored = graft.ops.SimilaritySearch.rrfFuse(Seq(
          graft.ops.TextAnalysis.bm25TopKStored(spark, store,
            query = Seq("sort", "window", "stream"), k = 20)
            .select(col("id"), col("rank")),
          graft.ops.SimilaritySearch.ivfTopKStored(q, mutEmb, "id",
            "embedding", store, k = 20, probes = probes,
            cellCap = 100000)
            .select(col("neighbor_id").as("id"), col("rank"))), k = 10)
        val fusedGold = graft.ops.SimilaritySearch.rrfFuse(Seq(
          graft.ops.TextAnalysis.bm25TopK(mutDocs, "id", "text",
            query = Seq("sort", "window", "stream"), k = 20)
            .select(col("id"), col("rank")),
          graft.ops.SimilaritySearch.bruteForceTopK(q, mutEmb, "id",
            "embedding", k = 20)
            .select(col("neighbor_id").as("id"), col("rank"))), k = 10)
        val hits = fusedStored.select("id")
          .join(fusedGold.select("id"), "id").count()
        println(f"PROBE ss24_hybrid_recall_x$m%-18s ${(System.nanoTime() - t0) / 1e9}%8.2f s  hits=$hits%2d/10  cells=$cells probes=$probes")
      }
    }
    // u16: auto-maintenance — m× append slices fragment the buckets,
    // then the size-tiered policy collapses them; the row records the
    // files-per-bucket debt before/after and the policy's cost
    if (selected("u16")) {
      for (m <- Seq(1, mult)) {
        val root = graft.ops.Scratch.tempDir(s"probe-u16-x$m-")
        val store = new graft.ops.ParquetTableStore(s"$root/store",
          keepVersions = 40)
        (0 until 8).foreach { i =>
          store.appendBucketed(spark, "docs",
            docs(m).filter(col("id") % 8 === i), Seq("id"),
            numBuckets = 32)
        }
        def maxFiles(): Long = store.fileManifest(spark, "docs").get
          .selectExpr("regexp_extract(file, '__kb=(\\\\d+)/', 1) AS b")
          .filter(col("b") =!= "").groupBy("b").count()
          .agg(max("count")).head.getLong(0)
        val before = maxFiles()
        val t0 = System.nanoTime()
        val rewritten = store.autoMaintain(spark, "docs",
          maxFilesPerBucket = 4)
        println(f"PROBE u16_automaint_x$m%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s  files/bucket $before%2d -> ${maxFiles()}%2d (rewrote ${rewritten.size} buckets)")
      }
    }
    // ts30: unigram-LM induction — the corpus term is ONE wordFreq
    // scan; EM rounds are vocabulary-sized (candidate join + per-word
    // DP + combinable rollup), so wall should track the VOCAB growth
    // curve (distinct words grow sublinearly under m× id-offset
    // replication: every copy repeats the same words)
    if (selected("ts30"))
      for (m <- Seq(1, mult))
        probe(s"ts30_unigram_x$m", graft.ops.UnigramLm.trainVocab(
          docs(m), "text", iters = 2, keepPieces = 120))
    // ts28: tombstone reindex of a FIXED 500-doc slice against the m×
    // index — one postings scan + delta work, vs the full rebuild row
    // (ts25_build_xm) that re-tokenizes the whole corpus
    if (selected("ts28")) {
      for (m <- Seq(1, mult)) {
        val root = graft.ops.Scratch.tempDir(s"probe-ts28-x$m-")
        val store = new graft.ops.ParquetTableStore(s"$root/store")
        graft.ops.TextAnalysis.bm25BuildIndex(docs(m), "id", "text", store)
        val changed = Tables.documents(spark, dir)
          .select(col("doc_id").as("id"),
            regexp_replace(col("text"), "^\\S+\\s+", "").as("text"))
          .filter(col("id") % 10 === 0)
        val t0 = System.nanoTime()
        graft.ops.TextAnalysis.bm25ReindexDocs(changed, "id", "text", store)
        println(f"PROBE ts28_reindex500_x$m%-21s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=  (reindex)      shuffleMB=      n/a")
        probe(s"ts28_probe_x$m", graft.ops.TextAnalysis.bm25TopKStored(
          spark, store, Seq("sort", "window", "stream"), k = 10))
      }
    }
    // ts27: DSIR weights — fixed target model, corpus at scan rate
    // (the λ frame is bucket-sized and broadcast; shuffle should be
    // the (id, slot) reduce, linear in corpus feature mass)
    if (selected("ts27")) {
      val target = Tables.documents(spark, dir)
        .filter(col("text").contains("vector")).select("text")
      // probeNoop, NOT count(): a count over the total-coverage left
      // join is provably corpus-cardinality, so Catalyst prunes the
      // whole weight subtree and the row times an empty plan
      for (m <- Seq(1, mult))
        probeNoop(s"ts27_dsir_x$m", graft.ops.TextAnalysis.dsirWeights(
          docs(m), "id", "text", target, "text"))
    }
    // st13: streaming curation — screen a FIXED 50-doc batch against
    // an m×-grown digest ledger. The ledger is fp-bucketed and the
    // screen reads only the batch's touched buckets, so per-batch
    // cost is bounded by touched-bucket MASS — flat across m only
    // when the bucket count scales with the corpus (the deployment
    // sizing rule: buckets ∝ corpus keeps bucket size constant). The
    // probe applies that rule (64·m buckets); a fixed small grid at
    // x10 would honestly show the full-ledger re-read a mis-sized
    // deployment pays.
    if (selected("st13")) {
      // two bucket-sizing policies at each scale: buckets ∝ corpus
      // (constant bucket mass — the deployment rule) vs a FIXED grid
      // (touched-bucket mass grows with the corpus). The spread
      // between the two x-mult screen rows attributes the growth:
      // policy-proportional cost is O(buckets) version fixed cost
      // (untouched-bucket sharing, listing), fixed-grid cost is the
      // ledger data mass a mis-sized deployment re-reads.
      for (m <- Seq(1, mult); (policy, nb) <- Seq(
          ("prop", 64 * m), ("fix64", 64)); if m > 1 || policy == "prop") {
        val root = graft.ops.Scratch.tempDir(s"probe-st13-$policy-x$m-")
        val store = new graft.ops.ParquetTableStore(s"$root/store")
        val bench = docs(1).filter(col("id") % 97 === 0)
          .select((col("id") + 50000000L).as("bench_id"), col("text"))
        val in = s"$root/in"
        def run(): Unit = {
          val q = graft.streaming.Streams.curationIngest(spark, in,
            s"$root/ck", store, bench, "bench_id", "text",
            numBuckets = nb)
          try q.awaitTermination(600000)
          finally if (q.isActive) q.stop()
        }
        docs(m).coalesce(8).write.mode("append").parquet(in)
        val t0 = System.nanoTime()
        run()
        println(f"PROBE st13_seed_${policy}_x$m%-21s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=  (seed)         shuffleMB=      n/a")
        // the fixed delta: 25 exact copies of stored text (must fall
        // to the ledger check) + 25 perturbed survivors
        docs(1).filter(col("id") < 50)
          .select((col("id") + 980000000L).as("id"),
            when(col("id") % 2 === 0, col("text"))
              .otherwise(concat(lit("fresh probe row "), col("text")))
              .as("text"))
          .coalesce(1).write.mode("append").parquet(in)
        val t1 = System.nanoTime()
        run()
        println(f"PROBE st13_screen50_${policy}_x$m%-17s ${(System.nanoTime() - t1) / 1e9}%8.2f s  rows=  (fixed delta)  shuffleMB=      n/a")
      }
    }
    stGrid("st1_neardup_ingest",
      (in, ck, st) => graft.streaming.Streams.nearDupIngest(spark, in, ck, st))
    stGrid("st2_cluster_ingest",
      (in, ck, st) => graft.streaming.Streams.clusterIngest(spark, in, ck, st))
    // store: the two StoreIo profiles under the bucketed write paths.
    // POSIX shares untouched bucket files by hard link (O(1)/file);
    // the S3-style profile COPIES them (server-side COPY modeled as a
    // file copy) — so the append/upsert rows should stay ~flat across
    // m on posix and grow with TABLE size on object, while the
    // replace rows (everything rewritten, nothing shared) track each
    // other. That cost curve is what a deployment moving the store
    // off POSIX signs up for, measured rather than asserted.
    if (selected("store")) {
      // inflate the payload ~20× (≈2 KB/row): the profiles differ in
      // how untouched bucket FILES replicate across versions, so the
      // table needs real byte mass for the curve to register — at the
      // raw fixture size both profiles finish in filesystem-cache
      // noise and the probe would "prove" copies are free
      def fat(m: Int): DataFrame = docs(m).select(col("id"),
        concat_ws(" ", array_repeat(col("text"), 20)).as("text"))
      val delta = fat(1)
        .filter(col("id") % 10 === 0)
        .select((col("id") + 990000000L).as("id"), col("text"))
      def timedStore(name: String)(op: => Unit): Unit = {
        val t0 = System.nanoTime()
        op
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"PROBE $name%-34s $secs%8.2f s  rows=  (commit)       shuffleMB=      n/a")
      }
      for ((ioName, io) <- Seq(("posix", graft.ops.PosixStoreIo),
          ("object", graft.ops.ObjectStoreIo)); m <- Seq(1, mult)) {
        val root = graft.ops.Scratch.tempDir(s"probe-store-$ioName-x$m-")
        val store = new graft.ops.ParquetTableStore(s"$root/store", io = io)
        timedStore(s"store_${ioName}_create_x$m")(
          store.replaceBucketed(spark, "t", fat(m), Seq("id")))
        timedStore(s"store_${ioName}_append500_x$m")(
          store.appendBucketed(spark, "t", delta, Seq("id")))
        timedStore(s"store_${ioName}_upsert500_x$m")(
          store.upsertBucketed(spark, "t", delta, Seq("id")))
        timedStore(s"store_${ioName}_replace_x$m")(
          store.replaceBucketed(spark, "t", fat(m), Seq("id")))
      }
    }
    // CDC catch-up: a FIXED-size mutation span (~1% upserts + a few
    // deletes, hash-spread keys) folded onto a replica at ×1 and
    // ×mult table size — under the deployment bucket discipline
    // (buckets ∝ table, bucket SIZE fixed: a 100 TB table carries
    // 10⁵ buckets, not 32 fat ones). changesBetween and
    // applyChangesBucketed pay O(touched-bucket DATA) = O(delta keys
    // × bucket size), so their rows should stay ~flat across m,
    // while the full-rebuild alternative (what a consumer without a
    // change feed must do) rescans the whole table and tracks m.
    // u19 receipt: a replica/fork bootstrap via zero-copy clone
    // (O(files) link calls, no parquet decode) vs the read-encode-
    // write rebuild (O(data)) — clone cost should stay ~flat as the
    // table grows 10×, the rebuild should track it.
    if (selected("clone")) {
      def timedStore(name: String)(op: => Unit): Unit = {
        val t0 = System.nanoTime()
        op
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"PROBE $name%-34s $secs%8.2f s  rows=  (commit)       shuffleMB=      n/a")
      }
      def fat(m: Int): DataFrame = docs(m).select(col("id"),
        concat_ws(" ", array_repeat(col("text"), 20)).as("text"))
      for (m <- Seq(1, mult)) {
        val n = 32 * m
        val root = graft.ops.Scratch.tempDir(s"probe-clone-x$m-")
        val store = new graft.ops.ParquetTableStore(s"$root/store",
          keepVersions = 10)
        store.replaceBucketed(spark, "src", fat(m), Seq("id"),
          numBuckets = n)
        timedStore(s"clone_link_x$m")(
          store.cloneTable(spark, "src", "fork"))
        timedStore(s"clone_rebuild_x$m")(
          store.replaceBucketed(spark, "fork2",
            store.read(spark, "src"), Seq("id"), numBuckets = n))
      }
    }

    // u18 receipt: a consumer that stalls TEN spans behind (protected
    // by its registered cursor) catches up in ONE changesBetween +
    // ONE atomic apply — the catch-up fold's cost vs folding each
    // span individually (10 reads + 10 commits) and vs the rebuild.
    // The span union dedups re-touched buckets and the derived table
    // versions once, so deep catch-up should beat per-span folding.
    if (selected("cdcdeep")) {
      def timedStore(name: String)(op: => Unit): Unit = {
        val t0 = System.nanoTime()
        op
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"PROBE $name%-34s $secs%8.2f s  rows=  (commit)       shuffleMB=      n/a")
      }
      def fat(m: Int): DataFrame = docs(m).select(col("id"),
        concat_ws(" ", array_repeat(col("text"), 20)).as("text"))
      for (m <- Seq(1, mult)) {
        val n = 32 * m
        val root = graft.ops.Scratch.tempDir(s"probe-cdcdeep-x$m-")
        val store = new graft.ops.ParquetTableStore(s"$root/store",
          keepVersions = 20)
        store.replaceBucketed(spark, "src", fat(m), Seq("id"),
          numBuckets = n)
        val vBase = store.currentVersion("src").get
        store.cloneTable(spark, "src", "repDeep")
        store.cloneTable(spark, "src", "repStep")
        // ten fixed-size spans (each ~50 updates on distinct strides)
        val spanBases = (0 until 10).map { i =>
          val vPrev = store.currentVersion("src").get
          store.upsertBucketed(spark, "src",
            fat(1).filter(col("id") % 100 === i.toLong)
              .select(col("id"),
                concat(col("text"), lit(s" upd$i")).as("text")),
            Seq("id"))
          vPrev
        }
        val vHead = store.currentVersion("src").get
        timedStore(s"cdcdeep_catchup1_x$m")(
          store.applyChangesBucketed(spark, "repDeep",
            store.changesBetween(spark, "src", Seq("id"), vBase, vHead),
            Seq("id"), numBuckets = n))
        timedStore(s"cdcdeep_perspan10_x$m")(
          spanBases.zipWithIndex.foreach { case (vPrev, i) =>
            val vTo = if (i == 9) vHead else spanBases(i + 1)
            store.applyChangesBucketed(spark, "repStep",
              store.changesBetween(spark, "src", Seq("id"), vPrev, vTo),
              Seq("id"), numBuckets = n)
          })
        val a = store.read(spark, "repDeep").count()
        val b = store.read(spark, "repStep").count()
        require(a == b, s"cdcdeep: catch-up $a rows != per-span $b rows")
      }
    }

    if (selected("cdc")) {
      def timedStore(name: String)(op: => Unit): Unit = {
        val t0 = System.nanoTime()
        op
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"PROBE $name%-34s $secs%8.2f s  rows=  (commit)       shuffleMB=      n/a")
      }
      def fat(m: Int): DataFrame = docs(m).select(col("id"),
        concat_ws(" ", array_repeat(col("text"), 20)).as("text"))
      for (m <- Seq(1, mult)) {
        val n = 32 * m // bucket size fixed, count tracks the table
        val root = graft.ops.Scratch.tempDir(s"probe-cdc-x$m-")
        val store = new graft.ops.ParquetTableStore(s"$root/store",
          keepVersions = 10)
        store.replaceBucketed(spark, "src", fat(m), Seq("id"),
          numBuckets = n)
        val vBase = store.currentVersion("src").get
        store.replaceBucketed(spark, "rep",
          store.readVersion(spark, "src", vBase), Seq("id"),
          numBuckets = n)
        // the span: fixed-size regardless of m (the delta is what a
        // follower pays for, not the table)
        store.upsertBucketed(spark, "src",
          fat(1).filter(col("id") % 100 === 0)
            .select(col("id"), concat(col("text"), lit(" upd")).as("text")),
          Seq("id"))
        store.deleteBucketed(spark, "src",
          fat(1).filter(col("id") % 997 === 0).select("id"), Seq("id"))
        val vHead = store.currentVersion("src").get
        probe(s"cdc_changes_x$m",
          store.changesBetween(spark, "src", Seq("id"), vBase, vHead))
        timedStore(s"cdc_apply_x$m")(
          store.applyChangesBucketed(spark, "rep",
            store.changesBetween(spark, "src", Seq("id"), vBase, vHead),
            Seq("id"), numBuckets = n))
        timedStore(s"cdc_full_rebuild_x$m")(
          store.replaceBucketed(spark, "rep2", store.read(spark, "src"),
            Seq("id"), numBuckets = n))
        // the portable receipt — I/O VOLUME, not local wall (at this
        // fixture size commit fixed costs dominate seconds): bytes
        // actually REWRITTEN by the catch-up vs the rebuild. Carried
        // files are hard links (nlink ≥ 2); fresh files are nlink 1.
        def freshBytes(table: String): (Long, Long) = {
          val p = java.nio.file.Paths.get(s"$root/store", table)
          val vdir = java.nio.file.Files.list(p).iterator()
          import scala.jdk.CollectionConverters._
          val dirs = vdir.asScala.filter(d =>
            d.getFileName.toString.startsWith("v=")).toSeq
          val live = dirs.maxBy(d =>
            d.getFileName.toString.stripPrefix("v=").takeWhile(_.isDigit).toLong)
          val files = java.nio.file.Files.walk(live).iterator().asScala
            .filter(java.nio.file.Files.isRegularFile(_))
            .filter(f => f.getFileName.toString.endsWith(".parquet") &&
              !live.relativize(f).toString.split('/')
                .exists(s => s.startsWith("_") && !s.startsWith("__kb=")))
            .toSeq
          val fresh = files.filter(f => java.nio.file.Files
            .getAttribute(f, "unix:nlink").asInstanceOf[Number]
            .longValue() == 1L)
          (fresh.map(java.nio.file.Files.size).sum,
            files.map(java.nio.file.Files.size).sum)
        }
        val (af, at) = freshBytes("rep")
        val (rf, rt) = freshBytes("rep2")
        println(f"PROBE cdc_apply_io_x$m%-22s rewrittenMB=${af / 1e6}%8.1f of ${at / 1e6}%8.1f  rebuildMB=${rf / 1e6}%8.1f of ${rt / 1e6}%8.1f")
      }
    }
    spark.stop()
  }
}
