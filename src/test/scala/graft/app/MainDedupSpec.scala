package graft.app

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.{Dedup, ParquetTableStore}

/** The dedup-transcripts CLI command end-to-end over a store with
  * manufactured exact + near duplicates (string video_id keys — the
  * dedup operators must be id-type-generic). */
class MainDedupSpec extends SparkSpec {
  import spark.implicits._

  test("dedup-transcripts runs the two-stage pipeline over string ids") {
    val root = tmpDir("maindedup")
    val store = new ParquetTableStore(root)
    val base = "the quick brown fox jumps over the lazy dog again and again"
    store.commit(spark, "transcripts", Seq(
      ("vid_aaa", base),
      ("vid_bbb", base),                       // exact dup of aaa
      ("vid_ccc", base.replace("quick ", "")), // near dup
      ("vid_ddd", "completely different content about cooking pasta tonight"),
      ("vid_eee", null)                        // must be ignored
    ).toDF("video_id", "transcript"))

    // the CLI command itself must run clean
    Main.run(spark, Array("dedup-transcripts", root, "0.5"))

    // and the pipeline it wires must find exactly the planted structure
    val tx = store.read(spark, "transcripts")
      .select(col("video_id"), col("transcript"))
      .filter(col("transcript").isNotNull)
    val exact = Dedup.exactDuplicates(tx, "video_id", "transcript")
      .filter(col("n_members") > 1).collect()
    assert(exact.length == 1 && exact(0).getString(1) == "vid_aaa"
      && exact(0).getLong(2) == 2)
    val survivors = Dedup.dropExactDuplicates(tx, "video_id", "transcript")
    assert(survivors.count() == 3) // aaa survives, bbb collapsed
    val pairs = Dedup.minhashLshPairs(survivors, "video_id", "transcript",
      threshold = 0.5)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs == Set(("vid_aaa", "vid_ccc")), s"got $pairs")
  }

  test("search-ranked orders transcripts by BM25 relevance") {
    val root = tmpDir("mainrank")
    val store = new ParquetTableStore(root)
    store.commit(spark, "transcripts", Seq(
      ("vid_x", "spark shuffle spark shuffle partitions exchange"),
      ("vid_y", "spark appears once amid entirely unrelated prose here"),
      ("vid_z", "gardening compost tomatoes rainfall harvest pruning")
    ).toDF("video_id", "transcript"))
    store.commit(spark, "videos", Seq(
      ("vid_x", "Shuffle deep dive"), ("vid_y", "Misc"), ("vid_z", "Garden"))
      .toDF("video_id", "title"))
    // the CLI command must run clean over the store
    Main.run(spark, Array("search-ranked", root, "spark shuffle", "2"))
    // and the ranking it wires must put the term-dense doc first and
    // exclude the no-match doc
    val out = graft.ops.TextAnalysis.bm25TopK(
      store.read(spark, "transcripts"), "video_id", "transcript",
      Seq("spark", "shuffle"), k = 5)
      .collect().map(r => (r.getInt(0), r.getString(1)))
    assert(out.map(_._2).toSeq == Seq("vid_x", "vid_y"))
  }

  test("index-search artifacts: stored search-ranked and search-hybrid run the ss14 chain") {
    val root = tmpDir("mainhybrid")
    val store = new ParquetTableStore(root)
    store.commit(spark, "transcripts", Seq(
      ("vid_x", "spark shuffle spark shuffle partitions exchange"),
      ("vid_y", "spark appears once amid entirely unrelated prose here"),
      ("vid_z", "gardening compost tomatoes rainfall harvest pruning"),
      ("vid_w", null) // must be ignored by the index build
    ).toDF("video_id", "transcript"))
    store.commit(spark, "videos", Seq(
      ("vid_x", "Shuffle deep dive"), ("vid_y", "Misc"),
      ("vid_z", "Garden"), ("vid_w", "Null"))
      .toDF("video_id", "title"))
    Main.run(spark, Array("index-search", root, "16"))
    // the index is generic over STRING ids: stored lexical probe
    // equals the from-scratch ranking
    val scratch = graft.ops.TextAnalysis.bm25TopK(
      store.read(spark, "transcripts").filter(col("transcript").isNotNull),
      "video_id", "transcript", Seq("spark", "shuffle"), k = 5)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).toSeq
    val stored = graft.ops.TextAnalysis.bm25TopKStored(spark, store,
      Seq("spark", "shuffle"), k = 5)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).toSeq
    assert(stored == scratch, "stored probe drifted from from-scratch BM25")
    assert(stored.map(_._2) == Seq("vid_x", "vid_y"))
    // vector side round-trips: every indexed transcript has a hash
    // key mapping back to its video_id
    assert(store.read(spark, "tx_vectors").count() == 3)
    // both CLI query paths must run clean over the artifacts
    Main.run(spark, Array("search-ranked", root, "spark shuffle", "2"))
    Main.run(spark, Array("search-hybrid", root, "spark shuffle", "2"))
  }

  test("stale search artifacts: ranked falls back, hybrid warns loudly; coverage reported") {
    val root = tmpDir("mainstale")
    val store = new ParquetTableStore(root)
    store.commit(spark, "transcripts", Seq(
      ("vid_x", "spark shuffle spark shuffle partitions exchange"),
      ("vid_y", "spark appears once amid entirely unrelated prose here"),
      ("vid_z", "gardening compost tomatoes rainfall harvest pruning"),
      ("vid_0", "   ") // whitespace-only: tokenizes EMPTY, never indexed
    ).toDF("video_id", "transcript"))
    store.commit(spark, "videos", Seq(
      ("vid_x", "Shuffle deep dive"), ("vid_y", "Misc"),
      ("vid_z", "Garden"), ("vid_0", "Blank"))
      .toDF("video_id", "title"))
    def captured(args: Array[String]): String = {
      val buf = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(buf, true, "UTF-8")) {
        Main.run(spark, args)
      }
      buf.toString("UTF-8")
    }
    // index-search must REPORT the zero-token doc it omitted — the
    // completeness-honesty rule: a silently smaller tx_vectors table
    // reads as full coverage when it isn't
    val built = captured(Array("index-search", root, "16"))
    assert(built.contains("1 of 4 transcripts tokenized empty"), built)
    assert(store.read(spark, "tx_vectors").count() == 3)
    // fresh index: ranked probes the stored index
    assert(captured(Array("search-ranked", root, "spark shuffle", "2"))
      .contains("probing stored BM25 index"))
    // transcripts move on — the stored artifacts are now STALE
    store.commit(spark, "transcripts", Seq(
      ("vid_x", "spark shuffle spark shuffle partitions exchange"),
      ("vid_n", "brand new spark shuffle document not in the index")
    ).toDF("video_id", "transcript"))
    // ranked detects staleness and falls back to from-scratch (which
    // SEES the new doc); hybrid has no fallback, so it must warn
    // loudly and still answer from the stored artifacts
    val ranked = captured(Array("search-ranked", root, "spark shuffle", "3"))
    assert(ranked.contains("stale"), ranked)
    assert(ranked.contains("falling back"), ranked)
    assert(ranked.contains("vid_n"), ranked)
    val hybrid = captured(Array("search-hybrid", root, "spark shuffle", "2"))
    assert(hybrid.contains("WARNING") && hybrid.contains("stale"), hybrid)
    assert(hybrid.contains("vid_x"), hybrid) // still answers
  }

  test("decontaminate drops benchmark leaks in both modes; original untouched") {
    val root = tmpDir("maindecon")
    val store = new ParquetTableStore(root)
    val leak = (1 to 20).map(i => s"w$i").mkString(" ")
    // the paraphrase: every 8th token reworded — zero shared 8-grams
    val reworded = (1 to 20).map(i =>
      if (i % 8 == 0) s"x$i" else s"w$i").mkString(" ")
    store.commit(spark, "corpus", Seq(
      (1L, leak),                                       // verbatim leak
      (2L, reworded),                                   // paraphrase leak
      (3L, "entirely unrelated prose about gardening and compost heaps today")
    ).toDF("id", "text"))
    val benchDir = tmpDir("maindecon-bench")
    Seq((100L, leak)).toDF("id", "text").write.mode("overwrite").parquet(benchDir)

    Main.run(spark, Array("decontaminate", root, benchDir, "exact", "2"))
    val exact = store.read(spark, "corpus_clean")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(exact == Set(2L, 3L), s"exact mode kept $exact") // paraphrase slips
    Main.run(spark, Array("decontaminate", root, benchDir, "fuzzy", "0.4"))
    val fuzzy = store.read(spark, "corpus_clean")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(fuzzy == Set(3L), s"fuzzy mode kept $fuzzy")   // both leaks caught
    // the audit copy stays intact
    assert(store.read(spark, "corpus").count() == 3)
  }

  test("hot-terms reports the corpus top tokens with the sketch canary") {
    val root = tmpDir("mainhot")
    val store = new ParquetTableStore(root)
    store.commit(spark, "transcripts", Seq(
      ("vid_a", "spark spark spark spark engine engine catalyst"),
      ("vid_b", "spark engine ENGINE Spark"),   // case-folds into the counts
      ("vid_c", null)                           // must be ignored
    ).toDF("video_id", "transcript"))
    // the CLI command must run clean over the store
    Main.run(spark, Array("hot-terms", root, "3"))
    // and the composition it wires must rank (spark 6, engine 4, catalyst 1)
    val toks = store.read(spark, "transcripts")
      .filter(col("transcript").isNotNull)
      .select(explode(split(trim(lower(col("transcript"))), "\\s+")).as("item"))
      .filter(col("item") =!= "")
    val out = graft.ops.Sketches.cmsHeavyHitters(toks, "item", k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    assert(out.toSeq == Seq(("spark", 6L, true), ("engine", 4L, true),
      ("catalyst", 1L, true)))
  }

  test("export-shards + verify-shards: the CLI round-trips; a tamper fails the verify loudly") {
    val root = tmpDir("mainshards")
    val store = new ParquetTableStore(root)
    store.commit(spark, "corpus",
      (1L to 200L).map(i => (i, s"doc $i words here")).toDF("id", "text"))
    val out = tmpDir("mainshards-out") + "/export"
    Main.run(spark, Array("export-shards", root, out, "8", "s:"))
    // clean export verifies through the CLI
    Main.run(spark, Array("verify-shards", root, out))
    // drop a row from one shard: the CLI must refuse with a nonzero
    // exit (sys.error), naming the shard
    val s3 = s"$out/shards/shard=3"
    val rows = spark.read.parquet(s3).collect()
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.drop(1).toSeq),
      spark.read.parquet(s3).schema)
      .coalesce(1).write.mode("overwrite").parquet(s3)
    val e = intercept[RuntimeException] {
      Main.run(spark, Array("verify-shards", root, out))
    }
    assert(e.getMessage.contains("shard(s) 3"), e.getMessage)
  }
}
