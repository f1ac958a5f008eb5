package graft.tools

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.SparkSession

/** Store-metadata scale probe: a synthetic version with N data files
  * (default 100k, the 100 TB order of magnitude) laid out in the
  * store's bucketed convention, with its `_manifest` sidecar — then
  * measure the two metadata paths against each other:
  *
  *  - file stats via the MANIFEST (one parquet read, distributed
  *    aggregate, O(1) driver rows) vs via the DIRECTORY WALK (the
  *    pre-manifest fallback — N list/stat calls on the driver);
  *  - the compaction TRIGGER derivation (files-per-bucket) via the
  *    manifest rollup (≤ numBuckets driver rows) vs the walk;
  *  - the driver-retained footprint of the rollup collect (256 rows)
  *    vs collecting every file path (the shape the old pruned-read
  *    total took).
  *
  * The data files are empty placeholders — every measured path reads
  * METADATA only (listings, sizes, the manifest parquet), never file
  * contents, so the probe isolates exactly the cost the manifest
  * removes. On a local SSD the walk is cheap; on an object store each
  * LIST is a paged RPC — the measured call-count collapse (N+buckets
  * list/stat calls → 1 sidecar read) is the portable result, the
  * wall-clock ratio is the local lower bound.
  *
  * Usage: runMain graft.tools.ManifestProbe [nFiles] [nBuckets] */
object ManifestProbe {
  def main(args: Array[String]): Unit = {
    val nFiles = if (args.length > 0) args(0).toInt else 100000
    val nBuckets = if (args.length > 1) args(1).toInt else 256
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val root = graft.ops.Scratch.fastDir("graft-manifest-probe-")
    val tdir = Paths.get(root, "t")
    val vdir = tdir.resolve("v=0")
    Files.createDirectories(vdir)
    Files.write(tdir.resolve("_CURRENT"), "v=0".getBytes,
      StandardOpenOption.CREATE)
    Files.write(tdir.resolve("_BUCKETS"), nBuckets.toString.getBytes,
      StandardOpenOption.CREATE)
    var t0 = System.nanoTime()
    val rows = (0 until nFiles).map { i =>
      val b = i % nBuckets
      (s"__kb=$b/part-$i.snappy.parquet", 1024L + i % 7)
    }
    rows.groupBy(_._1.split('/').head).foreach { case (d, fs) =>
      val bd = vdir.resolve(d)
      Files.createDirectories(bd)
      fs.foreach { case (rel, _) =>
        Files.createFile(bd.resolve(rel.split('/')(1)))
      }
    }
    println(f"PROBE synth_layout_${nFiles / 1000}k            ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($nFiles files / $nBuckets buckets)")
    // the sidecar, written the store's way: one file when small,
    // rel-path-range SLICES at scale (parallel parse + footer-stat
    // slice skipping for bucket-restricted reads)
    t0 = System.nanoTime()
    val slices = math.max(1L, math.min(32L,
      (nFiles + 131071L) / 131072L)).toInt
    val mdf = rows.toDF("file", "bytes")
    (if (slices <= 1) mdf.coalesce(1)
     else mdf.repartitionByRange(slices,
       org.apache.spark.sql.functions.col("file"))
       .sortWithinPartitions("file"))
      .write.parquet(vdir.resolve("_manifest").toString)
    println(f"PROBE manifest_write_${nFiles / 1000}k          ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($slices slice(s))")

    val store = new graft.ops.ParquetTableStore(root)

    // file stats: manifest read vs directory walk
    t0 = System.nanoTime()
    val (mc, mb) = store.fileStats(spark, "t")
    val tManifest = (System.nanoTime() - t0) / 1e9
    println(f"PROBE fileStats_manifest_${nFiles / 1000}k      $tManifest%8.2f s  (count=$mc bytes=$mb)")
    t0 = System.nanoTime()
    var walkCount = 0L
    val walk = Files.walk(vdir)
    try walk.iterator().forEachRemaining { p =>
      if (Files.isRegularFile(p) &&
          !p.getParent.getFileName.toString.startsWith("_manifest") &&
          !p.getFileName.toString.startsWith("_")) {
        Files.size(p); walkCount += 1
      }
    } finally walk.close()
    val tWalk = (System.nanoTime() - t0) / 1e9
    println(f"PROBE fileStats_walk_${nFiles / 1000}k          $tWalk%8.2f s  (count=$walkCount — ${nFiles + nBuckets} list/stat calls vs 1 read)")
    require(mc == walkCount, s"manifest count $mc != walk count $walkCount")

    // compaction trigger: counts-per-bucket from the manifest
    // (compactBuckets with a sky-high threshold derives the counts
    // and publishes nothing — exactly the trigger path)
    t0 = System.nanoTime()
    val rewritten = store.compactBuckets(spark, "t",
      maxFilesPerBucket = Int.MaxValue)
    println(f"PROBE compact_trigger_${nFiles / 1000}k         ${(System.nanoTime() - t0) / 1e9}%8.2f s  (manifest rollup, rewrite=${rewritten.size}, $nBuckets driver rows)")

    // driver-retained footprint: the ≤ nBuckets rollup vs every path
    def used(): Long = {
      System.gc(); Thread.sleep(100); System.gc()
      Runtime.getRuntime.totalMemory() - Runtime.getRuntime.freeMemory()
    }
    val base = used()
    val rollup = store.fileManifest(spark, "t").get
      .selectExpr("regexp_extract(file, '__kb=(\\\\d+)/', 1) as b")
      .groupBy("b").count().collect()
    val afterRollup = used()
    val allPaths = store.fileManifest(spark, "t").get
      .select("file").collect().map(_.getString(0))
    val afterPaths = used()
    println(f"PROBE driver_retained_${nFiles / 1000}k         rollup=${math.max(0L, afterRollup - base) / 1024}%6d KiB (${rollup.length} rows)  all-paths=${math.max(0L, afterPaths - afterRollup) / 1024}%6d KiB (${allPaths.length} rows)")

    // PRUNED-READ STANDUP: a zone-pruned scan that kept K of the N
    // files. The explicit-path route (spark.read.parquet(K paths))
    // re-parses every path string and stands up an InMemoryFileIndex
    // that getFileStatus-es each one (K driver FS calls — K paged
    // HEADs on an object store) before a single byte is planned; the
    // manifest-fed ManifestFileIndex builds its FileStatus array
    // straight from (path, size) rows the sidecar already holds —
    // ZERO filesystem metadata calls. Both force the physical plan
    // (where the listing cost lands); the files are placeholders, so
    // this measures exactly the metadata standup the index removes.
    val kept = rows.zipWithIndex.collect { case (r, i) if i % 2 == 0 => r }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("__kb",
        org.apache.spark.sql.types.IntegerType)))
    t0 = System.nanoTime()
    val explicitDf = spark.read.schema(schema)
      .parquet(kept.map(r => vdir.resolve(r._1).toString): _*)
    explicitDf.queryExecution.executedPlan
    val tExplicit = (System.nanoTime() - t0) / 1e9
    println(f"PROBE pruned_standup_paths_${nFiles / 1000}k    $tExplicit%8.2f s  (${kept.size} explicit paths, K getFileStatus calls)")
    t0 = System.nanoTime()
    val idxDf = graft.sources.ManifestFileIndex.frame(spark,
      vdir.toUri.toString, schema, kept)
    idxDf.queryExecution.executedPlan
    val tIndex = (System.nanoTime() - t0) / 1e9
    println(f"PROBE pruned_standup_index_${nFiles / 1000}k    $tIndex%8.2f s  (${kept.size} manifest rows, 0 FS calls)")

    // PLAIN-READ STANDUP (round 15: EVERY store read plans through
    // the manifest): store.read = one driver-side sidecar read +
    // index build + plan, vs the legacy route = recursive partition
    // discovery over all N files before a byte is planned. The
    // canonical schema sidecar makes the manifest path engage (and
    // the placeholder files never need their footers opened).
    Files.write(vdir.resolve("_schema.json"),
      schema.json.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      StandardOpenOption.CREATE)
    t0 = System.nanoTime()
    store.read(spark, "t").queryExecution.executedPlan
    val tPlainIdx = (System.nanoTime() - t0) / 1e9
    println(f"PROBE plain_read_manifest_${nFiles / 1000}k     $tPlainIdx%8.2f s  (store.read: sidecar+index, 0 LIST calls)")
    t0 = System.nanoTime()
    store.readLegacy(spark, "t").queryExecution.executedPlan
    val tPlainList = (System.nanoTime() - t0) / 1e9
    println(f"PROBE plain_read_listing_${nFiles / 1000}k      $tPlainList%8.2f s  (recursive discovery, ~$nFiles list/stat calls)")

    // BUCKET-RESTRICTED standup: a 3-bucket probe (the readBucketsOf
    // shape every upsert/delete/index probe plans) — with sliced
    // manifests the parse touches ONLY slices whose footer rel-path
    // range intersects the requested bucket prefixes
    t0 = System.nanoTime()
    import spark.implicits._ // schema read path needs the canonical file
    val probed = store.readBucketsOf(spark, "t",
      Seq(1L, 2L, 3L).toDF("k"))._1
    probed.queryExecution.executedPlan
    val tRestricted = (System.nanoTime() - t0) / 1e9
    println(f"PROBE bucket_restricted_${nFiles / 1000}k       $tRestricted%8.2f s  (3-bucket probe, slice-skipped parse)")
    spark.stop()
  }
}
