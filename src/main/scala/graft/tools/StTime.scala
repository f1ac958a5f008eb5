package graft.tools

import org.apache.spark.sql.functions._

/** Throwaway timing harness for the st2 streaming-parity gate:
  * replicates the two-phase schedule with per-step wall times. */
object StTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"TIME $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id").as("id"), col("text"))
    val pert = graft.Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 4 === 0)
      .select((col("doc_id") + 10000).as("id"),
        regexp_replace(col("text"), "^\\S+\\s+", "").as("text"))
    val root = graft.ops.Scratch.tempDir("graft-sttime-")
    val inDir = s"$root/in"
    val ck = s"$root/ck"
    val store = new graft.ops.ParquetTableStore(s"$root/store")
    t("write phase1")(docs.coalesce(1).write.parquet(inDir))
    t("stream phase1")(
      graft.streaming.Streams.clusterIngest(spark, inDir, ck, store)
        .awaitTermination())
    t("write phase2")(pert.coalesce(1).write.mode("append").parquet(inDir))
    t("stream phase2")(
      graft.streaming.Streams.clusterIngest(spark, inDir, ck, store)
        .awaitTermination())
    t("read result")(
      store.read(spark, "dup_clusters").orderBy("id").collect())

    // now the pieces, batch-style, timed individually on phase-1 data
    val b = docs
    val sigs = t("sigs persist+count") {
      val s = graft.ops.Dedup.lshSignatures(b, "id", "text")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      s.count(); s
    }
    val inPairs = t("inPairs eval") {
      val p = graft.ops.Dedup.minhashLshPairsFromSigs(sigs)
        .select(col("id_a").as("u"), col("id_b").as("v"))
      p.count(); p
    }
    t("merge empty+pairs") {
      val stored = spark.range(0).select(col("id"), col("id").as("cluster_id"))
      graft.ops.ConnectedComponents.mergeClusters(stored, inPairs,
        scratchDir = Some(s"$root/cc2"), driverMaxEdges = 1 << 20).count()
    }
    val store2 = new graft.ops.ParquetTableStore(s"$root/store2")
    t("upsert corpus")(
      store2.upsertBucketed(spark, "corpus", b, Seq("id"), 32))
    t("upsert sigs")(
      store2.upsertBucketed(spark, "lsh_signatures", sigs, Seq("id"), 32))
    t("upsert index")(
      store2.upsertBucketed(spark, "lsh_band_index",
        graft.ops.Dedup.lshBandIndex(sigs), Seq("id", "band"), 32))
    sigs.unpersist(false)
    spark.stop()
  }
}
