package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Zone-clustered-compaction receipt: how many files a range query
  * scans over a store table grown in RANDOM zone-column order,
  * before and after a `clusterBy` compaction
  * ([[graft.ops.ParquetTableStore.compactBuckets]]) — the cut-quality
  * gap plain as-is compaction can never close (an organically-grown
  * table's per-file min/max ranges all overlap, so data skipping
  * keeps everything; sorting each bucket and slicing into fixed-row
  * files makes every file a tight disjoint range).
  *
  * Prints one row per phase: files total, files scanned by a 2%-range
  * query, rows returned (must be identical across phases), wall ms.
  *
  * Usage: runMain graft.tools.ClusterProbe [rowsPerAppend] [appends]
  *        [buckets] [rowsPerFile] */
object ClusterProbe {
  def main(args: Array[String]): Unit = {
    val rowsPer = if (args.length > 0) args(0).toInt else 250000
    val appends = if (args.length > 1) args(1).toInt else 8
    val buckets = if (args.length > 2) args(2).toInt else 8
    val rowsPerFile = if (args.length > 3) args(3).toLong else 125000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val root = graft.ops.Scratch.fastDir("graft-cluster-probe-")
    val store = new graft.ops.ParquetTableStore(s"$root/store",
      keepVersions = 2)
    store.declareZoneColumns("t", Seq("ts"))
    val span = 10000000L
    for (b <- 0 until appends) {
      // every append spans the FULL ts range — organic growth
      val df = spark.range(b.toLong * rowsPer, (b + 1L) * rowsPer)
        .select(col("id"),
          pmod(hash(col("id") * 2654435761L), lit(span)).cast("long")
            .as("ts"),
          concat(lit("payload-"), col("id")).as("v"))
      store.appendBucketed(spark, "t", df, Seq("id"), buckets)
    }
    val lo = 1000000L
    val hi = lo + span / 50 // a 2% range
    def measure(phase: String): Long = {
      val q = store.read(spark, "t").filter(col("ts").between(lo, hi))
      val t0 = System.nanoTime()
      // execute THIS frame (count() would plan its own tree and leave
      // this one's scan metrics empty)
      val n = q.collect().length.toLong
      val ms = (System.nanoTime() - t0) / 1000000
      val scanned = q.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.head.metrics("numFiles").value
      val (total, _) = store.fileStats(spark, "t")
      println(f"$phase%-12s files=$total%5d scanned=$scanned%5d " +
        f"rows=$n%8d wall_ms=$ms%6d")
      n
    }
    val before = measure("shuffled")
    var t0 = System.nanoTime()
    store.compactBuckets(spark, "t", maxFilesPerBucket = 1,
      clusterBy = Some("ts"), clusterRowsPerFile = rowsPerFile)
    println(f"cluster-compact wall_ms=${(System.nanoTime() - t0) / 1000000}")
    val after = measure("clustered")
    require(before == after, s"rows drifted: $before != $after")
    spark.stop()
  }
}
