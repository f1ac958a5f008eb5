package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Per-stage profiler: runs catalog queries and prints one line per
  * completed stage — wall, executor-cpu, task count, records, shuffle
  * bytes, spill — so a slow query pins to a stage with evidence.
  * Usage: runMain graft.tools.StageProfile <sfDir> <name...> */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val lines = mutable.ArrayBuffer[String]()
    // jobId → callsite, stageId → jobId: the broadcast/commit stages
    // submitted from futures carry no graft frame in si.details, but
    // the JOB's callsite (captured at submission) survives
    val jobSite = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    val stageJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("")
        jobSite.put(js.jobId, site)
        js.stageIds.foreach(sid => stageJob.put(sid, js.jobId))
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        val wall = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1e3
        // first graft-owned frame in the stage's callsite stack — the
        // future-wrapped broadcast/commit stages all share the same
        // anonymous si.name, which made per-stage attribution blind
        val graftSite = si.details.linesIterator
          .find(l => l.contains("graft.") && !l.contains("graft.tools."))
          .map(_.trim.replaceAll("^at ", "").take(70)).getOrElse("")
        lines += f"STAGE ${si.stageId}%4d tasks=${si.numTasks}%4d wall=$wall%7.2fs " +
          f"cpu=${m.executorCpuTime / 1e9}%8.2fs run=${m.executorRunTime / 1e3}%8.2fs " +
          f"in=${m.inputMetrics.recordsRead}%9d sw=${m.shuffleWriteMetrics.bytesWritten / 1048576}%6dMB " +
          f"sr=${m.shuffleReadMetrics.totalBytesRead / 1048576}%6dMB " +
          f"spill=${m.diskBytesSpilled / 1048576}%5dMB  " +
          f"${si.name.takeWhile(_ != '\n').take(40)}  " +
          f"job=${Option(stageJob.get(si.stageId)).map(j =>
            jobSite.getOrDefault(j, "")).getOrElse("")}  $graftSite"
      }
    })

    args.drop(1).foreach { name =>
      lines.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).write.mode("overwrite").format("noop").save()
      val dt = (System.nanoTime() - t0) / 1e9
      // give the listener bus a moment to drain
      Thread.sleep(1500)
      println(s"======== $name  total=${"%.2f".format(dt)}s ========")
      lines.sortBy(_.substring(6, 10).trim.toInt).foreach(println)
    }
    spark.stop()
  }
}
