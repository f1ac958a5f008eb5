package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Debug helper: execute a catalog query and print the FINAL adaptive
  * physical plan (what actually ran, post-AQE), unlike ExplainAudit's
  * static view. Usage: runMain graft.tools.FinalPlan <sfDir> <name...> */
object FinalPlan {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      // Execute df's OWN QueryExecution (a .write would re-plan a
      // clone and leave this plan un-executed / isFinalPlan=false):
      // the printed tree is then the runtime-final adaptive plan,
      // ReusedExchange / ReusedShuffle nodes included.
      df.queryExecution.toRdd.count()
      println(s"======== $name (final adaptive plan) ========")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
