package graft
import org.apache.spark.sql.SparkSession
/** Ad-hoc single-query timer: runMain graft.BenchOne <sfDir> <name>... */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { name =>
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, sfDir).write.mode("overwrite").format("noop").save()
        println(f"TIMING $name ${(System.nanoTime()-t0)/1e9}%.2f s")
      } catch { case e: Throwable => println(s"TIMING $name FAILED ${e.getMessage.take(100)}") }
    }
    spark.stop()
  }
}
