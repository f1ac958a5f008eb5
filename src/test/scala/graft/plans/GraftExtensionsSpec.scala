package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {

  test("a session built with spark.sql.extensions resolves highlight_context") {
    // extensions only apply at session BUILD time — getOrCreate would
    // silently reuse a previous suite's session, so tear down first
    // (suites run sequentially: Test/parallelExecution := false)
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.getDefaultSession.foreach(_.stop())
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("ext-spec")
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val got = spark.sql(
        "SELECT highlight_context('find the needle here', 'NEEDLE', 4) AS h")
        .head.getString(0)
      assert(got == "the **needle** her")
    } finally spark.stop()
  }
}
