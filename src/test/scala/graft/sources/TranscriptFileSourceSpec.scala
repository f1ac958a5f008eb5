package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TranscriptFileSourceSpec extends SparkSpec {

  private def writeInbox(): String = {
    val dir = tmpDir("dsv2")
    Files.write(Paths.get(dir, "a.txt"),
      "TITLE: A\nURL: https://youtu.be/aaaaaaaaaaa\n\n[00:01] body a".getBytes)
    Files.write(Paths.get(dir, "b.srt"),
      "ID: bbbbbbbbbbb\n\nbody b".getBytes)
    Files.write(Paths.get(dir, "bad.txt"), "no id\n\nbody".getBytes)
    Files.write(Paths.get(dir, "ignored.json"), "{}".getBytes)
    dir
  }

  test("reads an inbox dir as a table via format shortName") {
    val df = spark.read.format("transcript-inbox").load(writeInbox())
    val rows = df.orderBy("path").collect()
    assert(rows.length == 3) // json file filtered by extension
    val byId = df.filter(col("valid"))
      .select("video_id", "transcript").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(byId == Map(
      "aaaaaaaaaaa" -> "[00:01] body a",
      "bbbbbbbbbbb" -> "body b"))
    assert(df.filter(!col("valid"))
      .select("reject_reason").head.getString(0) == "no video id")
  }

  test("column pruning reaches the scan") {
    val df = spark.read.format("transcript-inbox").load(writeInbox())
      .select("video_id", "valid")
    val scanDesc = df.queryExecution.executedPlan.toString()
    assert(scanDesc.contains("columns=video_id,valid"), scanDesc.take(400))
    assert(df.filter(col("valid")).count() == 2)
  }

  test("integrates with SQL and the rest of the engine") {
    spark.read.format("transcript-inbox").load(writeInbox())
      .createOrReplaceTempView("inbox")
    val n = spark.sql(
      "SELECT count(*) FROM inbox WHERE valid AND transcript LIKE '%body%'")
      .head.getLong(0)
    assert(n == 2)
  }
}
