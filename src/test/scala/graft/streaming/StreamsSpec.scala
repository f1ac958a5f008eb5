package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.ParquetTableStore

class StreamsSpec extends SparkSpec {

  test("inbox stream: files flow through parse + conditional upsert") {
    val inbox = tmpDir("sinbox")
    val store = new ParquetTableStore(tmpDir("sstore"))
    // seed the stored table: v1 plain (loses to timestamped), v2 timestamped
    import spark.implicits._
    store.commit(spark, "transcripts", Seq(
      ("aaaaaaaaaaa", "old plain"),
      ("bbbbbbbbbbb", "[00:09] old timed")).toDF("video_id", "transcript"))

    Files.write(Paths.get(inbox, "one.txt"),
      "URL: https://youtu.be/aaaaaaaaaaa\n\n[00:01] new timed".getBytes)
    Files.write(Paths.get(inbox, "two.txt"),
      "URL: https://youtu.be/bbbbbbbbbbb\n\nnew plain".getBytes)
    Files.write(Paths.get(inbox, "three.txt"),
      "URL: https://youtu.be/ccccccccccc\n\nfresh insert".getBytes)
    Files.write(Paths.get(inbox, "bad.txt"), "no id\n\nbody".getBytes)

    val q = Streams.inboxStream(spark, inbox, store, "transcripts")
    try q.processAllAvailable() finally q.stop()

    val got = store.read(spark, "transcripts").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map(
      "aaaaaaaaaaa" -> "[00:01] new timed", // timestamped incoming wins
      "bbbbbbbbbbb" -> "[00:09] old timed", // plain incoming loses
      "ccccccccccc" -> "fresh insert"))     // unmatched inserted
  }

  test("event windowed counts with watermark (memory sink)") {
    import spark.implicits._
    val dir = tmpDir("sev")
    Seq(
      ("2024-01-01 00:00:10", "click"),
      ("2024-01-01 00:01:10", "click"),
      ("2024-01-01 00:07:00", "view")
    ).toDF("ts_s", "event_type")
      .select(to_timestamp(col("ts_s")).as("ts"), col("event_type"))
      .write.mode("overwrite").parquet(dir)

    val stream = spark.readStream
      .schema("ts timestamp, event_type string")
      .parquet(dir)
    val q = Streams.eventCounts(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("ec").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("ec")
      .select(date_format(col("w_start"), "HH:mm").as("w"), col("event_type"), col("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set(("00:00", "click", 2L), ("00:05", "view", 1L)))
  }
}
