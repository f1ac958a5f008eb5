package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.functions.YtFunctions
import graft.ingest.TranscriptFiles
import graft.ops.{ParquetTableStore, Upserts}

/** Structured-Streaming shapes for the reference's streaming-ish
  * patterns (SURVEY §2.9).
  *
  *  - [[inboxStream]]: the add_transcripts.py inbox poll → a file
  *    source over the inbox dir; each micro-batch runs the U6
  *    conditional upsert ("timestamped transcripts win") into the
  *    versioned store via foreachBatch. `cleanSource=delete` replaces
  *    the reference's manual unlink-after-success.
  *  - [[eventCounts]]: append-only run-log/ping events → watermarked
  *    tumbling-window counts (the latest-status view stays a batch
  *    window over the log, W3).
  *  - The 7-day refresh loop maps to Trigger.AvailableNow incremental
  *    batches, not a continuous stream — modeled in batch by U7.
  */
object Streams {

  val inboxSchema: StructType = StructType(Seq(
    StructField("path", StringType), StructField("content", StringType)))

  /** Start the streaming inbox: watch `inboxDir` for transcript
    * files, parse each, and conditionally-upsert valid ones into
    * `store`/`table` keyed by video_id. Returns the running query
    * (callers use processAllAvailable in tests, start/await in prod).
    */
  def inboxStream(spark: SparkSession, inboxDir: String,
      store: ParquetTableStore, table: String,
      deleteProcessed: Boolean = false): StreamingQuery = {
    import spark.implicits._
    val files = spark.readStream
      .option("wholetext", "true")
      .option("maxFilesPerTrigger", 16)
      .option("cleanSource", if (deleteProcessed) "delete" else "off")
      .text(inboxDir)
      .select(input_file_name().as("path"), col("value").as("content"))

    files.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val parsed = batch.as[(String, String)]
          .map { case (p, c) => TranscriptFiles.parseContent(p, c) }
          .filter(col("valid"))
          // Option[String] fields encode as nullable string columns
          .select(col("video_id"), col("transcript"))
        // batch-internal dedup then U6 against the stored table
        val incoming = Upserts.dedupKeepLast(parsed, Seq("video_id"),
          Seq(col("transcript")))
        val merged =
          if (!store.exists(table)) incoming
          else Upserts.conditionalUpsert(store.read(spark, table), incoming,
            Seq("video_id")) { (inc, old) =>
            YtFunctions.hasTimestamps(inc("transcript")) ||
              !YtFunctions.hasTimestamps(old("transcript"))
          }
        store.commit(spark, table, merged)
        ()
      }
      .start()
  }

  /** Watermarked tumbling-window event counts over a streaming event
    * log (ts, event_type): the run-log aggregation pattern. */
  def eventCounts(events: DataFrame, window_ : String = "5 minutes",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("event_type"), col("n"))
}
