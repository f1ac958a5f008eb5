package graft.schema

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.types._

/** Canonical domain model of the reference engine (SURVEY §1).
  *
  * Mirrors the DDL at reference scrape_my_channel.py:73-122 /
  * run_me.py:77-126, normalized per SURVEY §1.6:
  *  - ISO-8601 TEXT timestamps → TimestampType (session TZ UTC);
  *  - 'YYYY-MM-DD' TEXT dates → DateType;
  *  - view_count INTEGER → LongType (YouTube views exceed 2^31);
  *  - AUTOINCREMENT ping_id → LongType assigned by the writer.
  *
  * Case classes give typed `Dataset[T]` ergonomics; the parallel
  * StructTypes are for schema-on-read (`spark.read.schema(...)`) so
  * ingest never relies on inference.
  */
object Domain {

  /** reference scrape_my_channel.py:73-81 */
  final case class Playlist(
      playlist_id: String,
      title: String,
      url: String,
      item_count: Option[Int],
      last_updated: Option[Timestamp])

  /** reference scrape_my_channel.py:84-99 */
  final case class Video(
      video_id: String,
      title: String,
      description: Option[String],
      channel: Option[String],
      publish_date: Option[Date],
      duration_seconds: Option[Int],
      view_count: Option[Long],
      author: Option[String],
      channel_id: Option[String],
      thumbnail_url: Option[String],
      video_url: Option[String],
      last_scraped_timestamp: Option[Timestamp])

  /** reference scrape_my_channel.py:102-111 — composite PK
    * (playlist_id, video_id), 1-based position. */
  final case class PlaylistVideo(
      playlist_id: String,
      video_id: String,
      position: Option[Int])

  /** reference scrape_my_channel.py:114-122 — PK video_id. */
  final case class Transcript(
      video_id: String,
      language: Option[String],
      transcript: Option[String],
      last_fetched_timestamp: Option[Timestamp])

  /** reference main_scraper.py:233-243 — append-only ping log. */
  final case class PlaylistPing(
      ping_id: Long,
      playlist_id: String,
      pinged_timestamp: Timestamp,
      status: String)

  /** reference playlist_video_extractor.py:24-29 — idempotency ledger. */
  final case class ProcessedPlaylist(
      playlist_url: String,
      processed_at: Timestamp)

  val playlistSchema: StructType = StructType(Seq(
    StructField("playlist_id", StringType, nullable = false),
    StructField("title", StringType, nullable = false),
    StructField("url", StringType, nullable = false),
    StructField("item_count", IntegerType, nullable = true),
    StructField("last_updated", TimestampType, nullable = true)))

  val videoSchema: StructType = StructType(Seq(
    StructField("video_id", StringType, nullable = false),
    StructField("title", StringType, nullable = false),
    StructField("description", StringType, nullable = true),
    StructField("channel", StringType, nullable = true),
    StructField("publish_date", DateType, nullable = true),
    StructField("duration_seconds", IntegerType, nullable = true),
    StructField("view_count", LongType, nullable = true),
    StructField("author", StringType, nullable = true),
    StructField("channel_id", StringType, nullable = true),
    StructField("thumbnail_url", StringType, nullable = true),
    StructField("video_url", StringType, nullable = true),
    StructField("last_scraped_timestamp", TimestampType, nullable = true)))

  val playlistVideoSchema: StructType = StructType(Seq(
    StructField("playlist_id", StringType, nullable = false),
    StructField("video_id", StringType, nullable = false),
    StructField("position", IntegerType, nullable = true)))

  val transcriptSchema: StructType = StructType(Seq(
    StructField("video_id", StringType, nullable = false),
    StructField("language", StringType, nullable = true),
    StructField("transcript", StringType, nullable = true),
    StructField("last_fetched_timestamp", TimestampType, nullable = true)))

  val playlistPingSchema: StructType = StructType(Seq(
    StructField("ping_id", LongType, nullable = false),
    StructField("playlist_id", StringType, nullable = false),
    StructField("pinged_timestamp", TimestampType, nullable = false),
    StructField("status", StringType, nullable = true)))
}
