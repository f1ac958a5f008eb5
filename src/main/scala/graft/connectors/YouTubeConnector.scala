package graft.connectors

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S8/S9/S10 connector boundary (SURVEY §7.4 hard part #3).
  *
  * The reference's scrapers (pytube playlist listing
  * main_scraper.py:183-216, yt-dlp metadata + transcript API
  * youtube_utils.py:30-218, channel HTML regex scraping
  * scrape_my_channel.py:230-444) are non-deterministic network I/O.
  * The engine sees them only as DataFrames behind this trait, so every
  * pipeline is hermetic and oracle-testable; a live implementation
  * performs its HTTP inside `mapPartitions` over the request
  * work-list (executor-side fan-out with connector-side rate
  * limiting — the distributed replacement for the reference's
  * 1 req/s sequential loop).
  */
trait YouTubeConnector {

  /** S10: playlists of a channel → (playlist_id, title, url). */
  def channelPlaylists(spark: SparkSession, channelRef: String): DataFrame

  /** S8: current contents of playlists → (playlist_id, video_id,
    * position), position 1-based in playlist order. Input: work-list
    * DataFrame with a playlist_id column. */
  def playlistContents(spark: SparkSession, playlists: DataFrame): DataFrame

  /** S9: full metadata + best transcript for a video work-list →
    * videos-shaped rows plus (language, transcript) columns; the
    * language preference chain (manual en > generated en > first)
    * is resolved connector-side like youtube_utils.py:170-190. */
  def scrapeVideos(spark: SparkSession, videoIds: DataFrame): DataFrame
}

/** Deterministic offline connector: synthesizes stable fake remote
  * state from the requested ids (seeded by id content, not time), so
  * pipeline tests are reproducible and need no network. */
final class FakeYouTubeConnector(membershipPerPlaylist: Int = 3)
    extends YouTubeConnector {

  override def channelPlaylists(spark: SparkSession, channelRef: String): DataFrame = {
    import spark.implicits._
    (1 to 5).map(i => (s"PL_${channelRef}_$i", s"Playlist $i of $channelRef",
      s"https://www.youtube.com/playlist?list=PL_${channelRef}_$i"))
      .toDF("playlist_id", "title", "url")
  }

  override def playlistContents(spark: SparkSession, playlists: DataFrame): DataFrame =
    playlists.select(col("playlist_id"))
      .withColumn("position", explode(sequence(lit(1), lit(membershipPerPlaylist))))
      .withColumn("video_id",
        concat(lit("v"), substring(md5(
          concat(col("playlist_id"), lit(":"), col("position"))), 1, 10)))
      .select("playlist_id", "video_id", "position")

  override def scrapeVideos(spark: SparkSession, videoIds: DataFrame): DataFrame =
    videoIds.select(col("video_id"))
      .withColumn("title", concat(lit("Video "), col("video_id")))
      .withColumn("description", concat(lit("About "), col("video_id")))
      .withColumn("channel", lit("fake-channel"))
      .withColumn("publish_date",
        to_date(lit("2024-01-01")) + (pmod(
          graft.functions.TextFunctions.portableHash64(col("video_id")),
          lit(365L))).cast("int"))
      .withColumn("duration_seconds",
        pmod(graft.functions.TextFunctions.portableHash64(col("video_id")),
          lit(7200L)).cast("int"))
      .withColumn("view_count",
        pmod(graft.functions.TextFunctions.portableHash64(col("video_id")),
          lit(5000000000L)))
      .withColumn("author", lit("Fake Author"))
      .withColumn("channel_id", lit("UC" + "f" * 22))
      .withColumn("thumbnail_url",
        concat(lit("https://i.ytimg.com/vi/"), col("video_id"), lit("/hq.jpg")))
      .withColumn("video_url",
        concat(lit("https://www.youtube.com/watch?v="), col("video_id")))
      .withColumn("language", lit("en"))
      .withColumn("transcript",
        concat(lit("[00:01] transcript of "), col("video_id")))
}
