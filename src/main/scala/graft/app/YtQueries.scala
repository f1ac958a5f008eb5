package graft.app

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.YtFunctions
import graft.plans.HighlightContext

/** The reference's complete interactive query surface (display.py,
  * gui_app.py, web_app.py, viewer_app.py) as a library: every page /
  * route is one pure DataFrame-in → DataFrame-out function, lazily
  * planned — the Streamlit/Flask rendering edge is the only place a
  * collect happens in the reference, and stays out of the library.
  *
  * Semantics preserved deliberately (SURVEY §4.3):
  *  - SQLite LIKE is ASCII-case-insensitive → lower().contains();
  *  - COLLATE NOCASE ordering → sort by lower(title) (raw title and
  *    key as deterministic tie-breaks);
  *  - SQLite bare-column GROUP BY → any_value over PK groups;
  *  - NULL sort placement matches (asc nulls first, desc nulls last).
  */
object YtQueries {

  /** display.py:74-83 — playlist summary: every playlist with its
    * video count (empty playlists kept), most-filled first. */
  def playlistSummary(playlists: DataFrame, playlistVideos: DataFrame): DataFrame =
    playlists.join(playlistVideos, Seq("playlist_id"), "left")
      .groupBy(playlists("playlist_id"), col("title"), col("url"))
      .agg(count(playlistVideos("video_id")).as("video_count"))
      .orderBy(desc("video_count"), asc("playlist_id"))

  /** display.py:93-102 — contents of one playlist with transcript
    * flags, newest first. */
  def playlistVideos(playlistVideos: DataFrame, videos: DataFrame,
      transcripts: DataFrame, playlistId: String): DataFrame = {
    val members = playlistVideos.filter(col("playlist_id") === playlistId)
    val t = transcripts.select(col("video_id"), lit(1).as("has_transcript"))
    members.join(videos, Seq("video_id"))
      .join(t, Seq("video_id"), "left")
      .withColumn("has_transcript", coalesce(col("has_transcript"), lit(0)))
      .select(col("video_id"), col("title"), col("author"),
        col("publish_date"), col("duration_seconds"), col("view_count"),
        col("position"), col("has_transcript"))
      .orderBy(col("publish_date").desc_nulls_last, col("video_id"))
  }

  /** gui_app.py:52-65 — playlist view ordered by curated position
    * then recency, with the transcript-nonempty join condition (P6). */
  def playlistVideosByPosition(playlistVideos: DataFrame, videos: DataFrame,
      transcripts: DataFrame, playlistId: String): DataFrame = {
    val t = transcripts
      .filter(col("transcript").isNotNull && col("transcript") =!= "")
      .select(col("video_id"), lit(1).as("has_transcript"))
    playlistVideos.filter(col("playlist_id") === playlistId)
      .join(videos, Seq("video_id"))
      .join(t, Seq("video_id"), "left")
      .withColumn("has_transcript", coalesce(col("has_transcript"), lit(0)))
      .orderBy(asc_nulls_first("position"), col("publish_date").desc_nulls_last,
        col("video_id"))
  }

  /** display.py:114-121 — which playlists contain this video. */
  def playlistsOfVideo(playlists: DataFrame, playlistVideos: DataFrame,
      videoId: String): DataFrame =
    playlistVideos.filter(col("video_id") === videoId)
      .join(playlists, Seq("playlist_id"))
      .select(col("playlist_id"), col("title"), col("position"))
      .orderBy(lower(col("title")), col("title"), col("playlist_id"))

  /** display.py:131-139 — videos cross-linked into >1 playlist. */
  def crossLinkedVideos(playlistVideos: DataFrame, videos: DataFrame): DataFrame =
    playlistVideos.groupBy("video_id")
      .agg(countDistinct(col("playlist_id")).as("playlist_count"))
      .filter(col("playlist_count") > 1)
      .join(videos.select("video_id", "title"), Seq("video_id"))
      .orderBy(desc("playlist_count"), lower(col("title")), col("video_id"))

  /** display.py:145-187 — dashboard stats: totals, latest scrape,
    * videos-with-transcript count. One row. */
  def summaryStats(playlists: DataFrame, videos: DataFrame,
      transcripts: DataFrame): DataFrame = {
    val p = playlists.agg(count(lit(1)).as("total_playlists"))
    val v = videos.agg(count(lit(1)).as("total_videos"),
      max(col("last_scraped_timestamp")).as("last_scrape"))
    val t = transcripts.agg(count(lit(1)).as("total_transcripts"))
    p.crossJoin(v).crossJoin(t)
  }

  /** display.py:180-187 — top-5 channels by video count. */
  def topChannels(videos: DataFrame, k: Int = 5): DataFrame =
    videos.filter(col("author").isNotNull)
      .groupBy("author").agg(count(lit(1)).as("video_count"))
      .orderBy(desc("video_count"), asc("author"))
      .limit(k)

  /** display.py:547-557 — title search across playlists (LIKE is
    * case-insensitive; bare-column GROUP BY via any_value; cap 100). */
  def searchTitles(videos: DataFrame, playlistVideos: DataFrame,
      playlists: DataFrame, q: String, limit: Int = 100): DataFrame =
    videos.filter(lower(col("title")).contains(q.toLowerCase))
      .join(playlistVideos, Seq("video_id"), "left")
      .join(playlists.select(col("playlist_id"),
        col("title").as("playlist_title")), Seq("playlist_id"), "left")
      .groupBy(col("video_id"))
      .agg(any_value(videos("title")).as("title"),
        any_value(col("author")).as("author"),
        any_value(col("publish_date")).as("publish_date"),
        collect_set(col("playlist_title")).as("playlists"))
      .orderBy(col("publish_date").desc_nulls_last, col("video_id"))
      .limit(limit)

  /** display.py:585-601 — transcript search with ±100-char highlight
    * context (native expression), newest first, cap 50. */
  def searchTranscripts(transcripts: DataFrame, videos: DataFrame,
      q: String, limit: Int = 50): DataFrame =
    transcripts.filter(lower(col("transcript")).contains(q.toLowerCase))
      .join(videos, Seq("video_id"))
      .select(col("video_id"), col("title"), col("publish_date"),
        HighlightContext.highlightContext(col("transcript"), q, 100)
          .as("context"))
      .orderBy(col("publish_date").desc_nulls_last, col("video_id"))
      .limit(limit)

  /** web_app.py:24-41 — playlists API row: per-playlist video count,
    * earliest publish date, latest scrape (decorrelated J7). */
  def playlistsApi(playlists: DataFrame, playlistVideos: DataFrame,
      videos: DataFrame): DataFrame = {
    val stats = playlistVideos.join(videos, Seq("video_id"), "left")
      .groupBy("playlist_id")
      .agg(count(col("video_id")).as("video_count"),
        min(col("publish_date")).as("earliest_video"),
        max(col("last_scraped_timestamp")).as("last_scraped"))
    playlists.join(stats, Seq("playlist_id"), "left")
      .withColumn("video_count", coalesce(col("video_count"), lit(0L)))
      .orderBy(lower(col("title")), col("title"), col("playlist_id"))
  }

  /** gui_app.py:35-46 — sidebar playlist picker with ✅ display names
    * (F12), NOCASE order. */
  def playlistPicker(playlists: DataFrame, playlistVideos: DataFrame): DataFrame =
    playlists.join(playlistVideos, Seq("playlist_id"), "left")
      .groupBy(playlists("playlist_id"), col("title"))
      .agg(count(playlistVideos("video_id")).as("video_count"))
      .withColumn("display_name", YtFunctions.displayName(
        col("title"), col("video_count"), col("playlist_id")))
      .orderBy(lower(col("title")), col("title"), col("playlist_id"))

  /** display.py:304-312 — next free position when appending a video
    * to a playlist (W2). */
  def nextPosition(playlistVideos: DataFrame, playlistId: String): DataFrame =
    playlistVideos.filter(col("playlist_id") === playlistId)
      .agg((coalesce(max(col("position")), lit(0)) + 1).as("next_position"))

  /** display.py:444-462 — video detail row rendered for display:
    * formatted duration (F3) and view count (F11). */
  def videoDetail(videos: DataFrame, transcripts: DataFrame,
      videoId: String): DataFrame =
    videos.filter(col("video_id") === videoId)
      .join(transcripts, Seq("video_id"), "left")
      .withColumn("duration", YtFunctions.formatDuration(col("duration_seconds")))
      .withColumn("views", YtFunctions.formatCount(coalesce(col("view_count"), lit(0L))))
}
