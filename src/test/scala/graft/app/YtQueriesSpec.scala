package graft.app

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Domain fixtures per FIXTURES.md A: empty playlists, case-mixed
  * titles, cross-linked videos, missing/empty transcripts, null
  * dates/authors — every §4.3 semantic gotcha has a row here. */
class YtQueriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private def d(s: String) = Date.valueOf(s)

  private lazy val playlists: DataFrame = Seq(
    ("PLa", "alpha list", "u/a", Some(2), Some(ts("2024-01-10 00:00:00"))),
    ("PLb", "Alpha List", "u/b", Some(1), None),
    ("PLc", "zeta", "u/c", None, None),
    ("PLempty", "Empty One", "u/e", Some(0), None)
  ).toDF("playlist_id", "title", "url", "item_count", "last_updated")

  private lazy val videos: DataFrame = Seq(
    ("v1", "Spark Tutorial Part 1", Some("desc"), Some("Chan A"), Some(d("2024-01-05")),
      Some(3723), Some(1234567L), Some("Author One"), None: Option[String]),
    ("v2", "ADVANCED spark tricks", None, Some("Chan A"), Some(d("2024-02-01")),
      Some(123), Some(99L), Some("Author One"), None),
    ("v3", "Cooking pasta", None, Some("Chan B"), None,
      None, None, Some("Author Two"), None),
    ("v4", "Silent video", None, None, Some(d("2023-12-31")),
      Some(10), Some(5L), None, None)
  ).toDF("video_id", "title", "description", "channel", "publish_date",
    "duration_seconds", "view_count", "author", "channel_id")
    .withColumn("thumbnail_url", lit(null).cast("string"))
    .withColumn("video_url", concat(lit("https://www.youtube.com/watch?v="), col("video_id")))
    .withColumn("last_scraped_timestamp",
      when(col("video_id") === "v1", lit(ts("2024-02-10 12:00:00"))))

  private lazy val playlistVideos: DataFrame = Seq(
    ("PLa", "v1", Some(1)), ("PLa", "v2", Some(2)),
    ("PLb", "v1", Some(1)), // v1 cross-linked into PLa and PLb
    ("PLc", "v3", None: Option[Int]) // null position
  ).toDF("playlist_id", "video_id", "position")

  private lazy val transcripts: DataFrame = Seq(
    ("v1", Some("en"), Some("intro [00:15] we discuss Spark shuffles at length here")),
    ("v2", Some("en"), Some("")), // empty text: joins J3 but not P6
    ("v3", Some("de"), Some("kochen und essen"))
  ).toDF("video_id", "language", "transcript")
    .withColumn("last_fetched_timestamp", lit(ts("2024-02-01 00:00:00")))

  test("playlist summary keeps empty playlists, orders by count") {
    val got = YtQueries.playlistSummary(playlists, playlistVideos)
      .select("playlist_id", "video_count")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("PLa", 2L), ("PLb", 1L), ("PLc", 1L), ("PLempty", 0L)))
  }

  test("playlist videos: transcript flag + desc nulls last") {
    val got = YtQueries.playlistVideos(playlistVideos, videos, transcripts, "PLa")
      .select("video_id", "has_transcript")
      .collect().map(r => (r.getString(0), r.getInt(1))).toSeq
    // v2 (2024-02-01) before v1 (2024-01-05); both have transcript rows
    assert(got == Seq(("v2", 1), ("v1", 1)))
  }

  test("gui view: empty transcript does NOT count as has_transcript (P6)") {
    val got = YtQueries.playlistVideosByPosition(
      playlistVideos, videos, transcripts, "PLa")
      .select("video_id", "has_transcript")
      .collect().map(r => (r.getString(0), r.getInt(1))).toSeq
    assert(got == Seq(("v1", 1), ("v2", 0)))
  }

  test("cross-linked videos finds exactly v1") {
    val got = YtQueries.crossLinkedVideos(playlistVideos, videos).collect()
    assert(got.length == 1)
    assert(got(0).getString(0) == "v1" && got(0).getLong(1) == 2L)
  }

  test("title search is ASCII-case-insensitive like SQLite LIKE") {
    val got = YtQueries.searchTitles(videos, playlistVideos, playlists, "SPARK")
      .select("video_id").as[String].collect().toSet
    assert(got == Set("v1", "v2")) // matches 'Spark' and 'spark'
  }

  test("transcript search highlights context via the native expression") {
    val got = YtQueries.searchTranscripts(transcripts, videos, "spark")
      .select("video_id", "context").collect()
    assert(got.length == 1)
    assert(got(0).getString(0) == "v1")
    assert(got(0).getString(1).contains("**Spark**")) // original case kept
  }

  test("playlists API: decorrelated per-playlist stats with empty playlist") {
    val got = YtQueries.playlistsApi(playlists, playlistVideos, videos)
      .select("playlist_id", "video_count").collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == Map("PLa" -> 2L, "PLb" -> 1L, "PLc" -> 1L, "PLempty" -> 0L))
  }

  test("NOCASE ordering: 'alpha list' and 'Alpha List' adjacent, before 'zeta'") {
    val order = YtQueries.playlistsApi(playlists, playlistVideos, videos)
      .select("playlist_id").as[String].collect().toSeq
    assert(order == Seq("PLb", "PLa", "PLempty", "PLc")) // Alpha List < alpha list (tie-break raw)
  }

  test("picker display names: check mark only for non-empty playlists") {
    val got = YtQueries.playlistPicker(playlists, playlistVideos)
      .select("playlist_id", "display_name").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(got("PLa") == "✅ alpha list")
    assert(got("PLempty") == "Empty One")
  }

  test("next position: max+1, and 1 for empty playlist") {
    assert(YtQueries.nextPosition(playlistVideos, "PLa").head.getInt(0) == 3)
    assert(YtQueries.nextPosition(playlistVideos, "PLempty").head.getInt(0) == 1)
  }

  test("summary stats one-rowers") {
    val r = YtQueries.summaryStats(playlists, videos, transcripts).head
    assert(r.getLong(0) == 4 && r.getLong(1) == 4 && r.getLong(3) == 3)
  }

  test("top channels skips null authors") {
    val got = YtQueries.topChannels(videos)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("Author One", 2L), ("Author Two", 1L)))
  }

  test("video detail formats duration and views") {
    val r = YtQueries.videoDetail(videos, transcripts, "v1")
      .select("duration", "views").head
    assert(r.getString(0) == "1h 2m 3s")
    assert(r.getString(1) == "1,234,567")
  }
}
