package graft.app

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.ParquetTableStore

/** The web_app.py façade end-to-end: real HTTP round trips against a
  * seeded store — routes, shapes, the 404 contract, and a clean
  * stop. */
class HttpApiSpec extends SparkSpec {
  import spark.implicits._

  private def get(port: Int, path: String): (Int, String) = {
    val client = HttpClient.newHttpClient()
    val resp = client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path")).build(),
      HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  test("routes serve the reference API shapes; unknown video 404s") {
    val root = tmpDir("httpapi")
    val store = new ParquetTableStore(root)
    store.commit(spark, "playlists", Seq(
      ("PL1", "Alpha", "https://u/PL1"), ("PL2", "Beta", "https://u/PL2"))
      .toDF("playlist_id", "title", "url"))
    store.commit(spark, "videos", Seq(
      ("v1", "First", "2024-01-02", 61, 1200L, "2026-01-01 00:00:00"),
      ("v2", "Second", "2024-03-04", 30, 5L, "2026-01-02 00:00:00"))
      .toDF("video_id", "title", "publish_date", "duration_seconds",
        "view_count", "last_scraped_timestamp")
      .withColumn("publish_date", to_date(col("publish_date")))
      .withColumn("last_scraped_timestamp",
        to_timestamp(col("last_scraped_timestamp"))))
    store.commit(spark, "playlist_videos", Seq(
      ("PL1", "v2", 1), ("PL1", "v1", 2))
      .toDF("playlist_id", "video_id", "position"))
    store.commit(spark, "transcripts", Seq(
      ("v1", "[00:01] hello world")).toDF("video_id", "transcript"))

    val api = new HttpApi(spark, store, port = 0)
    val port = api.start()
    try {
      // /api/playlists: one object per playlist with the stats view
      val (c1, playlists) = get(port, "/api/playlists")
      assert(c1 == 200, playlists)
      assert(playlists.startsWith("[") && playlists.contains("\"PL1\"")
        && playlists.contains("\"PL2\""), playlists)
      assert(playlists.contains("\"video_count\":2"), playlists)
      // /api/playlists/<id>/videos: position order, both rows
      val (c2, vids) = get(port, "/api/playlists/PL1/videos")
      assert(c2 == 200, vids)
      assert(vids.indexOf("\"v2\"") < vids.indexOf("\"v1\""),
        s"position order lost: $vids") // v2 at position 1
      assert(vids.contains("\"has_transcript\":1"), vids)
      // /api/videos/<id>: one object, transcript joined in
      val (c3, vid) = get(port, "/api/videos/v1")
      assert(c3 == 200, vid)
      assert(vid.startsWith("{") && vid.contains("\"title\":\"First\"")
        && vid.contains("hello world"), vid)
      // the reference's 404 contract (web_app.py:70)
      val (c4, missing) = get(port, "/api/videos/nope")
      assert(c4 == 404 && missing.contains("Video not found"), missing)
      val (c5, _) = get(port, "/api/bogus")
      assert(c5 == 404)
      // store observability routes: per-table dashboard, group
      // vectors, per-consumer retention debt with group attribution
      store.registerCursor("videos", "reader", 0L)
      store.withCommitRetries()(store.commitGroup(
        Map("videos" -> store.currentVersion("videos").get),
        store.groupPin("vg")))
      val (c6, stats) = get(port, "/api/store/stats")
      assert(c6 == 200 && stats.contains("\"table\":\"videos\"") &&
        stats.contains("\"head_version\":0") &&
        stats.contains("\"files\":"), stats)
      val (c7, groups) = get(port, "/api/store/groups")
      assert(c7 == 200 && groups.contains("\"group\":\"vg\"") &&
        groups.contains("\"pinned_version\":0"), groups)
      val (c8, lag) = get(port, "/api/store/lag/videos")
      assert(c8 == 200 && lag.contains("\"consumer\":\"reader\"") &&
        lag.contains("\"consumer\":\"_group-vg\"") &&
        lag.contains("\"group\":\"vg\""), lag)
      val (c9, nolag) = get(port, "/api/store/lag/nope")
      assert(c9 == 404 && nolag.contains("Table not found"), nolag)
    } finally api.stop()
    // stopped: the port no longer answers
    intercept[java.io.IOException] { get(port, "/api/playlists") }
  }
}
