package graft.connectors

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.app.SyncPipeline
import graft.ops.ParquetTableStore

/** Static state the executor closures mutate — local-mode tests share
  * one JVM, so these observe executor-side behavior directly. */
object ConnectorRuntimeSpec {
  val sleptMs = new AtomicLong(0)
  val attemptsById = new ConcurrentHashMap[String, Integer]()
  def countingSleeper(ms: Long): Unit = sleptMs.addAndGet(ms)
  def reset(): Unit = { sleptMs.set(0); attemptsById.clear() }

  def flaky(failuresBeforeSuccess: Int)(id: String): String = {
    val n = attemptsById.merge(id, 1, (a, b) => a + b)
    if (n <= failuresBeforeSuccess) throw new RuntimeException(s"flake $n")
    s"payload-$id"
  }
  def alwaysFails(id: String): String =
    throw new IllegalStateException(s"dead $id")
}

class ConnectorRuntimeSpec extends SparkSpec {
  import ConnectorRuntimeSpec._
  import spark.implicits._

  test("rate limit: k+1 requests in one partition wait k intervals") {
    reset()
    val reqs = (1 to 6).map(i => s"id$i").toDF("id")
    val out = ConnectorRuntime.fetchWithPolicy(reqs, "id",
      id => s"ok-$id", ratePerSecPerPartition = 100.0,
      numPartitions = 1, sleeper = countingSleeper)
    assert(out.count() == 6)
    // 6 requests at 100/s in one partition → ≥ 5 × 10ms of throttling
    assert(sleptMs.get() >= 50, s"slept only ${sleptMs.get()}ms")
    assert(out.filter(col("error").isNotNull).count() == 0)
  }

  test("retries recover, attempts are counted, backoff is deterministic") {
    reset()
    val out = ConnectorRuntime.fetchWithPolicy(
      Seq("a", "b").toDF("id"), "id", flaky(2),
      ratePerSecPerPartition = 0, maxAttempts = 3, backoffMs = 8,
      numPartitions = 1, sleeper = countingSleeper)
      .collect().map(r => r.getString(0) ->
        (r.getString(1), r.getInt(2), r.getString(3))).toMap
    assert(out("a") == ("payload-a", 3, null))
    assert(out("b") == ("payload-b", 3, null))
    // two ids × (8 + jitter<4) + (16 + jitter<4) backoffs
    val slept = sleptMs.get()
    assert(slept >= 48 && slept < 64, s"backoff slept ${slept}ms")
  }

  test("terminal failures become rows, not stage aborts") {
    reset()
    val out = ConnectorRuntime.fetchWithPolicy(
      Seq("ok1", "dead", "ok2").toDF("id"), "id",
      id => if (id == "dead") alwaysFails(id) else s"p-$id",
      ratePerSecPerPartition = 0, maxAttempts = 2, backoffMs = 1,
      sleeper = countingSleeper)
    val rows = out.collect().map(r =>
      r.getString(0) -> (Option(r.getString(1)), r.getInt(2),
        Option(r.getString(3)))).toMap
    assert(rows("dead") == ((None, 2, Some("IllegalStateException: dead dead"))))
    assert(rows("ok1") == ((Some("p-ok1"), 1, None)))
    assert(rows.size == 3)
  }

  test("HttpJsonYouTubeConnector drives a full SyncPipeline, dead-letters the rest") {
    reset()
    def channelJson(ref: String): String =
      """[{"playlist_id":"PLa","title":"A","url":"https://u/PLa"},
         |{"playlist_id":"PLb","title":"B","url":"https://u/PLb"}]""".stripMargin
    def playlistJson(pid: String): String =
      s"""[{"video_id":"${pid}_v1","position":1},
          |{"video_id":"${pid}_v2","position":2}]""".stripMargin
    def videoJson(vid: String): String =
      if (vid == "PLb_v2") throw new RuntimeException("fetch 404")
      else s"""{"title":"T $vid","description":"D","channel":"c",
              |"publish_date":"2024-05-01","duration_seconds":60,
              |"view_count":1000,"author":"au","channel_id":"UC1",
              |"thumbnail_url":"th","video_url":"https://w/$vid",
              |"language":"en","transcript":"[00:01] hi $vid"}""".stripMargin
    val conn = new HttpJsonYouTubeConnector(channelJson, playlistJson, videoJson,
      ratePerSecPerPartition = 0, maxAttempts = 2, backoffMs = 1,
      sleeper = countingSleeper)
    val store = new ParquetTableStore(tmpDir("httpstore"))
    val report = new SyncPipeline(store, conn)
      .syncChannel(spark, "chan", to_timestamp(lit("2026-02-01 00:00:00")))
    assert(report.playlists == 2 && report.added == 4)
    assert(report.scraped == 3) // PLb_v2 dead-lettered, not aborted
    val videos = store.read(spark, "videos").collect()
    assert(videos.map(_.getString(0)).toSet ==
      Set("PLa_v1", "PLa_v2", "PLb_v1"))
    val failed = conn.lastFailures.get.collect()
    assert(failed.length == 1 && failed(0).getString(0) == "PLb_v2"
      && failed(0).getInt(1) == 2)
    conn.releaseCache()
  }

  test("cassette replay: recorded responses drive the live connector; a tape miss dead-letters") {
    reset()
    // The VCR pattern at the connector's fetcher seam: a recorded
    // session is one response file per (endpoint, request id); replay
    // reads the tape instead of the network, and a request with no
    // recorded response fails EXACTLY like a network error (retries,
    // then dead-letter) — so the replay test exercises the same
    // policy machinery a live run does, hermetically. The replay
    // closure captures only the tape dir string (executor-safe).
    val tape = tmpDir("cassette")
    def record(key: String, body: String): Unit =
      java.nio.file.Files.write(
        java.nio.file.Paths.get(tape, key + ".json"), body.getBytes("UTF-8"))
    record("channel-chan",
      """[{"playlist_id":"PLa","title":"A","url":"https://u/PLa"}]""")
    record("playlist-PLa",
      """[{"video_id":"v1","position":1},{"video_id":"v2","position":2}]""")
    record("video-v1",
      """{"title":"T v1","description":"D","channel":"c",
        |"publish_date":"2024-05-01","duration_seconds":60,
        |"view_count":1000,"author":"au","channel_id":"UC1",
        |"thumbnail_url":"th","video_url":"https://w/v1",
        |"language":"en","transcript":"[00:01] hi v1"}""".stripMargin)
    // video-v2 deliberately unrecorded: the tape miss must surface
    // as a dead-letter row, never a stage abort
    def replay(endpoint: String)(id: String): String = {
      val p = java.nio.file.Paths.get(tape, s"$endpoint-$id.json")
      if (!java.nio.file.Files.exists(p))
        throw new IllegalStateException(s"cassette miss: $endpoint-$id")
      new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
    }
    val conn = new HttpJsonYouTubeConnector(replay("channel"),
      replay("playlist"), replay("video"),
      ratePerSecPerPartition = 0, maxAttempts = 2, backoffMs = 1,
      sleeper = countingSleeper)
    val store = new ParquetTableStore(tmpDir("cassette-store"))
    val report = new SyncPipeline(store, conn)
      .syncChannel(spark, "chan", to_timestamp(lit("2026-02-01 00:00:00")))
    assert(report.playlists == 1 && report.added == 2 && report.scraped == 1)
    val videos = store.read(spark, "videos").collect()
    assert(videos.map(_.getString(0)).toSet == Set("v1"))
    assert(videos.head.getAs[String]("title") == "T v1")
    val failed = conn.lastFailures.get.collect()
    assert(failed.length == 1 && failed(0).getString(0) == "v2"
      && failed(0).getString(2).contains("cassette miss: video-v2"),
      failed.mkString(","))
    conn.releaseCache()
  }
}
