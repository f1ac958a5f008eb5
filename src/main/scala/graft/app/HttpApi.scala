package graft.app

import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.ParquetTableStore

/** The reference's Flask JSON surface (web_app.py:24-75) as a thin
  * façade over the SAME query library the CLI uses — plain JDK
  * HttpServer, zero dependencies, one route per reference endpoint:
  *
  *   - GET /api/playlists                (web_app.py:24-43 — the
  *     per-playlist stats view, [[YtQueries.playlistsApi]])
  *   - GET /api/playlists/<id>/videos    (web_app.py:45-57 —
  *     position-ordered contents, [[YtQueries.playlistVideosByPosition]])
  *   - GET /api/videos/<id>              (web_app.py:59-75 — video +
  *     transcript detail, [[YtQueries.videoDetail]]; unknown id →
  *     404 {"error": "Video not found"}, the reference's exact shape)
  *
  * Responses are JSON arrays of row objects (the jsonify
  * list-of-dicts shape; /api/videos/<id> returns the single object).
  * Design stance: this is an INSPECTION surface over dimension-scale
  * tables — each request executes the query on the driver and
  * responses are capped at `maxRows` (a corpus-sized endpoint would
  * be a data-export job, not an HTTP response). The heavy analytics
  * stay in the library/CLI, per SURVEY §3.3; this façade exists so a
  * reference user's last visible surface has a drop-in analog. */
final class HttpApi(spark: SparkSession, store: ParquetTableStore,
    port: Int = 0, maxRows: Int = 10000) {

  private var server: Option[HttpServer] = None

  private def t(name: String): DataFrame = store.read(spark, name)

  /** DataFrame → the jsonify(list-of-dicts) payload. */
  private def toJsonArray(df: DataFrame): String =
    df.limit(maxRows).toJSON.collect().mkString("[", ",", "]")

  private def respond(x: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    x.getResponseHeaders.set("Content-Type", "application/json")
    x.sendResponseHeaders(code, bytes.length.toLong)
    val os = x.getResponseBody
    try os.write(bytes) finally os.close()
  }

  private def route(path: String): (Int, String) = {
    val parts = path.stripPrefix("/").split("/").toList
    parts match {
      case "api" :: "playlists" :: Nil =>
        (200, toJsonArray(YtQueries.playlistsApi(
          t("playlists"), t("playlist_videos"), t("videos"))))
      case "api" :: "playlists" :: pid :: "videos" :: Nil =>
        (200, toJsonArray(YtQueries.playlistVideosByPosition(
          t("playlist_videos"), t("videos"), t("transcripts"), pid)))
      case "api" :: "videos" :: vid :: Nil =>
        val rows = YtQueries.videoDetail(t("videos"), t("transcripts"), vid)
          .limit(2).toJSON.collect()
        if (rows.isEmpty) (404, """{"error":"Video not found"}""")
        else (200, rows.head)
      // store observability (the engine's own dashboard: the gated
      // tableStats/groupStats/cursorLag queries as JSON routes)
      case "api" :: "store" :: "stats" :: Nil =>
        (200, toJsonArray(store.tableStats(spark)
          .orderBy("table")))
      case "api" :: "store" :: "groups" :: Nil =>
        (200, toJsonArray(store.groupStats(spark)
          .orderBy("group", "table")))
      case "api" :: "store" :: "lag" :: tbl :: Nil =>
        if (!store.exists(tbl)) (404, """{"error":"Table not found"}""")
        else (200, toJsonArray(store.cursorLag(spark, tbl)
          .orderBy("consumer")))
      case _ => (404, """{"error":"Not found"}""")
    }
  }

  /** Start serving; returns the BOUND port (pass 0 to pick one). */
  def start(): Int = synchronized {
    require(server.isEmpty, "already started")
    val s = HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", port), 0)
    s.createContext("/", (x: HttpExchange) =>
      try {
        val (code, body) =
          try route(x.getRequestURI.getPath)
          catch { case scala.util.control.NonFatal(e) =>
            (500, s"""{"error":${jsonString(e.toString)}}""")
          }
        respond(x, code, body)
      } finally x.close())
    // a small pool: handlers run Spark driver actions, which are
    // thread-safe; the default (caller-thread) executor would
    // serialize every request behind the accept loop
    s.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))
    s.start()
    server = Some(s)
    s.getAddress.getPort
  }

  def stop(): Unit = synchronized {
    server.foreach(_.stop(0))
    server = None
  }

  private def jsonString(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
