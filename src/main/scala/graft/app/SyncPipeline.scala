package graft.app

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.connectors.YouTubeConnector
import graft.ops.{ParquetTableStore, Upserts}

/** The run_me/main_scraper end-to-end shapes (SURVEY §3.1/§3.2) as one
  * declarative pipeline over the versioned store:
  *
  *   playlists ─ U1 upsert ─┐
  *   remote contents (S8) ──┤─ U5 diff-sync per playlist ─ memberships
  *   stored video ids ──────┘
  *   work list = (new ids ∪ stale ids)  — U7 freshness gate
  *   scraped rows (S9) ─ U1 upsert → videos + U6-style transcripts
  *   ping log — append-only U9 events around every playlist sync
  *
  * Where the reference loops playlist-by-playlist and video-by-video
  * with per-row SQLite statements, every step here is one dataflow
  * over ALL playlists at once: the connector fan-out (the network
  * boundary) is the only per-row work, and it runs on executors.
  */
final class SyncPipeline(store: ParquetTableStore, connector: YouTubeConnector,
    refreshDays: Int = 7) {

  final case class SyncReport(
      playlists: Long, added: Long, removed: Long, scraped: Long)

  /** One full channel sync (run_me.py:225-257 equivalent). `now` is
    * injected for reproducibility (F9/U7). */
  def syncChannel(spark: SparkSession, channelRef: String, now: Column): SyncReport = {
    // Version hygiene: commit() returns the RE-READ frame (reading
    // the published version's files, not the input's lazy plan), so
    // it is safe to keep using downstream — even across the next
    // commit of the same table.
    // S10 + U1: refresh the playlists table
    val remotePl = connector.channelPlaylists(spark, channelRef)
      .withColumn("item_count", lit(null).cast("int"))
      .withColumn("last_updated", lit(null).cast("timestamp"))
    val playlists = store.commit(spark, "playlists",
      if (!store.exists("playlists")) remotePl
      else Upserts.upsertLastWriteWins(store.read(spark, "playlists"), remotePl,
        Seq("playlist_id")))
    val nPlaylists = playlists.count()
    ping(spark, playlists.select(col("playlist_id")), "started", now)

    // S8 + U5: reconcile memberships for every playlist in one pass
    val remote = connector.playlistContents(spark, playlists)
    val stored =
      if (store.exists("playlist_videos")) store.read(spark, "playlist_videos")
      else remote.limit(0)
    val sync = Upserts.diffSync(stored, remote, Seq("playlist_id", "video_id"))
    val nAdds = sync.adds.count()
    val nRemoves = sync.removes.count()
    val memberships = store.commit(spark, "playlist_videos", sync.synced)

    // U3-equivalent: refresh item_count/last_updated from the sync
    val counts = memberships.groupBy("playlist_id")
      .agg(count(lit(1)).cast("int").as("item_count"))
    val playlists2 = playlists.drop("item_count")
      .join(counts, Seq("playlist_id"), "left")
      .withColumn("item_count", coalesce(col("item_count"), lit(0)))
      .withColumn("last_updated", now)
      .select(playlists.columns.map(col).toIndexedSeq: _*)
    val playlists2Committed = store.commit(spark, "playlists", playlists2)

    // work list: member videos never scraped or stale (U7 + J9)
    val memberIds = memberships.select(col("video_id")).distinct()
    val videosStored =
      if (store.exists("videos")) store.read(spark, "videos") else null
    val workList =
      if (videosStored == null) memberIds
      else {
        val stale = Upserts.freshnessGate(videosStored
          .join(memberIds, Seq("video_id"), "left_semi"),
          "last_scraped_timestamp", now, refreshDays)
          .select(col("video_id"))
        val fresh = memberIds.join(videosStored, Seq("video_id"), "left_anti")
        fresh.unionByName(stale).distinct()
      }

    // S9 + U1: scrape and upsert videos + transcripts
    val scraped = connector.scrapeVideos(spark, workList)
      .withColumn("last_scraped_timestamp", now)
    val nScraped = scraped.count()
    val videoCols = Seq("video_id", "title", "description", "channel",
      "publish_date", "duration_seconds", "view_count", "author",
      "channel_id", "thumbnail_url", "video_url", "last_scraped_timestamp")
    val videosNew = scraped.select(videoCols.map(col): _*)
    store.commit(spark, "videos",
      if (videosStored == null) videosNew
      else Upserts.upsertLastWriteWins(videosStored, videosNew, Seq("video_id")))

    val transcriptsNew = scraped
      .select(col("video_id"), col("language"), col("transcript"),
        now.as("last_fetched_timestamp"))
      .filter(col("transcript").isNotNull)
    store.commit(spark, "transcripts",
      if (!store.exists("transcripts")) transcriptsNew
      else Upserts.upsertLastWriteWins(store.read(spark, "transcripts"),
        transcriptsNew, Seq("video_id")))

    ping(spark, playlists2Committed.select(col("playlist_id")),
      "completed", now)
    SyncReport(nPlaylists, nAdds, nRemoves, nScraped)
  }

  /** U9: append ping events (never UPDATE; latest-status is a view).
    * `phase` stands in for the reference's AUTOINCREMENT ping_id as
    * the within-timestamp tie-break: started=0 < terminal statuses. */
  private def ping(spark: SparkSession, playlistIds: DataFrame, status: String,
      now: Column): Unit = {
    val batch = playlistIds
      .withColumn("pinged_timestamp", now)
      .withColumn("status", lit(status))
      .withColumn("phase", lit(if (status == "started") 0 else 1))
    val log =
      if (!store.exists("playlist_pings")) batch
      else store.read(spark, "playlist_pings").unionByName(batch)
    store.commit(spark, "playlist_pings", log)
  }

  /** The latest-status view over the ping log (W3/U9). */
  def pingStatus(spark: SparkSession): DataFrame =
    Upserts.latestByKey(store.read(spark, "playlist_pings"),
      Seq("playlist_id"), Seq(col("pinged_timestamp"), col("phase")))
}
