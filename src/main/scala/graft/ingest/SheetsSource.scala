package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S4 (generate_playlists.py:22-60): Google-Sheets-backed playlist
  * source. The sheet fetch is a driver-side connector (one worksheet
  * ≪ memory; the reference uses gspread) hidden behind a trait so the
  * engine stays hermetic — tests and offline runs inject rows.
  * Fetched rows flow through the same [[PlaylistJson.coalesceVariants]]
  * normalization as the JSON import (the reference tolerates
  * id/playlist_id/playlistId and title/name there too).
  */
trait SheetsSource {
  /** Raw worksheet rows as key→value maps (header-driven). */
  def fetchRows(): Seq[Map[String, String]]
}

object SheetsSource {

  /** Static rows — the test/offline implementation. A live gspread
    * implementation would subclass this boundary only. */
  final class Static(rows: Seq[Map[String, String]]) extends SheetsSource {
    override def fetchRows(): Seq[Map[String, String]] = rows
  }

  /** Normalize fetched rows into the playlists shape. */
  def toPlaylists(spark: SparkSession, source: SheetsSource): DataFrame = {
    import spark.implicits._
    val rows = source.fetchRows()
    val keys = Seq("playlist_id", "id", "playlistId", "title", "name", "url")
    val tuples = rows.map(r => (
      r.get("playlist_id").orNull, r.get("id").orNull,
      r.get("playlistId").orNull, r.get("title").orNull,
      r.get("name").orNull, r.get("url").orNull))
    PlaylistJson.coalesceVariants(
      tuples.toDF(keys: _*))
  }
}
