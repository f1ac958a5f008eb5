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

  /** The credential-free live implementation: a Google Sheet with
    * link-sharing exposes a CSV export endpoint
    * (docs.google.com/spreadsheets/d/<id>/export?format=csv&gid=<gid>)
    * — public API surface, no gspread/service-account needed (the
    * reference's auth ceremony, generate_playlists.py:22-40, exists
    * only because it reads a PRIVATE sheet). Accepts any URL
    * java.net can open, including file: URLs for offline fixtures.
    *
    * Mirrors gspread get_all_records semantics the reference relies
    * on: header row drives keys; EMPTY cells are treated as missing
    * (get_all_records returns '' and the reference's `or` chains
    * treat that as absent), so they're dropped from the row map. */
  final class CsvExport(url: String) extends SheetsSource {
    override def fetchRows(): Seq[Map[String, String]] = {
      val in = new java.net.URI(url).toURL.openStream()
      val text =
        try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
        finally in.close()
      parseCsv(text) match {
        case header +: data =>
          data.map(row => header.zipAll(row, "", "")
            .filter { case (k, v) => k.nonEmpty && v.nonEmpty }
            .toMap)
        case _ => Seq.empty
      }
    }
  }

  /** The public CSV export URL for a sheet id + worksheet gid. */
  def csvExportUrl(sheetId: String, gid: Long = 0L): String =
    s"https://docs.google.com/spreadsheets/d/$sheetId/export?format=csv&gid=$gid"

  /** Minimal RFC-4180 CSV: quoted fields may hold commas, newlines,
    * and doubled quotes; rows split on LF or CRLF; trailing empty
    * line ignored. Driver-side by design — one worksheet ≪ memory
    * (for big files use spark.read.csv; this is the connector
    * boundary, not a data path). */
  private[ingest] def parseCsv(text: String): Seq[Seq[String]] = {
    val rows = Seq.newBuilder[Seq[String]]
    val row = Seq.newBuilder[String]
    val cell = new StringBuilder
    var inQuotes = false
    var fields = 0
    var i = 0
    def endCell(): Unit = { row += cell.toString; cell.clear(); fields += 1 }
    def endRow(): Unit = { endCell(); rows += row.result(); row.clear(); fields = 0 }
    while (i < text.length) {
      val c = text.charAt(i)
      if (inQuotes) {
        if (c == '"' && i + 1 < text.length && text.charAt(i + 1) == '"') {
          cell.append('"'); i += 1
        } else if (c == '"') inQuotes = false
        else cell.append(c)
      } else c match {
        case '"' => inQuotes = true
        case ',' => endCell()
        case '\r' if i + 1 < text.length && text.charAt(i + 1) == '\n' =>
          endRow(); i += 1
        case '\n' => endRow()
        case other => cell.append(other)
      }
      i += 1
    }
    if (cell.nonEmpty || fields > 0) endRow()
    rows.result()
  }

  /** S4's WRITE side (generate_playlists.py:41-62): normalized sheet
    * rows → the playlists.json file the S2 import reads back — the
    * Sheets round trip the reference's tooling runs. Output objects
    * carry the reference's exact keys ("id", "title", "url" — "id",
    * not "playlist_id"; the variant coalescing and the url default
    * happen in [[toPlaylists]]), in SHEET ROW ORDER, pretty-printed
    * as one array file ([[PlaylistJson.writeJsonArrayFile]]). An
    * empty result is an error in the reference (exit 1) and throws
    * here; returns the entry count otherwise. */
  def generatePlaylists(spark: SparkSession, source: SheetsSource,
      path: String): Long = {
    import org.apache.spark.sql.functions.col
    val entries = toPlaylists(spark, source)
      .select(col("playlist_id").as("id"), col("title"), col("url"))
    val n = entries.count()
    require(n > 0,
      "No valid playlist entries found") // generate_playlists.py:54-56
    PlaylistJson.writeJsonArrayFile(entries, path)
    n
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
