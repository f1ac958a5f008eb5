package graft.ingest

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** S5/S6/S7 (add_transcripts.py, export_transcript.py,
  * export_playlist_transcripts.py): line-oriented transcript file
  * ingest and export.
  */
object TranscriptFiles {

  /** Parsed inbox file (add_transcripts.py:65-132). `video_id == None`
    * → the file is rejected upstream. */
  final case class ParsedTranscript(
      path: String,
      video_id: Option[String],
      title: Option[String],
      url: Option[String],
      transcript: Option[String],
      valid: Boolean,
      reject_reason: Option[String])

  private val VideoIdRe = "[A-Za-z0-9_-]{11}".r
  private val WatchRe = ("[?&]v=(" + "[A-Za-z0-9_-]{11}" + ")").r.unanchored
  private val ShortRe = ("youtu\\.be/(" + "[A-Za-z0-9_-]{11}" + ")").r.unanchored

  private def idFromUrl(url: String): Option[String] = url match {
    case WatchRe(id) => Some(id)
    case ShortRe(id) => Some(id)
    case s if VideoIdRe.matches(s.trim) => Some(s.trim)
    case _ => None
  }

  /** Exact reference semantics (add_transcripts.py:70-116): scan
    * lines for TITLE:/URL:/ID: headers; the body starts after the
    * first blank line once any metadata was seen; missing title/url
    * are defaulted from the id; missing id or empty body rejects the
    * file. Runs per-file on executors — files are independent, so the
    * parse scales embarrassingly (the connector-boundary pattern). */
  def parseContent(path: String, content: String): ParsedTranscript = {
    val lines = content.split("\n", -1)
    var title: Option[String] = None
    var url: Option[String] = None
    var videoId: Option[String] = None
    var bodyStart = 0
    var i = 0
    var done = false
    while (i < lines.length && !done) {
      val line = lines(i)
      if (line.startsWith("TITLE:")) title = Some(line.drop(6).trim)
      else if (line.startsWith("URL:")) {
        url = Some(line.drop(4).trim)
        videoId = idFromUrl(line.drop(4).trim)
      } else if (line.startsWith("ID:")) {
        if (videoId.isEmpty) videoId = Some(line.drop(3).trim).filter(_.nonEmpty)
      }
      if ((title.isDefined || videoId.isDefined) && line.trim.isEmpty) {
        bodyStart = i + 1
        done = true
      }
      i += 1
    }
    val body = lines.drop(bodyStart).mkString("\n")
    if (videoId.isEmpty)
      ParsedTranscript(path, None, title, url, None, valid = false, Some("no video id"))
    else if (body.trim.isEmpty)
      ParsedTranscript(path, videoId, title, url, None, valid = false, Some("no transcript content"))
    else {
      val vid = videoId.get
      ParsedTranscript(path, videoId,
        Some(title.getOrElse(s"Video $vid")),
        Some(url.getOrElse(s"https://www.youtube.com/watch?v=$vid")),
        Some(body), valid = true, None)
    }
  }

  /** S5 inbox read: whole-file text rows (path, content) → parsed.
    * Globs *.txt,*.srt,*.vtt like add_transcripts.py:218. */
  def readInbox(spark: SparkSession, dir: String): Dataset[ParsedTranscript] = {
    import spark.implicits._
    spark.read.option("wholetext", "true")
      .option("pathGlobFilter", "*.{txt,srt,vtt}")
      .text(dir)
      .select(input_file_name().as("path"), col("value").as("content"))
      .as[(String, String)]
      .map { case (p, c) => parseContent(p, c) }
  }

  /** S6 golden export format (export_transcript.py:65-79). Pure
    * column expression; `exportedAt` injected (the reference stamps
    * datetime.now). publish_date absent → no PUBLISHED line. */
  def exportContent(title: Column, videoUrl: Column, author: Column,
      language: Column, publishDate: Column, transcript: Column,
      exportedAt: Column): Column =
    concat(
      lit("TITLE: "), title, lit("\n"),
      lit("URL: "), videoUrl, lit("\n"),
      lit("# AUTHOR: "), coalesce(author, lit("Unknown")), lit("\n"),
      lit("# LANGUAGE: "), language, lit("\n"),
      lit("# EXPORTED: "), exportedAt, lit("\n"),
      when(publishDate.isNotNull,
        concat(lit("# PUBLISHED: "), publishDate, lit("\n"))).otherwise(lit("")),
      lit("\n"),
      transcript)

  /** S7 batch filename: `{video_id}_{sanitized_title}.txt`
    * (export_playlist_transcripts.py:66-118). */
  def exportFilename(videoId: Column, title: Column): Column =
    concat(videoId, lit("_"),
      graft.functions.YtFunctions.sanitizeFilename(title), lit(".txt"))

  /** Distributed file sink: writes one file per row from the
    * executors (foreachPartition) — no driver collect, the S6/S7
    * writer shape at any scale. Expects columns (filename, content).
    */
  def writeTranscriptFiles(df: DataFrame, outDir: String): Unit = {
    Files.createDirectories(Paths.get(outDir))
    df.select("filename", "content").foreachPartition {
      (it: Iterator[org.apache.spark.sql.Row]) =>
        it.foreach { r =>
          Files.write(Paths.get(outDir, r.getString(0)),
            r.getString(1).getBytes(StandardCharsets.UTF_8))
        }
    }
  }
}
