package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar function library F1–F13 (SURVEY §2.8), each a pure
  * Column → Column built from `org.apache.spark.sql.functions` only —
  * no UDFs, so everything stays inside whole-stage codegen. That is
  * the 100 TB property: these run per-row inside the generated loop
  * with zero serialization, unlike a Scala closure UDF.
  */
object YtFunctions {

  /** 11-char YouTube video id charset, reference display.py:226. */
  val VideoIdRe = "[A-Za-z0-9_-]{11}"

  /** F1 (display.py:209-228, add_transcripts.py:28-47): extract a
    * video id from a watch?v= URL, a youtu.be short URL, or a raw
    * 11-char id. Null when nothing matches (reference returns None).
    */
  def extractVideoId(url: Column): Column = {
    val fromQuery = nullifEmpty(regexp_extract(url, s"[?&]v=($VideoIdRe)", 1))
    val fromShort = nullifEmpty(regexp_extract(url, s"youtu\\.be/($VideoIdRe)", 1))
    val raw = when(url.rlike(s"^$VideoIdRe$$"), url)
    coalesce(fromQuery, fromShort, raw)
  }

  /** F2 (main_scraper.py:196-198): `url.split("v=")[1].split("&")[0]`
    * — the cruder split-based form, kept as its own operator because
    * its failure mode differs from F1 (accepts any length). */
  def videoIdFromWatchUrl(url: Column): Column =
    nullifEmpty(regexp_extract(url, "v=([^&]+)", 1))

  /** F3 (display.py:195-207): seconds → "1h 2m 3s" / "2m 3s" / "3s",
    * "Unknown" for null or <= 0. Integer div/mod only. */
  def formatDuration(seconds: Column): Column = {
    val s = seconds.cast("long")
    val h = (s / 3600).cast("long")
    val m = ((s % 3600) / 60).cast("long")
    val r = (s % 60).cast("long")
    when(seconds.isNull || s <= 0, lit("Unknown"))
      .when(h > 0, concat(h, lit("h "), m, lit("m "), r, lit("s")))
      .when(m > 0, concat(m, lit("m "), r, lit("s")))
      .otherwise(concat(r, lit("s")))
  }

  /** F4 (export_playlist_transcripts.py:57-64): replace filesystem-
    * unsafe chars (backslash, slash, star, question mark, colon,
    * quote, angle brackets, pipe) with _, truncate to 100 chars,
    * default "untitled". */
  def sanitizeFilename(title: Column): Column = {
    val cleaned = substring(
      regexp_replace(title, "[\\\\/*?:\"<>|]", "_"), 1, 100)
    when(title.isNull || cleaned === "", lit("untitled")).otherwise(cleaned)
  }

  /** F5 (add_transcripts.py:49-63): does the text contain any of the
    * four timestamp shapes — [MM:SS]/[H:MM:SS], "MM:SS -", a
    * line-initial MM:SS, or <MM:SS>. One alternation, one regex pass. */
  val TimestampAnyRe: String =
    "\\[\\d{1,2}:\\d{2}(:\\d{2})?\\]" +
      "|\\b\\d{1,2}:\\d{2}\\s*-\\s" +
      "|(?m)^\\d{1,2}:\\d{2}\\b" +
      "|<\\d{1,2}:\\d{2}(:\\d{2})?>"

  def hasTimestamps(text: Column): Column =
    coalesce(text.rlike(TimestampAnyRe), lit(false))

  /** F6 (display.py:604-620): case-insensitive find of `query`, slice
    * ±ctx chars around the first hit, wrap the hit in ** **. Null when
    * absent. Pure substring arithmetic — no regex on the hot path. */
  def searchContext(text: Column, query: String, ctx: Int = 100): Column = {
    val q = query.toLowerCase
    val pos = locate(q, lower(text)) // 1-based, 0 = miss
    val start = greatest(lit(1), pos - ctx)
    val before = substring(text, start.cast("int"), (pos - start).cast("int"))
    val hit = text.substr(pos, lit(q.length))
    val after = text.substr(pos + q.length, lit(ctx))
    when(pos === 0, lit(null).cast("string"))
      .otherwise(concat(before, lit("**"), hit, lit("**"), after))
  }

  /** F7 (youtube_utils.py:92): ISO-8601 UTC "now" string. The engine
    * stores TimestampType and renders at the edge. */
  def nowIso(): Column =
    date_format(current_timestamp(), "yyyy-MM-dd'T'HH:mm:ssXXX")

  /** F8 (youtube_utils.py:76-81): yt-dlp 'yyyyMMdd' upload date →
    * DateType. Unparseable input → null (reference returns None). */
  def yyyymmddToDate(s: Column): Column = try_to_date(s, "yyyyMMdd")

  /** F9 (main_scraper.py:343-352): freshness predicate — true when ts
    * is newer than `days` before `now`. `now` is injected so batch
    * runs are reproducible (the reference calls datetime.now inline).
    */
  def isFresh(ts: Column, now: Column, days: Int): Column =
    ts.isNotNull && ts > now - expr(s"INTERVAL $days DAYS")

  /** F11 (display.py:505): thousands-separated count rendering. */
  def formatCount(n: Column): Column = format_number(n, 0)

  /** F12 (gui_app.py:43-46): display-name synthesis — check-marked
    * title when the playlist has videos, "ID: <id>" when untitled. */
  def displayName(title: Column, videoCount: Column, id: Column): Column =
    when(title.isNull, concat(lit("ID: "), id))
      .when(coalesce(videoCount, lit(0)) > 0, concat(lit("✅ "), title))
      .otherwise(title)

  /** F13 (scrape_my_channel.py:270-283): channel-id resolution — the
    * reference probes fetched HTML with 4 regexes in order. Modeled as
    * data: first match wins. */
  def resolveChannelId(html: Column): Column = coalesce(
    nullifEmpty(regexp_extract(html, "\"externalId\":\"(UC[A-Za-z0-9_-]{22})\"", 1)),
    nullifEmpty(regexp_extract(html, "\"channelId\":\"(UC[A-Za-z0-9_-]{22})\"", 1)),
    nullifEmpty(regexp_extract(html, "channel/(UC[A-Za-z0-9_-]{22})", 1)),
    nullifEmpty(regexp_extract(html, "\"browseId\":\"(UC[A-Za-z0-9_-]{22})\"", 1)))

  /** Empty-string → null, the glue the reference's "or None" idiom
    * needs on top of regexp_extract's empty-string misses. */
  def nullifEmpty(c: Column): Column = nullif(c, lit(""))
}
