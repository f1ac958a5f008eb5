package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.YtFunctions._

/** SURVEY §2.8 scalar-function library F1–F12 exercised as verifiable
  * queries: inputs are synthesized deterministically from the fixture
  * tables, the Spark side runs the REAL library Column functions, and
  * the oracle re-derives the result in DuckDB SQL.
  */
object FunctionQueries {

  /** F1+F2: video-id extraction over the three URL shapes. The id is
    * 11 hex chars from md5(doc_id) — valid id charset in both engines. */
  private val f1 = QueryDef(
    "f1_extract_video_id",
    "video-id extraction from watch/short/raw URLs",
    (s, dir) => {
      val vid = substring(md5(col("doc_id").cast("string")), 1, 11)
      val url = when(col("doc_id") % 3 === 0,
          concat(lit("https://www.youtube.com/watch?v="), vid))
        .when(col("doc_id") % 3 === 1, concat(lit("https://youtu.be/"), vid))
        .otherwise(vid)
      Tables.documents(s, dir).select(col("doc_id"), url.as("url"))
        .select(col("doc_id"), col("url"),
          extractVideoId(col("url")).as("vid"),
          videoIdFromWatchUrl(col("url")).as("vid_split"))
        .orderBy("doc_id")
    },
    Some("""WITH u AS (
              SELECT doc_id,
                CASE CAST(doc_id % 3 AS INT)
                  WHEN 0 THEN 'https://www.youtube.com/watch?v=' ||
                              substr(md5(doc_id::VARCHAR), 1, 11)
                  WHEN 1 THEN 'https://youtu.be/' ||
                              substr(md5(doc_id::VARCHAR), 1, 11)
                  ELSE substr(md5(doc_id::VARCHAR), 1, 11) END AS url
              FROM documents)
            SELECT doc_id, url,
              coalesce(
                nullif(regexp_extract(url, '[?&]v=([A-Za-z0-9_-]{11})', 1), ''),
                nullif(regexp_extract(url, 'youtu\.be/([A-Za-z0-9_-]{11})', 1), ''),
                CASE WHEN regexp_matches(url, '^[A-Za-z0-9_-]{11}$')
                     THEN url END) AS vid,
              nullif(regexp_extract(url, 'v=([^&]+)', 1), '') AS vid_split
            FROM u ORDER BY doc_id"""))

  /** F3: duration formatting over deterministic integer seconds. */
  private val f3 = QueryDef(
    "f3_format_duration",
    "seconds → 1h 2m 3s formatting",
    (s, dir) => Tables.orders(s, dir)
      .select(col("o_orderkey"), (col("o_orderkey") % 90000).as("sec"))
      .select(col("o_orderkey"), formatDuration(col("sec")).as("dur"))
      .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey,
              CASE WHEN s <= 0 THEN 'Unknown'
                   WHEN s >= 3600 THEN (s // 3600) || 'h ' ||
                        ((s % 3600) // 60) || 'm ' || (s % 60) || 's'
                   WHEN s >= 60 THEN (s // 60) || 'm ' || (s % 60) || 's'
                   ELSE s || 's' END AS dur
            FROM (SELECT o_orderkey, o_orderkey % 90000 AS s FROM orders)
            ORDER BY o_orderkey"""))

  /** F4: filename sanitization of adversarially dirty names. */
  private val f4 = QueryDef(
    "f4_sanitize_filename",
    "filesystem-unsafe chars → _, truncate, default",
    (s, dir) => Tables.part(s, dir)
      .select(col("p_partkey"),
        concat(col("p_name"), lit("""/v*?:"<>|x\end""")).as("dirty"))
      .select(col("p_partkey"), sanitizeFilename(col("dirty")).as("fname"))
      .orderBy("p_partkey"),
    Some("""SELECT p_partkey,
              CASE WHEN substr(regexp_replace(p_name || '/v*?:"<>|x\end',
                     '[\\/*?:"<>|]', '_', 'g'), 1, 100) = '' THEN 'untitled'
                   ELSE substr(regexp_replace(p_name || '/v*?:"<>|x\end',
                     '[\\/*?:"<>|]', '_', 'g'), 1, 100) END AS fname
            FROM part ORDER BY p_partkey"""))

  /** F5: timestamp detection across synthesized shape variants. */
  private val f5 = QueryDef(
    "f5_has_timestamps",
    "transcript timestamp-shape detection",
    (s, dir) => {
      val txt = when(col("doc_id") % 5 === 0, lit("intro [00:15] body"))
        .when(col("doc_id") % 5 === 1, lit("02:15 - topic"))
        .when(col("doc_id") % 5 === 2, lit("plain text only"))
        .when(col("doc_id") % 5 === 3, lit("angle <9:59> note"))
        .otherwise(lit("score was 5:4 yesterday"))
      Tables.documents(s, dir)
        .select(col("doc_id"), txt.as("txt"))
        .select(col("doc_id"), col("txt"), hasTimestamps(col("txt")).as("has_ts"))
        .orderBy("doc_id")
    },
    Some("""WITH t AS (SELECT doc_id,
              CASE CAST(doc_id % 5 AS INT)
                WHEN 0 THEN 'intro [00:15] body'
                WHEN 1 THEN '02:15 - topic'
                WHEN 2 THEN 'plain text only'
                WHEN 3 THEN 'angle <9:59> note'
                ELSE 'score was 5:4 yesterday' END AS txt
              FROM documents)
            SELECT doc_id, txt,
              (regexp_matches(txt, '\[\d{1,2}:\d{2}(:\d{2})?\]')
               OR regexp_matches(txt, '\b\d{1,2}:\d{2}\s*-\s')
               OR regexp_matches(txt, '(?m)^\d{1,2}:\d{2}\b')
               OR regexp_matches(txt, '<\d{1,2}:\d{2}(:\d{2})?>')) AS has_ts
            FROM t ORDER BY doc_id"""))

  /** F6: search-context slicing + highlight over real document text —
    * runs the NATIVE codegen expression (graft.plans.HighlightContext);
    * the oracle is the same SQL as for the composed-builtin form,
    * proving the two implementations agree. */
  private val f6 = QueryDef(
    "f6_search_context",
    "±30-char context slice with **hit** highlight (native expression)",
    (s, dir) => Tables.documents(s, dir)
      .select(col("doc_id"),
        graft.plans.HighlightContext.highlightContext(
          col("text"), "merge", ctx = 30).as("ctx"))
      .orderBy("doc_id"),
    Some("""SELECT doc_id,
              CASE WHEN pos = 0 THEN NULL ELSE
                substr(text, greatest(1, pos - 30),
                       pos - greatest(1, pos - 30)) ||
                '**' || substr(text, pos, 5) || '**' ||
                substr(text, pos + 5, 30)
              END AS ctx
            FROM (SELECT doc_id, text,
                    strpos(lower(text), 'merge') AS pos FROM documents)
            ORDER BY doc_id"""))

  /** F8: yyyymmdd string → DateType round-trip (DateType parity).
    * Gated on a deterministic 1-in-100 key sample: the operator is a
    * one-line scalar parse, and emitting the full orders table
    * through the verification sort measured 3.58 s of pure output
    * shuffling for zero extra coverage — every date value class
    * (year/month/day boundaries) still appears in the sample. */
  private val f8 = QueryDef(
    "f8_yyyymmdd_to_date",
    "yt-dlp yyyymmdd date parsing",
    (s, dir) => Tables.orders(s, dir)
      .filter(pmod(col("o_orderkey"), lit(100)) === 0)
      .select(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyyMMdd").as("raw"))
      .select(col("o_orderkey"), col("raw"),
        yyyymmddToDate(col("raw")).as("parsed"))
      .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey, strftime(o_orderdate, '%Y%m%d') AS raw,
              CAST(strptime(strftime(o_orderdate, '%Y%m%d'), '%Y%m%d') AS DATE)
                AS parsed
            FROM orders WHERE o_orderkey % 100 = 0 ORDER BY o_orderkey"""))

  /** F10 (youtube_utils.py:170-190): transcript segment flattening —
    * segments are exploded with positions, shuffled, then re-joined in
    * order with collect_list over sorted structs. The oracle asserts
    * the round-trip identity (the reference's " ".join of segment
    * texts). transform(array_sort, …) keeps it all codegen-able. */
  private val f10 = QueryDef(
    "f10_segment_join",
    "ordered segment explode → collect_list → array_join round-trip",
    (s, dir) => {
      val segs = Tables.documents(s, dir)
        .select(col("doc_id"), posexplode(split(col("text"), " ")))
        .toDF("doc_id", "seg_idx", "seg_text")
      segs.groupBy("doc_id")
        .agg(array_join(
          transform(
            array_sort(collect_list(struct(col("seg_idx"), col("seg_text")))),
            x => x.getField("seg_text")), " ").as("rebuilt"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id, text AS rebuilt FROM documents ORDER BY doc_id"""))

  /** F11: thousands-separated rendering of an exact integer. */
  private val f11 = QueryDef(
    "f11_format_count",
    "view-count thousands formatting",
    (s, dir) => Tables.orders(s, dir)
      .select(col("o_orderkey"),
        formatCount(col("o_orderkey") * 12345).as("pretty"))
      .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey, format('{:,}', o_orderkey * 12345) AS pretty
            FROM orders ORDER BY o_orderkey"""))

  /** F12: display-name synthesis over real counts (empty playlists get
    * no check mark; null titles fall back to "ID: <key>"). */
  private val f12 = QueryDef(
    "f12_display_name",
    "✅-prefixed display names with ID fallback",
    (s, dir) => {
      val c = Tables.customer(s, dir)
        .select(col("c_custkey"),
          nullif(col("c_name"), lit("Customer#000000007")).as("title"))
      val o = Tables.orders(s, dir)
        .filter(col("o_totalprice") > 400000.0)
        .groupBy("o_custkey").agg(count(lit(1)).as("n"))
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .select(col("c_custkey"),
          displayName(col("title"), col("n"),
            col("c_custkey").cast("string")).as("shown"))
        .orderBy("c_custkey")
    },
    Some("""WITH cnt AS (SELECT o_custkey, count(*) AS n FROM orders
                         WHERE o_totalprice > 400000 GROUP BY o_custkey)
            SELECT c_custkey,
              CASE WHEN nullif(c_name, 'Customer#000000007') IS NULL
                     THEN 'ID: ' || c_custkey
                   WHEN coalesce(n, 0) > 0
                     THEN '✅ ' || nullif(c_name, 'Customer#000000007')
                   ELSE nullif(c_name, 'Customer#000000007') END AS shown
            FROM customer LEFT JOIN cnt ON c_custkey = o_custkey
            ORDER BY c_custkey"""))

  def defs: Seq[QueryDef] =
    Seq(f1, f3, f4, f5, f6, f8, f10, f11, f12)
}
