package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.ingest.{PlaylistJson, TranscriptFiles}

/** SURVEY §2.1 source/sink operators (S2/S3/S5/S6/S11) as verifiable
  * queries. File-system round-trips live in the specs; here each
  * operator's TRANSFORMATION runs on synthesized in-engine data so
  * the DuckDB oracle can re-derive it: the Spark side genuinely
  * serializes to JSON text / transcript-file text and parses it back
  * with the real ingest code paths.
  */
object SourceQueries {

  /** S2: JSON import with variant keys — rows are serialized to JSON
    * text with rotating key variants (playlist_id/id/playlistId,
    * title/name, sometimes no url), parsed back with from_json, and
    * normalized by the real coalesceVariants. */
  private val s2 = QueryDef(
    "s2_json_import_variants",
    "variant-key playlist JSON import normalization",
    (s, dir) => {
      val c = Tables.customer(s, dir).limit(0) // (schema anchor, unused)
      val base = Tables.customer(s, dir)
        .select(col("c_custkey"), concat(lit("PL"), col("c_custkey")).as("pid"),
          col("c_name").as("t"))
      val json = base.select(col("c_custkey"),
        when(col("c_custkey") % 3 === 0,
          to_json(struct(col("pid").as("playlist_id"), col("t").as("title"),
            concat(lit("https://u/"), col("pid")).as("url"))))
          .when(col("c_custkey") % 3 === 1,
            to_json(struct(col("pid").as("id"), col("t").as("title"))))
          .otherwise(
            to_json(struct(col("pid").as("playlistId"), col("t").as("name"))))
          .as("j"))
      val schema = StructType(Seq("playlist_id", "id", "playlistId", "title",
        "name", "url").map(StructField(_, StringType)))
      val parsed = json.select(col("c_custkey"),
        from_json(col("j"), schema).as("p")).select("c_custkey", "p.*")
      PlaylistJson.coalesceVariants(parsed)
        .orderBy("playlist_id")
    },
    Some("""SELECT 'PL' || c_custkey AS playlist_id, c_name AS title,
              CASE WHEN c_custkey % 3 = 0 THEN 'https://u/PL' || c_custkey
                   ELSE 'https://www.youtube.com/playlist?list=PL' || c_custkey
              END AS url
            FROM customer ORDER BY playlist_id"""))

  /** S3: nested ordered export shape — one row per parent with the
    * ordered child-id array (collect_list has no order guarantee, so
    * the order comes from sort_array over (position, id) structs). */
  private val s3 = QueryDef(
    "s3_nested_export",
    "playlist export with ordered video_ids array",
    (s, dir) => {
      val pv = Tables.lineitem(s, dir)
        .filter(col("l_orderkey") < 300)
        .select(col("l_orderkey").as("playlist_id"),
          col("l_partkey").cast("string").as("video_id"),
          col("l_linenumber").as("position"))
      val p = Tables.orders(s, dir)
        .filter(col("o_orderkey") < 300)
        .select(col("o_orderkey").as("playlist_id"),
          concat(lit("Order "), col("o_orderkey")).as("title"),
          concat(lit("https://o/"), col("o_orderkey")).as("url"))
      // Gate shape: join the ordered array to a string — the driver's
      // pandas harness can't hash array cells (round-1 red row). The
      // library (exportShape) keeps the real nested array.
      PlaylistJson.exportShape(p, pv)
        .withColumn("video_ids", array_join(col("video_ids"), ","))
        .orderBy("playlist_id")
    },
    Some("""WITH pv AS (SELECT l_orderkey AS playlist_id,
                          l_partkey::VARCHAR AS video_id,
                          l_linenumber AS position
                        FROM lineitem WHERE l_orderkey < 300),
                 vids AS (SELECT playlist_id,
                            list(video_id ORDER BY position, video_id) AS video_ids
                          FROM pv GROUP BY playlist_id)
            SELECT o_orderkey AS playlist_id, 'Order ' || o_orderkey AS title,
                   'https://o/' || o_orderkey AS url,
                   coalesce(array_to_string(vids.video_ids, ','), '') AS video_ids
            FROM orders LEFT JOIN vids ON o_orderkey = vids.playlist_id
            WHERE o_orderkey < 300
            ORDER BY playlist_id"""))

  /** S6: golden transcript-export content — the exact header layout of
    * export_transcript.py:65-79 with an injected EXPORTED stamp. */
  private val s6 = QueryDef(
    "s6_transcript_export_format",
    "golden transcript export file content",
    (s, dir) => {
      val d = Tables.documents(s, dir)
      d.select(col("doc_id"),
        TranscriptFiles.exportContent(
          title = concat(lit("Doc "), col("doc_id")),
          videoUrl = concat(lit("https://www.youtube.com/watch?v=d"), col("doc_id")),
          author = when(col("doc_id") % 3 === 0, lit(null).cast("string"))
            .otherwise(col("source")),
          language = col("lang"),
          publishDate = when(col("doc_id") % 2 === 0, lit("2024-06-01"))
            .otherwise(lit(null).cast("string")),
          transcript = col("text"),
          exportedAt = lit("2026-01-01 00:00:00")).as("content"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
              'TITLE: Doc ' || doc_id || chr(10) ||
              'URL: https://www.youtube.com/watch?v=d' || doc_id || chr(10) ||
              '# AUTHOR: ' || (CASE WHEN doc_id % 3 = 0 THEN 'Unknown'
                                    ELSE source END) || chr(10) ||
              '# LANGUAGE: ' || lang || chr(10) ||
              '# EXPORTED: 2026-01-01 00:00:00' || chr(10) ||
              (CASE WHEN doc_id % 2 = 0
                    THEN '# PUBLISHED: 2024-06-01' || chr(10) ELSE '' END) ||
              chr(10) || text AS content
            FROM documents ORDER BY doc_id"""))

  /** S11: JSONL run-log sink shape — status records rendered to JSON
    * lines (field order fixed by the struct). */
  private val s11 = QueryDef(
    "s11_jsonl_run_log",
    "JSONL run-log records",
    (s, dir) => Tables.events(s, dir)
      .filter(col("event_id") < 500)
      .select(col("event_id"),
        to_json(struct(
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("timestamp"),
          col("event_type").as("status"),
          concat(lit("user "), col("user_id")).as("message"))).as("line"))
      .orderBy("event_id"),
    Some("""SELECT event_id,
              '{"timestamp":"' || strftime(ts, '%Y-%m-%d %H:%M:%S') ||
              '","status":"' || event_type ||
              '","message":"user ' || user_id || '"}' AS line
            FROM events WHERE event_id < 500 ORDER BY event_id"""))

  def defs: Seq[QueryDef] = Seq(s2, s3, s6, s11)
}
