package graft.ingest

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S2/S3 (import_playlists.py:24-53, export_playlists.py:35-63):
  * playlist JSON import with variant-key tolerance, and the nested
  * ordered export.
  */
object PlaylistJson {

  /** S2 key-variant coalescing (import_playlists.py:33-36,
    * generate_playlists.py:43-44): id from playlist_id|id|playlistId,
    * title from title|name, url synthesized from the id when absent.
    * Rows missing id or title are dropped (reference logs and skips).
    * Input may omit any variant column entirely — missing columns are
    * treated as null. */
  def coalesceVariants(raw: DataFrame): DataFrame = {
    def colOr(name: String): Column =
      if (raw.columns.contains(name)) col(name) else lit(null).cast("string")
    raw.select(
      coalesce(colOr("playlist_id"), colOr("id"), colOr("playlistId"))
        .as("playlist_id"),
      coalesce(colOr("title"), colOr("name")).as("title"),
      colOr("url").as("url"))
      .withColumn("url", coalesce(col("url"),
        concat(lit("https://www.youtube.com/playlist?list="), col("playlist_id"))))
      .filter(col("playlist_id").isNotNull && col("title").isNotNull)
  }

  /** Read a playlists.json array file (multiLine — the reference file
    * is one pretty-printed array) and normalize. */
  def importPlaylists(spark: SparkSession, path: String): DataFrame =
    coalesceVariants(spark.read.option("multiLine", true).json(path))

  /** S3 nested export shape: one row per playlist with its ordered
    * video_ids array (export_playlists.py:43-53), playlists ordered
    * NOCASE by title. Ordering inside collect_list comes from
    * sort_array over (position, video_id) structs — collect_list alone
    * has no order guarantee post-shuffle. */
  def exportShape(playlists: DataFrame, playlistVideos: DataFrame): DataFrame = {
    val vids = playlistVideos
      .groupBy("playlist_id")
      .agg(transform(
        array_sort(collect_list(struct(col("position"), col("video_id")))),
        x => x.getField("video_id")).as("video_ids"))
    playlists.select("playlist_id", "title", "url")
      .join(vids, Seq("playlist_id"), "left")
      .withColumn("video_ids",
        coalesce(col("video_ids"), array().cast("array<string>")))
      .orderBy(lower(col("title")), col("title"), col("playlist_id"))
  }

  /** Write the export as ONE pretty-printed JSON array file, matching
    * export_playlists.py:58-60. The collect is inherent to the
    * "single file" contract (the reference writes one file); the
    * distributed alternative for big exports is
    * `exportShape(...).write.json(dir)` (JSON-lines parts). */
  def writeJsonArrayFile(export: DataFrame, path: String,
      maxRows: Int = 1000000): Unit = {
    // size guard: the single-file contract bounds this to dimension
    // scale (playlists); refuse a corpus-sized frame instead of
    // silently OOMing the driver
    val rows = export.limit(maxRows + 1).toJSON.collect()
    require(rows.length <= maxRows,
      s"writeJsonArrayFile is a single-file dimension export (> $maxRows " +
        "rows collected); use exportShape(...).write.json(dir) for large exports")
    val pretty = rows.map { line =>
      // re-indent each object two spaces to mirror json.dumps(indent=2)
      "  " + line
    }.mkString("[\n", ",\n", "\n]")
    Files.write(Paths.get(path), pretty.getBytes(StandardCharsets.UTF_8))
  }
}
