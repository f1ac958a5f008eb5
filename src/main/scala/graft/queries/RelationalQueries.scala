package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** SURVEY §2.2–§2.7 relational operator inventory (P/J/A/W/O rows),
  * re-expressed over the driver's synthetic tables by role analogy:
  * customer↔playlists (parent with possibly-empty membership),
  * orders↔playlist membership rows, lineitem↔playlist_videos,
  * part↔videos, documents↔transcripts.
  *
  * All plans are declarative DataFrame API — Catalyst owns pushdown,
  * pruning, join selection; no RDDs, no collects, no UDFs.
  */
object RelationalQueries {

  /** J1 (display.py:74-83): parent ⟕ membership + grouped COUNT(col)
    * keeping empty parents; COUNT(o_orderkey) skips nulls exactly like
    * SQLite's COUNT(pv.video_id). Scale: shuffle on c_custkey only;
    * count is partially aggregated map-side before the shuffle.
    */
  private val j1 = QueryDef(
    "j1_parent_child_counts",
    "LEFT JOIN + grouped count keeping empty parents (playlist summary)",
    (s, dir) => {
      val c = Tables.customer(s, dir).select("c_custkey")
      // Child side is filtered so some parents keep zero matches —
      // COUNT(col) must skip the nulls the LEFT JOIN produces, exactly
      // like COUNT(pv.video_id) in the reference. The filter is pushed
      // into the parquet scan (PushedFilters in .explain).
      val o = Tables.orders(s, dir)
        .filter(col("o_totalprice") > 400000.0)
        .select("o_custkey", "o_orderkey")
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy(c("c_custkey"))
        .agg(count(o("o_orderkey")).as("order_count"))
        .orderBy(desc("order_count"), asc("c_custkey"))
    },
    Some("""SELECT c_custkey, count(o_orderkey) AS order_count
            FROM customer LEFT JOIN
              (SELECT * FROM orders WHERE o_totalprice > 400000) o
              ON o_custkey = c_custkey
            GROUP BY c_custkey
            ORDER BY order_count DESC, c_custkey"""))

  def defs: Seq[QueryDef] = Seq(j1)
}
