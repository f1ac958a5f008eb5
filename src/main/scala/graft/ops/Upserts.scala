package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The upsert / merge / sync operator library — SURVEY §2.5 U1–U9.
  *
  * The reference implements these as row-at-a-time SQLite statements
  * (INSERT OR REPLACE / OR IGNORE / UPDATE / DELETE); here each is one
  * declarative dataflow over whole snapshots:
  *
  *  - every operator is a single equi-join or window on the key
  *    columns — exactly one shuffle at any scale, and Catalyst
  *    broadcasts the small side automatically (incoming batches are
  *    typically tiny vs the stored table);
  *  - anti-join forms are preferred over windows where both express
  *    the semantics (no sort, map-side combinable);
  *  - nothing collects to the driver.
  *
  * With a transactional table format these all become MERGE INTO
  * (U5 = WHEN NOT MATCHED BY SOURCE DELETE); the plain-parquet
  * persistence side lives in [[ParquetTableStore]].
  */
object Upserts {

  private def keyCols(df: DataFrame, keys: Seq[String]): Seq[Column] =
    keys.map(df(_))

  /** Collapse a batch to one row per key, keeping the row that sorts
    * LAST by `order` — the "last statement wins" semantics a
    * row-at-a-time INSERT OR REPLACE loop has implicitly. */
  def dedupKeepLast(batch: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keyCols(batch, keys): _*)
      .orderBy(order.map(_.desc): _*)
    batch.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** U1 (youtube_utils.py:237-258): last-write-wins full-row upsert —
    * INSERT OR REPLACE. Incoming replaces stored wholesale on key
    * match; stored rows without a match survive. Incoming must already
    * be key-unique (use [[dedupKeepLast]] for raw batches). */
  def upsertLastWriteWins(stored: DataFrame, incoming: DataFrame, keys: Seq[String]): DataFrame = {
    val survivors = stored.join(incoming, keys, "left_anti")
    survivors.unionByName(incoming.select(stored.columns.map(col): _*))
  }

  /** U2 (import_playlists.py:42-50): insert-if-absent — INSERT OR
    * IGNORE. Stored rows always win; only unmatched incoming keys are
    * appended (first occurrence per key). */
  def insertIfAbsent(stored: DataFrame, incoming: DataFrame, keys: Seq[String]): DataFrame = {
    val fresh = incoming
      .dropDuplicates(keys)
      .join(stored, keys, "left_anti")
    stored.unionByName(fresh.select(stored.columns.map(col): _*))
  }

  /** U3 (display.py:256-262, update_playlists_metadata.py:85-88):
    * field-subset UPDATE — matched rows take the update's values for
    * `updateCols` only (including explicit nulls — a presence marker,
    * not coalesce); all other columns and all unmatched rows are
    * preserved. Updates for absent keys are ignored, like SQL UPDATE.
    */
  def updateSubset(stored: DataFrame, updates: DataFrame, keys: Seq[String],
      updateCols: Seq[String]): DataFrame = {
    val marked = updates
      .dedupKeys(keys)
      .select((keys.map(col) ++ updateCols.map(c => col(c).as(s"__u_$c")) :+
        lit(true).as("__matched")): _*)
    val joined = stored.join(marked, keys, "left")
    val projected = stored.columns.map { c =>
      if (updateCols.contains(c))
        when(col("__matched"), col(s"__u_$c")).otherwise(col(c)).as(c)
      else col(c)
    }
    joined.select(projected.toIndexedSeq: _*)
  }

  private implicit class DedupOps(df: DataFrame) {
    def dedupKeys(keys: Seq[String]): DataFrame = df.dropDuplicates(keys)
  }

  /** U4 (main_scraper.py:167, display.py:696-699): keyed DELETE as an
    * anti-join rewrite of the stored table. */
  def deleteByKey(stored: DataFrame, removals: DataFrame, keys: Seq[String]): DataFrame =
    stored.join(removals.select(keys.map(col): _*).dropDuplicates(keys), keys, "left_anti")

  /** Result of a membership diff-sync: the delta sets plus the
    * reconciled table. */
  final case class DiffSync(adds: DataFrame, removes: DataFrame, synced: DataFrame)

  /** U5 (main_scraper.py:144-179, scrape_my_channel.py:176-226): diff
    * sync — reconcile stored membership against the remote snapshot:
    * adds = remote − stored (inserted with remote attributes),
    * removes = stored − remote (deleted), retained rows keep their
    * stored attributes (the reference leaves existing rows untouched).
    * Equivalent to MERGE ... WHEN NOT MATCHED BY SOURCE THEN DELETE.
    */
  def diffSync(stored: DataFrame, remote: DataFrame, keys: Seq[String]): DiffSync = {
    val adds = remote.join(stored, keys, "left_anti")
    val removes = stored.join(remote, keys, "left_anti")
    val retained = stored.join(remote.select(keys.map(col): _*), keys, "left_semi")
    DiffSync(adds, removes,
      retained.unionByName(adds.select(stored.columns.map(col): _*)))
  }

  /** U6 (add_transcripts.py:168-195): conditional upsert — a matched
    * row is replaced only when `incomingWins(inc, old)` holds (the
    * reference: "timestamped transcripts always win"); unmatched
    * incoming rows are inserted. `inc`/`old` resolve column names on
    * the respective side. */
  def conditionalUpsert(stored: DataFrame, incoming: DataFrame, keys: Seq[String])(
      incomingWins: (String => Column, String => Column) => Column): DataFrame = {
    val inc = incoming.alias("__inc")
    val old = stored.alias("__old")
    val cond = keys.map(k => inc(k) === old(k)).reduce(_ && _)
    val wins = incomingWins(inc.apply, old.apply)
    // matched & wins → incoming row; matched & !wins → stored row
    val matchedInc = inc.join(old, cond, "inner")
      .filter(wins).select(stored.columns.map(inc(_)): _*)
    val matchedOldKept = old.join(inc, cond, "inner")
      .filter(!incomingWins(inc.apply, old.apply))
      .select(stored.columns.map(old(_)): _*)
    val unmatchedInc = incoming.join(stored, keys, "left_anti")
      .select(stored.columns.map(col): _*)
    val unmatchedOld = stored.join(incoming, keys, "left_anti")
    unmatchedOld.unionByName(matchedOldKept)
      .unionByName(matchedInc).unionByName(unmatchedInc)
  }

  /** U7 (main_scraper.py:35-36,342-356): freshness-gated work list —
    * rows never scraped or older than `days` before `now`. Drives the
    * connector fan-out; `now` injected for reproducibility. */
  def freshnessGate(df: DataFrame, tsCol: String, now: Column, days: Int): DataFrame =
    df.filter(col(tsCol).isNull || col(tsCol) < now - expr(s"INTERVAL $days DAYS"))

  /** U8 (playlist_video_extractor.py:32-42): idempotent-job ledger —
    * drop work items already recorded. */
  def skipProcessed(work: DataFrame, ledger: DataFrame, workKey: String,
      ledgerKey: String): DataFrame =
    work.join(ledger.select(col(ledgerKey).as(workKey)), Seq(workKey), "left_anti")

  /** U9 (main_scraper.py:276-331,383-391): append-only status pings;
    * the "current status" view is latest-event-per-key — derived by
    * window, never by UPDATE, so the log stays immutable (and the view
    * is one shuffle). */
  def latestByKey(log: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keyCols(log, keys): _*)
      .orderBy(order.map(_.desc): _*)
    log.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }
}
