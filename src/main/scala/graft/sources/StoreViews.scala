package graft.sources

import org.apache.spark.sql.SparkSession

import graft.ops.ParquetTableStore

/** SQL catalog surface over a [[graft.ops.ParquetTableStore]]: every
  * committed store table registered as a session view
  * `<prefix>_<table>`, so `spark.sql("SELECT … FROM graft_corpus")`
  * is a first-class way to consume the store — the "Spark-native
  * engine" face: analysts get plain SQL, and the plan underneath is
  * the SAME manifest-fed scan the programmatic path uses
  * ([[ManifestFileIndex]] via `store.read` — zero directory listing,
  * file sizes from the sidecar, data filters pushed into the parquet
  * scan per row group).
  *
  * Version semantics: a view binds the version resolved AT
  * REGISTRATION — consistent-snapshot reads by construction (the
  * same contract as a programmatic `read`'s frame): every query over
  * the view reads exactly that version until [[register]] is called
  * again, which re-resolves pointers and replaces the views (the
  * "refreshed per version" discipline — cheap, the frame is lazy).
  * Group consumers wanting a cross-table-consistent SQL surface
  * register a marker's vector via [[registerGroup]], whose views
  * bind the marker-pinned versions of every member.
  *
  * Naming: plain temp views (underscore-joined) rather than a
  * `catalog.table` V2 plugin — a session view resolves through the
  * same analyzer path, carries the same pushdown/pruning, and keeps
  * the engine dependency-free; swapping in a real metastore or a V2
  * TableCatalog changes the registration call, nothing downstream
  * (the [[graft.Tables.registerViews]] seam, extended to the store). */
object StoreViews {

  /** Register (or refresh) `tables` of `store` — default: every
    * committed table — as session views `<prefix>_<table>` bound to
    * their CURRENT versions. Returns the view names. */
  def register(spark: SparkSession, store: ParquetTableStore,
      prefix: String = "graft",
      tables: Seq[String] = Seq.empty): Seq[String] = {
    val ts = if (tables.nonEmpty) tables else store.tables
    ts.map { t =>
      val name = s"${prefix}_$t"
      store.read(spark, t).createOrReplaceTempView(name)
      name
    }
  }

  /** Register the GROUP MARKER's consistent vector as views: every
    * member of `group` binds its marker-pinned version — the SQL
    * face of [[graft.ops.ParquetTableStore.readGroup]], so a
    * SQL consumer of sibling tables (corpus+derived, ledger+clean)
    * can never query a mixed pair. */
  def registerGroup(spark: SparkSession, store: ParquetTableStore,
      group: String, prefix: String = "graft"): Seq[String] =
    store.readGroup(spark, group).toSeq.sortBy(_._1).map {
      case (t, (df, _)) =>
        val name = s"${prefix}_$t"
        df.createOrReplaceTempView(name)
        name
    }
}
