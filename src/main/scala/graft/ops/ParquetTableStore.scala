package graft.ops

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.nio.charset.StandardCharsets
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned parquet table store with atomic commits — the persistence
  * half of the upsert library (SURVEY §7.4 hard part #1).
  *
  * Layout:  root/<table>/v=<K>/part-*.parquet  plus  root/<table>/_CURRENT
  * containing the live version number.
  *
  * Commit protocol (single-writer):
  *   1. write the new snapshot to v=<K+1> (a fresh directory — never
  *      touches the live one, so readers are never torn);
  *   2. write _CURRENT.tmp and ATOMIC_MOVE it over _CURRENT.
  * Readers resolve _CURRENT first, then read only that version dir —
  * the swap is a single atomic rename, so a concurrent reader sees
  * either the old or the new snapshot, never a mix. INSERT OR REPLACE
  * in the reference got this from SQLite's WAL; here it's the classic
  * staged-overwrite pattern.
  *
  * Scale notes: on HDFS rename is atomic; on S3-style object stores an
  * atomic-rename substitute (conditional PUT of _CURRENT) is needed —
  * that, plus multi-writer coordination and snapshot history, is what
  * a transactional table format (Delta/Iceberg) provides; this store
  * keeps the engine dependency-free while preserving the semantics the
  * operators need. Old versions are pruned to `keepVersions`.
  */
final class ParquetTableStore(root: String, keepVersions: Int = 2) {
  require(keepVersions >= 1)

  private def tableDir(table: String): Path = Paths.get(root, table)
  private def currentFile(table: String): Path = tableDir(table).resolve("_CURRENT")
  private def versionDir(table: String, v: Long): Path = tableDir(table).resolve(s"v=$v")

  def exists(table: String): Boolean = Files.exists(currentFile(table))

  def currentVersion(table: String): Option[Long] =
    if (!exists(table)) None
    else Some(new String(Files.readAllBytes(currentFile(table)),
      StandardCharsets.UTF_8).trim.toLong)

  def read(spark: SparkSession, table: String): DataFrame = {
    val v = currentVersion(table).getOrElse(
      throw new IllegalStateException(s"table $table has no committed version"))
    spark.read.parquet(versionDir(table, v).toString)
  }

  /** Write `df` as the next version and atomically publish it. */
  def commit(spark: SparkSession, table: String, df: DataFrame): Long = {
    val next = currentVersion(table).getOrElse(-1L) + 1
    val dir = versionDir(table, next)
    df.write.mode("errorifexists").parquet(dir.toString)
    val tmp = tableDir(table).resolve("_CURRENT.tmp")
    Files.write(tmp, next.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, currentFile(table),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    prune(table, next)
    next
  }

  /** U1 persisted: LWW-upsert `incoming` into the stored table (which
    * is created on first call). */
  def upsert(spark: SparkSession, table: String, incoming: DataFrame,
      keys: Seq[String]): Long =
    if (!exists(table)) commit(spark, table, incoming)
    else commit(spark, table,
      Upserts.upsertLastWriteWins(read(spark, table), incoming, keys))

  private def prune(table: String, current: Long): Unit = {
    val dir = tableDir(table)
    if (Files.exists(dir)) {
      Files.list(dir).iterator().asScala
        .filter(p => p.getFileName.toString.startsWith("v="))
        .map(p => (p, p.getFileName.toString.stripPrefix("v=").toLong))
        .filter { case (_, v) => v <= current - keepVersions }
        .foreach { case (p, _) => deleteRecursively(p) }
    }
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p))
      Files.list(p).iterator().asScala.foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }
}
