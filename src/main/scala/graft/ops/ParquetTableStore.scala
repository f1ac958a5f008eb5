package graft.ops

import java.nio.file.{Files, Path, Paths}
import java.nio.charset.StandardCharsets
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Versioned parquet table store with atomic commits — the persistence
  * half of the upsert library (SURVEY §7.4 hard part #1).
  *
  * Layout:  root/<table>/v=<K>/part-*.parquet  plus  root/<table>/_CURRENT
  * containing the live version number. Bucketed tables add
  * root/<table>/_BUCKETS (the bucket count, fixed at creation) and
  * nest `kb=<N>/` partition dirs under each version.
  *
  * Commit protocol:
  *   1. write the new snapshot to v=<K+1> (a fresh directory — never
  *      touches the live one, so readers are never torn);
  *   2. compare-and-set _CURRENT from K to K+1 ([[StoreIo
  *      .swapPointerIfCurrent]]): a competing writer that published
  *      first makes the CAS throw [[ConcurrentCommitException]] — a
  *      clean retryable failure — instead of silently orphaning one
  *      writer's merge.
  * Readers resolve _CURRENT first, then read only that version dir —
  * the swap is reader-atomic, so a concurrent reader sees either the
  * old or the new snapshot, never a mix. INSERT OR REPLACE in the
  * reference got this from SQLite's WAL; here it's the classic
  * staged-overwrite pattern plus an optimistic-concurrency publish.
  *
  * O(delta) commits: [[upsertBucketed]] partitions the table by a key
  * bucket (`kb = pmod(hash(keys), numBuckets)`), rewrites ONLY the
  * buckets the incoming delta touches, and HARD-LINKS every untouched
  * bucket's files from the previous version — byte-identical by
  * construction, O(1) per file, and version pruning stays safe
  * because the links keep shared inodes alive. A merge therefore
  * costs O(delta + touched buckets), not O(table): at 100 TB a
  * 1000-bucket table absorbs a single-bucket delta by reading and
  * rewriting ~0.1% of its bytes.
  *
  * Schema evolution: both upsert paths align schemas add-only via
  * [[SchemaEvolution.align]] before merging (the reference's ALTER
  * TABLE ADD COLUMN analog), so a producer that grew a column merges
  * into an old table without a manual migration.
  *
  * Scale notes: the two filesystem-semantics dependencies (atomic
  * pointer swap, hard-link sharing) live behind the [[StoreIo]] seam:
  * [[PosixStoreIo]] (default) is correct on HDFS and any real
  * filesystem; [[ObjectStoreIo]] is the S3-style profile (atomic
  * single-object pointer PUT with the conditional-PUT / If-Match
  * precondition modeled for multi-writer, and server-side COPY
  * instead of links). Writer conflicts surface as
  * [[ConcurrentCommitException]] (re-read + retry); richer snapshot
  * history is what a transactional table format (Delta/Iceberg)
  * provides — this store keeps the engine dependency-free while
  * preserving the semantics the operators need. Old versions are
  * pruned to `keepVersions`.
  */
final class ParquetTableStore(root: String, keepVersions: Int = 2,
    io: StoreIo = PosixStoreIo) {
  require(keepVersions >= 1)

  private val BucketCol = "__kb"

  private def tableDir(table: String): Path = Paths.get(root, table)
  private def currentFile(table: String): Path = tableDir(table).resolve("_CURRENT")
  private def bucketsFile(table: String): Path = tableDir(table).resolve("_BUCKETS")
  private def versionDir(table: String, v: Long): Path = tableDir(table).resolve(s"v=$v")

  def exists(table: String): Boolean = Files.exists(currentFile(table))

  def currentVersion(table: String): Option[Long] =
    if (!exists(table)) None
    else Some(new String(Files.readAllBytes(currentFile(table)),
      StandardCharsets.UTF_8).trim.toLong)

  /** Bucket count for a bucketed table (absent → snapshot table). */
  def numBuckets(table: String): Option[Int] =
    if (!Files.exists(bucketsFile(table))) None
    else Some(new String(Files.readAllBytes(bucketsFile(table)),
      StandardCharsets.UTF_8).trim.toInt)

  /** The live snapshot. The internal bucket column never escapes. */
  def read(spark: SparkSession, table: String): DataFrame = {
    val v = currentVersion(table).getOrElse(
      throw new IllegalStateException(s"table $table has no committed version"))
    readVersion(spark, table, v)
  }

  private def readVersion(spark: SparkSession, table: String, v: Long): DataFrame = {
    val df = spark.read.parquet(versionDir(table, v).toString)
    if (df.columns.contains(BucketCol)) df.drop(BucketCol) else df
  }

  /** Write `df` as the next version, atomically publish it, and
    * return the RE-READ frame. The returned frame reads the committed
    * files (not the input's lazy plan), so it stays valid across
    * subsequent commits until its version is pruned — with the
    * default keepVersions=2 that means "reuse after the next commit"
    * is always safe, which is the exact sharp edge the old
    * commit-then-re-read discipline existed to avoid. */
  def commit(spark: SparkSession, table: String, df: DataFrame): DataFrame = {
    val next = writeVersion(spark, table, df, partitioned = false)
    publish(table, next)
    readVersion(spark, table, next)
  }

  /** U1 persisted: LWW-upsert `incoming` into the stored table (which
    * is created on first call), with add-only schema evolution when
    * the incoming schema grew. Full-snapshot rewrite — for O(delta)
    * commits on big tables use [[upsertBucketed]]. */
  def upsert(spark: SparkSession, table: String, incoming: DataFrame,
      keys: Seq[String]): DataFrame =
    if (!exists(table)) commit(spark, table, incoming)
    else {
      val (stored, inc) = SchemaEvolution.align(read(spark, table), incoming)
      commit(spark, table, Upserts.upsertLastWriteWins(stored, inc, keys))
    }

  /** LWW-upsert into a key-bucketed table, rewriting only the buckets
    * the delta touches; untouched buckets are hard-linked from the
    * previous version (byte-identical, O(1) per file). `numBuckets`
    * binds at table creation and is ignored afterwards. */
  def upsertBucketed(spark: SparkSession, table: String, incoming: DataFrame,
      keys: Seq[String], numBuckets: Int = 32): DataFrame = {
    require(numBuckets >= 1)
    def bucketed(df: DataFrame, n: Int): DataFrame =
      df.withColumn(BucketCol, pmod(hash(keys.map(col): _*), lit(n)))
    if (!exists(table)) {
      Files.createDirectories(tableDir(table))
      Files.write(bucketsFile(table), numBuckets.toString.getBytes(StandardCharsets.UTF_8))
      val next = writeVersion(spark, table, bucketed(incoming, numBuckets),
        partitioned = true)
      publish(table, next)
      readVersion(spark, table, next)
    } else {
      val n = this.numBuckets(table).getOrElse(throw new IllegalStateException(
        s"table $table was created as a snapshot table; use upsert"))
      val cur = currentVersion(table).get
      val curDir = versionDir(table, cur)
      // which buckets does the delta touch? (≤ n ints — driver-safe)
      val inc = bucketed(incoming, n)
      val touched = inc.select(BucketCol).distinct()
        .collect().map(_.getInt(0)).toSet
      // partition-pruned read of just the touched buckets
      val storedTouched = spark.read.parquet(curDir.toString)
        .filter(col(BucketCol).isin(touched.toSeq: _*))
      val (stored, incA) = SchemaEvolution.align(
        storedTouched.drop(BucketCol), incoming)
      val merged = bucketed(
        Upserts.upsertLastWriteWins(stored, incA, keys), n)
      val next = cur + 1
      val nextDir = versionDir(table, next)
      merged.write.mode("errorifexists")
        .partitionBy(BucketCol).parquet(nextDir.toString)
      // share untouched bucket dirs from the previous version without
      // rewriting them (hard links on POSIX, copies on object stores)
      Files.list(curDir).iterator().asScala
        .filter(p => Files.isDirectory(p))
        .filter(p => p.getFileName.toString.startsWith(s"$BucketCol="))
        .filterNot(p => touched.contains(
          p.getFileName.toString.stripPrefix(s"$BucketCol=").toInt))
        .foreach { src =>
          val dst = nextDir.resolve(src.getFileName.toString)
          Files.createDirectories(dst)
          Files.list(src).iterator().asScala
            .filter(f => Files.isRegularFile(f))
            .foreach(f => io.shareFile(f, dst.resolve(f.getFileName.toString)))
        }
      publish(table, next)
      readVersion(spark, table, next)
    }
  }

  private def writeVersion(spark: SparkSession, table: String, df: DataFrame,
      partitioned: Boolean): Long = {
    val next = currentVersion(table).getOrElse(-1L) + 1
    val dir = versionDir(table, next)
    val w = df.write.mode("errorifexists")
    (if (partitioned) w.partitionBy(BucketCol) else w).parquet(dir.toString)
    next
  }

  /** Publish version `next` with a compare-and-set on the pointer:
    * the expected previous content is exactly the version this commit
    * was computed against (`next - 1`, or absence for a new table).
    * A competing writer that published in between makes the CAS throw
    * [[ConcurrentCommitException]] — the staged `v=next` directory is
    * left intact and the caller can re-read + retry — instead of
    * silently orphaning one writer's merge (last-write-wins). */
  private def publish(table: String, next: Long): Unit = {
    val expected = if (next == 0) None else Some((next - 1).toString)
    io.swapPointerIfCurrent(currentFile(table), next.toString, expected)
    prune(table, next)
  }

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
