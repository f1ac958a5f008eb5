package graft.ops

import java.nio.channels.FileChannel
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, StandardCopyOption, StandardOpenOption}

/** A competing writer published between this writer's snapshot read
  * and its publish attempt. The staged version directory is intact;
  * the caller may re-read the table, re-apply its delta, and retry. */
final class ConcurrentCommitException(msg: String,
    cause: Throwable = null)
  extends RuntimeException(msg, cause)

/** A time-travel read's version fell out of the retention window
  * (pruned, or never committed) — permanently gone, so retrying is
  * pointless: this is the signal an incremental consumer REBASES on
  * (full re-read of the live snapshot + cursor reset), distinct from
  * the transient [[ConcurrentCommitException]] conflicts that heal on
  * retry. Subclasses IllegalStateException so callers that treated
  * the refusal generically keep working. */
final class RetentionLostException(msg: String)
  extends IllegalStateException(msg)

/** Filesystem seam for [[ParquetTableStore]]'s
  * filesystem-semantics-dependent operations, so the store is not
  * POSIX-bound:
  *
  *  - [[swapPointer]]: publish a new `_CURRENT` version pointer such
  *    that a concurrent reader sees the old or the new value, never a
  *    torn write.
  *  - [[swapPointerIfCurrent]]: the MULTI-WRITER publish — replace
  *    the pointer only if its current content equals the value this
  *    writer's commit was computed against (compare-and-set). A lost
  *    race surfaces as [[ConcurrentCommitException]] — a clean,
  *    retryable failure — instead of a silent last-write-wins that
  *    would orphan the other writer's snapshot.
  *  - [[shareFile]]: make `dst` a byte-identical replica of an
  *    immutable committed file without rewriting its data through the
  *    engine (the O(delta) trick for untouched buckets).
  *
  * [[PosixStoreIo]] (the default) implements the pointer ops with
  * atomic rename, the CAS with read-compare-swap under an exclusive
  * sidecar file lock (correct across processes on any real
  * filesystem), and sharing with hard links. [[ObjectStoreIo]] is the
  * S3-style profile: no rename, no inodes — the pointer is a
  * single-object overwrite (object PUTs are atomic per object), the
  * CAS models the store's conditional PUT (`If-Match: <etag>` /
  * `If-None-Match: *` preconditions; the sidecar lock stands in for
  * the service-side atomicity of that precondition check), and
  * sharing is a server-side COPY (here: a file copy). The store's
  * semantics — staged version dirs, pointer-swap publish, prune — are
  * identical through either profile (ParquetTableStoreSpec runs the
  * bucketed upsert flow through both).
  */
trait StoreIo {

  /** Atomically (reader-visible-atomic) replace the pointer file. */
  def swapPointer(pointer: Path, content: String): Unit

  /** Compare-and-set publish: replace the pointer only if its current
    * content is `expectedPrevious` (None ⇒ the pointer must not exist
    * yet). Throws [[ConcurrentCommitException]] when another writer
    * got there first. */
  def swapPointerIfCurrent(pointer: Path, content: String,
      expectedPrevious: Option[String]): Unit

  /** Compare-and-delete: remove the pointer only if its current
    * content is `expected` — the undo half of a first-commit CAS
    * whose staged data was swept out from under it. Throws
    * [[ConcurrentCommitException]] when a competitor has already
    * advanced the pointer (the undo must then NOT land: reverting a
    * competitor's committed version is a lost commit). */
  def deletePointerIfCurrent(pointer: Path, expected: String): Unit

  /** Replicate immutable `src` as `dst` without engine I/O. */
  def shareFile(src: Path, dst: Path): Unit
}

/** Shared read-compare-swap under an exclusive sidecar `.lock` file
  * channel lock: serializes committers across processes; the actual
  * pointer replacement is delegated so each profile keeps its own
  * reader-atomicity mechanism. An in-process monitor per pointer
  * wraps the file lock because JVM file locks are held process-wide —
  * a second same-JVM locker gets OverlappingFileLockException instead
  * of blocking (local-mode committers are threads, not processes). */
private[ops] object LockedCas {
  private[ops] val monitors =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
}

private[ops] trait LockedCas { self: StoreIo =>

  private def withPointerLock[A](pointer: Path)(body: Option[String] => A): A =
    LockedCas.monitors
      .computeIfAbsent(pointer.toAbsolutePath.toString, _ => new Object)
      .synchronized {
      val lock = pointer.resolveSibling(pointer.getFileName.toString + ".lock")
      val ch = FileChannel.open(lock,
        StandardOpenOption.CREATE, StandardOpenOption.WRITE)
      try {
        val fl = ch.lock()
        try {
          val current =
            if (Files.exists(pointer))
              Some(new String(Files.readAllBytes(pointer), StandardCharsets.UTF_8).trim)
            else None
          body(current)
        } finally fl.release()
      } finally ch.close()
    }

  override def swapPointerIfCurrent(pointer: Path, content: String,
      expectedPrevious: Option[String]): Unit =
    withPointerLock(pointer) { current =>
      if (current != expectedPrevious)
        throw new ConcurrentCommitException(
          s"pointer $pointer moved: expected ${expectedPrevious.getOrElse("<absent>")}, " +
            s"found ${current.getOrElse("<absent>")} — concurrent commit; re-read and retry")
      swapPointer(pointer, content)
    }

  override def deletePointerIfCurrent(pointer: Path, expected: String): Unit =
    withPointerLock(pointer) { current =>
      if (!current.contains(expected))
        throw new ConcurrentCommitException(
          s"pointer $pointer moved: expected $expected, " +
            s"found ${current.getOrElse("<absent>")} — concurrent commit; undo skipped")
      Files.delete(pointer)
    }
}

/** POSIX/HDFS profile: tmp-write + ATOMIC_MOVE, hard links, CAS under
  * the sidecar lock. */
object StoreIo {
  /** Profile for stores constructed without an explicit `io`:
    * `SPARK_GRAFT_STORE_IO=object` flips EVERY default-constructed
    * store in the process to the S3-style profile — the battery-slice
    * discipline (round-13 verdict item 7): an atomic-rename or inode
    * assumption hiding in a newer write path would pass every
    * POSIX-profile gate forever; a full Verify run under the flipped
    * profile smokes it out. */
  def default: StoreIo =
    if (sys.env.get("SPARK_GRAFT_STORE_IO").contains("object"))
      ObjectStoreIo
    else PosixStoreIo
}

object PosixStoreIo extends StoreIo with LockedCas {

  override def swapPointer(pointer: Path, content: String): Unit = {
    val tmp = pointer.resolveSibling(pointer.getFileName.toString + ".tmp")
    Files.write(tmp, content.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, pointer,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  override def shareFile(src: Path, dst: Path): Unit =
    Files.createLink(dst, src)
}

/** S3-style profile: in-place pointer PUT (atomic per object), CAS
  * modeling the conditional PUT (If-Match precondition — the sidecar
  * lock is the local stand-in for the service-side check), and
  * copy-based sharing (server-side COPY in a real object store). */
object ObjectStoreIo extends StoreIo with LockedCas {

  override def swapPointer(pointer: Path, content: String): Unit =
    Files.write(pointer, content.getBytes(StandardCharsets.UTF_8))

  override def shareFile(src: Path, dst: Path): Unit =
    Files.copy(src, dst, StandardCopyOption.COPY_ATTRIBUTES)
}
