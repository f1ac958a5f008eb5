package graft.ops

import java.nio.file.{Files, Path, StandardCopyOption}
import java.nio.charset.StandardCharsets

/** Filesystem seam for [[ParquetTableStore]]'s two
  * filesystem-semantics-dependent operations, so the store is not
  * POSIX-bound:
  *
  *  - [[swapPointer]]: publish a new `_CURRENT` version pointer such
  *    that a concurrent reader sees the old or the new value, never a
  *    torn write.
  *  - [[shareFile]]: make `dst` a byte-identical replica of an
  *    immutable committed file without rewriting its data through the
  *    engine (the O(delta) trick for untouched buckets).
  *
  * [[PosixStoreIo]] (the default) implements them with atomic rename
  * and hard links — correct on HDFS and any real filesystem.
  * [[ObjectStoreIo]] is the S3-style profile: no rename, no inodes —
  * the pointer is a single-object overwrite (object PUTs are atomic
  * per object; a multi-writer deployment would add a conditional PUT
  * / ETag precondition, which this seam is the hook for) and sharing
  * is a server-side COPY (here: a file copy). The store's semantics —
  * staged version dirs, pointer-swap publish, prune — are identical
  * through either profile (ParquetTableStoreSpec runs the bucketed
  * upsert flow through both).
  */
trait StoreIo {

  /** Atomically (reader-visible-atomic) replace the pointer file. */
  def swapPointer(pointer: Path, content: String): Unit

  /** Replicate immutable `src` as `dst` without engine I/O. */
  def shareFile(src: Path, dst: Path): Unit
}

/** POSIX/HDFS profile: tmp-write + ATOMIC_MOVE, hard links. */
object PosixStoreIo extends StoreIo {

  override def swapPointer(pointer: Path, content: String): Unit = {
    val tmp = pointer.resolveSibling(pointer.getFileName.toString + ".tmp")
    Files.write(tmp, content.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, pointer,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  override def shareFile(src: Path, dst: Path): Unit =
    Files.createLink(dst, src)
}

/** S3-style profile: in-place pointer PUT (atomic per object; the
  * conditional-PUT precondition for multi-writer goes here) and
  * copy-based sharing (server-side COPY in a real object store). */
object ObjectStoreIo extends StoreIo {

  override def swapPointer(pointer: Path, content: String): Unit =
    Files.write(pointer, content.getBytes(StandardCharsets.UTF_8))

  override def shareFile(src: Path, dst: Path): Unit =
    Files.copy(src, dst, StandardCopyOption.COPY_ATTRIBUTES)
}
