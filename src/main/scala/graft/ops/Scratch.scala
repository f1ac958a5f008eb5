package graft.ops

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** Session-scoped scratch directories for operators that stage a
  * fixpoint to disk ([[ConnectedComponents]], [[PageRank]]): created
  * under java.io.tmpdir and deleted recursively on JVM exit, so a
  * long-running driver does not accumulate one orphan parquet dir per
  * call. Callers that run MANY fixpoints in one process (the
  * streaming ingest loops) should pass an explicit `scratchDir` and
  * let overwrite-mode writes reuse it per batch instead — exit-time
  * cleanup bounds the leak, per-batch reuse eliminates it. */
private[graft] object Scratch {
  private val registered = scala.collection.mutable.ArrayBuffer.empty[Path]
  private lazy val hookInstalled: Boolean = {
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      registered.synchronized(registered.foreach(deleteRecursively))))
    true
  }

  /** A fresh temp dir registered for recursive deletion at JVM exit. */
  def tempDir(prefix: String): String = {
    require(hookInstalled)
    val p = Files.createTempDirectory(prefix)
    registered.synchronized(registered += p)
    p.toString
  }

  /** A fresh FAST scratch dir for small, churn-heavy state —
    * streaming checkpoints and gate-scale stores, whose cost is
    * fsync/rename latency, not bandwidth. Resolution order:
    * `GRAFT_SCRATCH_DIR` (explicit override) → `/dev/shm` when
    * writable (RAM-backed tmpfs — the right home for KB-scale
    * checkpoint WALs and MB-scale fixture stores) → java.io.tmpdir.
    * NOT for corpus-sized staging ([[ConnectedComponents]]/BPE
    * fixpoints stay on [[tempDir]]): RAM-backed scratch under a
    * 100 TB fixpoint would evict the page cache the job needs.
    * Same exit-time recursive cleanup as [[tempDir]]. */
  def fastDir(prefix: String): String = {
    require(hookInstalled)
    val base = sys.env.get("GRAFT_SCRATCH_DIR").map(Path.of(_))
      .orElse {
        val shm = Path.of("/dev/shm")
        if (Files.isDirectory(shm) && Files.isWritable(shm)) Some(shm)
        else None
      }
    val p = base match {
      case Some(b) => Files.createTempDirectory(b, prefix)
      case None => Files.createTempDirectory(prefix)
    }
    registered.synchronized(registered += p)
    p.toString
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val s = Files.list(p)
      try s.iterator().asScala.foreach(deleteRecursively)
      finally s.close()
    }
    Files.deleteIfExists(p)
    ()
  }
}
