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
