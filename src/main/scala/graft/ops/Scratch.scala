package graft.ops

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

/**
 * Process-lifetime scratch directories. Persisted side artifacts (the
 * incremental-dedup gate indexes, IVF cell stores, spec warehouses) need a
 * directory that outlives a single action but not the JVM; a bare
 * `Files.createTempDirectory` leaks one directory per (process, use) into
 * /tmp. Every directory handed out here is recursively deleted by a single
 * JVM shutdown hook.
 */
object Scratch {
  private val created = new java.util.concurrent.ConcurrentLinkedQueue[Path]()

  @volatile private var hookInstalled = false
  private def ensureHook(): Unit = if (!hookInstalled) synchronized {
    if (!hookInstalled) {
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        created.forEach(p => deleteRecursively(p))
      }, "graft-scratch-cleanup"))
      hookInstalled = true
    }
  }

  private def deleteRecursively(root: Path): Unit =
    if (Files.exists(root)) {
      try {
        Files.walk(root).sorted(Comparator.reverseOrder[Path]())
          .forEach(p => { try Files.delete(p) catch { case _: Exception => () } })
      } catch { case _: Exception => () }
    }

  /** A fresh temp directory that will be removed at JVM exit. */
  def dir(prefix: String): String = {
    ensureHook()
    val p = Files.createTempDirectory(prefix)
    created.add(p)
    p.toString
  }

  /** Register an externally created path for exit-time removal (e.g. a
   * warehouse dir a SparkSession required before this helper could run). */
  def register(path: String): String = {
    ensureHook()
    created.add(Paths.get(path))
    path
  }
}
