package graft.util

import java.nio.file.{Files, Path}

/** Scratch directories that actually get cleaned up.
  *
  * `File.deleteOnExit` on a directory is a no-op once the directory has
  * contents (the JVM unlinks in reverse-registration order, files first
  * only if each was registered — ours are written by Spark tasks and
  * never registered), so every gate that staged a corpus copy under
  * /tmp leaked it. One JVM-wide shutdown hook walks the registered
  * roots deepest-first instead; `cleanNow` is for callers that can
  * delete eagerly (a finished stream's landing dir).
  */
object TempDirs {
  private val registered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Path]()
  private lazy val hook: Unit = Runtime.getRuntime.addShutdownHook(
    new Thread(() => registered.forEach(deleteRecursively(_)), "graft-tmp"))

  /** Create a scratch dir under java.io.tmpdir, registered for recursive
    * delete at JVM exit. */
  def scratch(prefix: String): Path = {
    hook
    val p = Files.createTempDirectory(prefix)
    registered.add(p)
    p
  }

  /** Delete a scratch dir now (idempotent) and drop it from the hook. */
  def cleanNow(p: Path): Unit = {
    registered.remove(p)
    deleteRecursively(p)
  }

  /** Depth-first recursive delete (idempotent; symlinks are unlinked,
    * never followed). Public: the canary tools' stale-corpus rebuilds
    * share this instead of re-rolling Files.walk copies. */
  def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      if (Files.isDirectory(p) && !Files.isSymbolicLink(p)) {
        val s = Files.list(p)
        try s.forEach(deleteRecursively(_)) finally s.close()
      }
      Files.deleteIfExists(p)
    }
}
