package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import java.util.UUID

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A minimal versioned parquet table — the transactional-log idea of the
  * lakehouse papers (immutable data files + an ordered log of file-set
  * deltas) reduced to what a single-cluster pipeline needs: atomic
  * append/overwrite, snapshot-isolated reads, time travel, and
  * optimistic-concurrency conflict detection. Honest scoping: ONE writer
  * wins per version via an atomic create (no multi-table transactions, no
  * server); readers never lock.
  *
  * Layout:
  * {{{
  *   table/part-<uuid>.parquet     immutable data files (never rewritten)
  *   table/_log/<v>.json           one line-delimited JSON action list per
  *                                 commit; <v> is zero-padded so lexical
  *                                 order IS version order
  * }}}
  *
  * Each log entry is `{"add": "<file>"}` or `{"remove": "<file>"}`; a
  * snapshot at version v is the adds-minus-removes fold of entries 0..v.
  * Commit protocol: write data files first (invisible until logged), then
  * `CREATE_NEW` the next log file — the filesystem's atomic create is the
  * commit point, so a concurrent writer racing for the same version loses
  * with [[VersionConflictException]] and can retry against the new head
  * (classic optimistic concurrency).
  *
  * Scale shape: the log grows with COMMITS (tiny JSON), never with data;
  * a snapshot read is a file-list fold + one parquet multi-file scan, so
  * Catalyst still prunes columns/filters per file. Orphaned data files
  * from failed commits are invisible (never logged) and swept by
  * [[vacuum]]. At real scale the same design needs only an atomic-rename
  * or CAS primitive from the object store — the protocol is unchanged.
  */
final class VersionedTable(spark: SparkSession, root: String) {

  private val rootPath: Path = Paths.get(root)
  private val logDir: Path = rootPath.resolve("_log")
  Files.createDirectories(logDir)

  /** Latest committed version, or -1 for an empty table. */
  def currentVersion(): Int =
    listLog().lastOption.map(versionOf).getOrElse(-1)

  /** Snapshot-isolated read. `version` defaults to the current head; a
    * concurrent commit after the head is resolved is invisible to this
    * read (the file list is fixed before the scan). */
  def read(version: Option[Int] = None): DataFrame = {
    val v = version.getOrElse(currentVersion())
    require(v >= 0, s"table $root has no committed version (asked for $version)")
    val files = snapshotFiles(v)
    if (files.isEmpty) // empty snapshot still carries its schema
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], lastSchema(v))
    else
      spark.read.parquet(files.map(f => rootPath.resolve(f).toString): _*)
  }

  /** Append `df` as a new version. A lost race against another appender
    * retries against the new head (append order is commutative). Returns
    * the committed version. */
  def append(df: DataFrame): Int =
    commit(df, replace = false, expected = None)

  /** Replace the table contents with `df` as a new version (previous
    * files stay on disk for time travel until vacuumed). With
    * `expectedHead`, the commit is a compare-and-swap: it fails with
    * [[VersionConflictException]] if anyone committed past that head —
    * the read-modify-write pattern (read at v, transform, overwrite
    * expecting v) that makes lost updates impossible. Without it, the
    * overwrite retries with removes recomputed against the new head. */
  def overwrite(df: DataFrame, expectedHead: Option[Int] = None): Int =
    commit(df, replace = true, expected = expectedHead)

  /** File-level change-data capture for append-only flows: the rows
    * committed strictly after `sinceVersion` (by versions
    * sinceVersion+1 .. head). This is the incremental-ingest read — a
    * downstream consumer remembers the version it last processed and
    * asks for the delta, touching only the NEW files, never rescanning
    * the table. File granularity cannot express an overwrite's row-level
    * delta, so a remove anywhere in the range fails loudly instead of
    * returning adds that double-count rewritten rows. */
  def changesSince(sinceVersion: Int): DataFrame = {
    val head = currentVersion()
    require(sinceVersion >= -1 && sinceVersion <= head,
      s"changesSince($sinceVersion): table $root is at version $head")
    if (sinceVersion == head)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        lastSchema(head))
    val range = listLog()
      .filter(p => versionOf(p) > sinceVersion && versionOf(p) <= head)
    val entries = range.flatMap(parseLog)
    val removed = entries.collect { case (false, f) => f }
    require(removed.isEmpty,
      s"changesSince($sinceVersion): versions ${sinceVersion + 1}..$head " +
        s"contain an overwrite — file-level CDC is append-only; " +
        s"re-read the snapshot instead")
    val added = entries.collect { case (true, f) => f }
    val vanished = added.filterNot(f => Files.exists(rootPath.resolve(f)))
    if (vanished.nonEmpty) throw new IllegalStateException(
      s"changesSince($sinceVersion) references vacuumed files: " +
        vanished.mkString(", "))
    spark.read.parquet(added.map(f => rootPath.resolve(f).toString): _*)
  }

  /** Garbage-collect two classes of data file: orphans (on disk but never
    * logged — debris of failed commits) and history (files that only
    * snapshots ≤ `beforeVersion` reference; no retention clock, the
    * caller names the horizon explicitly). The head snapshot is always
    * safe; time travel to a vacuumed version afterwards fails loudly
    * rather than returning partial data. Returns deleted file names. */
  def vacuum(beforeVersion: Int): Seq[String] = {
    val head = currentVersion()
    val live = if (head < 0) Set.empty[String] else snapshotFiles(head).toSet
    val everLogged = logEntries(head).map(_._2).toSet
    val onDisk = listDir(rootPath)
      .filter(p => Files.isRegularFile(p)).map(_.getFileName.toString)
      .filter(_.endsWith(".parquet"))
    // referenced by some snapshot <= beforeVersion but not by anything after
    val removedEarly =
      if (beforeVersion < 0) Set.empty[String]
      else everLogged -- snapshotReferencedAfter(beforeVersion, head) -- live
    val orphans = onDisk.filterNot(everLogged) // never committed
    val doomed = (orphans ++ removedEarly.toSeq).distinct
    doomed.foreach(f => Files.deleteIfExists(rootPath.resolve(f)))
    doomed
  }

  // ---- internals -------------------------------------------------------

  private def commit(df: DataFrame, replace: Boolean,
      expected: Option[Int]): Int = {
    // stage data invisibly: write to a scratch dir, move files in
    val scratch = rootPath.resolve(s"_tmp-${UUID.randomUUID()}")
    df.write.parquet(scratch.toString)
    val staged = listDir(scratch)
      .filter(_.getFileName.toString.endsWith(".parquet"))
    val named = staged.map { p =>
      val name = s"part-${UUID.randomUUID()}.parquet"
      Files.move(p, rootPath.resolve(name))
      name
    }
    deleteRecursively(scratch)
    var attempt = expected.map(_ + 1).getOrElse(currentVersion() + 1)
    while (true) {
      // removes recomputed per attempt: after a lost race the previous
      // snapshot is someone else's commit
      val removes =
        if (replace && attempt > 0) snapshotFiles(attempt - 1) else Seq.empty
      val body = (removes.map(f => s"""{"remove": "$f"}""") ++
        named.map(f => s"""{"add": "$f"}""")).mkString("", "\n", "\n")
      try {
        Files.write(logDir.resolve(f"$attempt%010d.json"),
          body.getBytes(StandardCharsets.UTF_8), StandardOpenOption.CREATE_NEW)
        return attempt
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          if (expected.isDefined) {
            // CAS failed: someone committed past the expected head —
            // un-stage and surface, never silently drop their update
            named.foreach(f => Files.deleteIfExists(rootPath.resolve(f)))
            throw new VersionConflictException(
              s"expected head ${expected.get} but version $attempt exists " +
                s"under $root")
          }
          attempt = currentVersion() + 1 // lost the race: retry on new head
      }
    }
    -1 // unreachable
  }

  /** Files.list streams hold a directory handle — drain and close. */
  private def listDir(p: Path): Seq[Path] = {
    val s = Files.list(p)
    try s.iterator().asScala.toSeq finally s.close()
  }

  private def listLog(): Seq[Path] =
    listDir(logDir)
      .filter(_.getFileName.toString.endsWith(".json"))
      .sortBy(_.getFileName.toString)

  private def versionOf(p: Path): Int =
    p.getFileName.toString.stripSuffix(".json").toInt

  private def parseLog(p: Path): Seq[(Boolean, String)] =
    Files.readAllLines(p).asScala.toSeq.filter(_.nonEmpty).map { line =>
      (line.contains("\"add\""), line.split("\"")(3))
    }

  /** (isAdd, file) pairs for versions 0..v in commit order. */
  private def logEntries(v: Int): Seq[(Boolean, String)] =
    listLog().filter(versionOf(_) <= v).flatMap(parseLog)

  private def snapshotFiles(v: Int): Seq[String] = {
    val logs = listLog().filter(versionOf(_) <= v)
    require(logs.nonEmpty && logs.map(versionOf).max == v,
      s"version $v does not exist under $root (have ${currentVersion()})")
    val live = mutable.LinkedHashSet.empty[String]
    logEntries(v).foreach {
      case (true, f) => live += f
      case (false, f) => require(live.remove(f),
        s"corrupt log: version ≤ $v removes never-added file $f")
    }
    val vanished = live.filterNot(f => Files.exists(rootPath.resolve(f)))
    if (vanished.nonEmpty) throw new IllegalStateException(
      s"snapshot $v references vacuumed files: ${vanished.mkString(", ")} " +
        "— time travel past a vacuum horizon")
    live.toSeq
  }

  private def snapshotReferencedAfter(v: Int, head: Int): Set[String] =
    (math.max(v + 1, 0) to head)
      .flatMap(w => scala.util.Try(snapshotFiles(w)).getOrElse(Seq.empty))
      .toSet

  private def lastSchema(v: Int): org.apache.spark.sql.types.StructType = {
    // an all-removed snapshot still has a schema: read it from any file
    // the log ever added (files survive until vacuum)
    val any = logEntries(v).collectFirst {
      case (true, f) if Files.exists(rootPath.resolve(f)) => f
    }
    require(any.nonEmpty, s"no schema recoverable for empty snapshot $v")
    spark.read.parquet(rootPath.resolve(any.get).toString).schema
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) listDir(p).foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }
}

final class VersionConflictException(msg: String)
    extends RuntimeException(msg)
