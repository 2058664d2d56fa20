package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Snapshot-isolation commit log for parquet tables — the ONE versioned
  * manifest discipline that replaces the repo's three ad-hoc commit
  * protocols (upsert/delete atomic directory swap, rollup `_folded_tags`
  * sidecar, index claim markers) for TABLE state. The shape is the public
  * Delta/Iceberg core, reduced to what a filesystem gives for free:
  *
  *   root/
  *     _txlog/v-<k>        versioned manifest: the complete data-file list
  *                          of version k, plus note lines (effectively-once
  *                          tags) and a trailing `commit` terminator
  *     data/c-<uuid>/       one immutable directory of parquet part files
  *                          per commit — written ONCE, never modified
  *
  * The three guarantees, and where each comes from:
  *
  *   - **Snapshot isolation for readers.** [[read]] resolves the latest
  *     complete manifest ONCE and hands Spark the explicit file list. Data
  *     files are immutable and uniquely named, so the snapshot stays
  *     byte-stable for as long as the plan lives — a reader concurrent
  *     with any number of commits sees exactly the version it pinned,
  *     never a mix, and NO `refreshByPath` hand-holding is needed anywhere
  *     (Spark's listing caches can't go stale on paths whose content never
  *     changes; the mutable state — the manifest — is read outside Spark).
  *   - **Exactly one winner per version.** A writer stages its manifest to
  *     a temp file and publishes with `Files.createLink(v-<k+1>, tmp)` —
  *     hard-link creation is an atomic compare-and-swap on POSIX: it
  *     either creates the full, final manifest or throws
  *     `FileAlreadyExistsException` having published NOTHING. The loser's
  *     staged data directory is invisible (no manifest references it) and
  *     is swept by [[vacuum]].
  *   - **Effectively-once folds.** Note lines ride IN the manifest, so a
  *     batch tag commits in the same atomic publish as the data it
  *     describes — the Rollup `_folded_tags` invariant, now structural.
  *     A crash anywhere leaves either the old manifest (retry re-folds:
  *     one copy) or the new manifest with its tag (retry no-ops); there is
  *     no window where data and marker disagree. Unlike the swap-based
  *     fold, CONCURRENT folders are safe: both read version k, one CAS
  *     wins k+1, the loser re-reads (sees the winner's tag set) and
  *     retries against fresh state — no silently dropped batch.
  *
  * What this deliberately does not do: multi-table transactions and
  * conflict-aware merges of CONCURRENT row-level edits (the losers retry
  * serially — optimistic concurrency, same as Delta's simplest level).
  * [[IndexCommit]] stays for the persisted-index layouts: an index commit
  * spans several band/list directories whose files are appended by Spark
  * jobs mid-commit, which needs the claim/stage/janitor machinery rather
  * than a pure immutable-file manifest.
  */
object TxLog {

  /** One pinned table version: the manifest's data files (relative to
    * root) and its accumulated note set (effectively-once tags). */
  final case class Snapshot(version: Long, files: Seq[String], notes: Set[String])

  private def logDir(root: String): Path = Paths.get(root, "_txlog")

  private def manifestPath(root: String, v: Long): Path =
    logDir(root).resolve(f"v-$v%020d")

  /** All manifest versions present, complete or not. Claimed version
    * numbers are burnt even when their manifest is torn (a crashed
    * fallback-path writer): the next writer claims past them. */
  private def allVersions(root: String): Seq[Long] =
    Option(logDir(root).toFile.listFiles()).getOrElse(Array.empty).toSeq
      .flatMap(f => scala.util.Try(f.getName.stripPrefix("v-").toLong).toOption)
      .sorted

  private def parseManifest(p: Path): Option[(Seq[String], Set[String])] = {
    if (!Files.isRegularFile(p)) return None
    val lines = Files.readAllLines(p, StandardCharsets.UTF_8).asScala.toVector
    // completeness gate: a manifest is real only when its terminator
    // landed — the hard-link publish makes partial content unreachable,
    // but the gate also protects any future non-POSIX fallback publisher
    if (!lines.lastOption.contains("commit")) return None
    Some((lines.collect { case l if l.startsWith("f\t") => l.drop(2) },
      lines.collect { case l if l.startsWith("n\t") => l.drop(2) }.toSet))
  }

  /** Latest COMPLETE version, 0 when the table has no log yet. */
  def currentVersion(root: String): Long =
    allVersions(root).reverse
      .find(v => parseManifest(manifestPath(root, v)).isDefined)
      .getOrElse(0L)

  /** Pin a snapshot of version `v` (default: latest). None for a table
    * with no committed version. */
  def snapshot(root: String, v: Long = -1L): Option[Snapshot] = {
    val ver = if (v >= 0) v else currentVersion(root)
    parseManifest(manifestPath(root, ver)).map { case (fs, ns) =>
      Snapshot(ver, fs, ns)
    }
  }

  /** Read a pinned version (default: latest at call time). The returned
    * plan references the snapshot's explicit immutable files — evaluating
    * it later, even after newer commits, still yields this version. */
  def read(spark: SparkSession, root: String, version: Long = -1L): DataFrame = {
    val snap = snapshot(root, version).getOrElse(
      throw new IllegalStateException(s"no committed version at $root" +
        (if (version >= 0) s" (asked for $version)" else "")))
    require(snap.files.nonEmpty, s"version ${snap.version} at $root has no data files")
    spark.read.parquet(snap.files.map(f => s"$root/$f"): _*)
  }

  /** Stage `df` as one immutable data directory; returns the relative
    * parquet file paths. An empty result restages with one partition so
    * the schema-bearing empty part file exists (a manifest must never be
    * file-less — [[read]] needs a schema source). */
  private def stageData(spark: SparkSession, root: String, df: DataFrame): Seq[String] = {
    val dirName = s"data/c-${java.util.UUID.randomUUID().toString.take(12)}"
    val abs = s"$root/$dirName"
    df.write.mode("overwrite").parquet(abs)
    def parts = Option(new java.io.File(abs).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .map(f => s"$dirName/${f.getName}").toSeq.sorted
    if (parts.isEmpty) df.repartition(1).write.mode("overwrite").parquet(abs)
    parts
  }

  /** Atomically publish version `expected + 1` with the given file list
    * and notes. Throws ConcurrentModificationException — having published
    * NOTHING — when another writer got there first. */
  private def publish(root: String, expected: Long, files: Seq[String],
      notes: Set[String]): Long = {
    Files.createDirectories(logDir(root))
    val next = expected + 1
    val body = (files.map("f\t" + _) ++ notes.toSeq.sorted.map("n\t" + _) :+ "commit")
      .mkString("", "\n", "\n")
    val tmp = logDir(root).resolve(s".tmp-${java.util.UUID.randomUUID()}")
    Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
    try {
      try Files.createLink(manifestPath(root, next), tmp)
      catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          throw new java.util.ConcurrentModificationException(
            s"txlog $root: version $next already published " +
              s"(this writer read stale version $expected); re-read and retry")
      }
      next
    } finally Files.deleteIfExists(tmp)
  }

  /** Create a table (version 1) from `df`. Throws the retryable
    * ConcurrentModificationException when a log already exists — so a
    * [[withRetry]] writer that raced another initializer re-reads and
    * takes its table-exists branch instead of dying on a non-retryable
    * error (the publish CAS covers the narrower check-then-publish
    * window the same way). */
  def init(spark: SparkSession, root: String, df: DataFrame, note: String = ""): Long = {
    if (currentVersion(root) != 0L)
      throw new java.util.ConcurrentModificationException(
        s"txlog already initialized at $root; re-read and retry")
    val files = stageData(spark, root, df)
    publish(root, 0L, files, if (note.isEmpty) Set.empty else Set(note))
  }

  /** Overwrite-commit: the new version's content is exactly `df`. CAS on
    * `expected`; notes accumulate (the new manifest carries the expected
    * snapshot's notes plus `note`). */
  def commitOverwrite(spark: SparkSession, root: String, df: DataFrame,
      expected: Long, note: String = ""): Long = {
    val prevNotes = snapshot(root, expected).map(_.notes).getOrElse(Set.empty)
    val files = stageData(spark, root, df)
    // CAS against exactly `expected` — anything else (e.g. latest-on-disk)
    // would publish OVER a concurrent writer's version this writer never
    // read: the textbook lost update
    publish(root, expected, files,
      if (note.isEmpty) prevNotes else prevNotes + note)
  }

  /** Append-commit: the new version is the expected snapshot's files plus
    * `df` staged as new files — no existing byte is read or rewritten. */
  def commitAppend(spark: SparkSession, root: String, df: DataFrame,
      expected: Long, note: String = ""): Long = {
    val snap = snapshot(root, expected).getOrElse(
      throw new IllegalStateException(s"append to uninitialized txlog $root"))
    val files = stageData(spark, root, df)
    publish(root, expected, snap.files ++ files,
      if (note.isEmpty) snap.notes else snap.notes + note)
  }

  /** Retry loop for optimistic writers: `attempt` receives the fresh
    * latest snapshot (None for an uninitialized table) and either commits
    * (Some(newVersion)) or declines (None → the whole op returns None,
    * e.g. an already-folded tag). CAS losers re-read and retry. */
  def withRetry[T](root: String, maxAttempts: Int = 5)(
      attempt: Option[Snapshot] => Option[T]): Option[T] = {
    var i = 0
    while (true) {
      i += 1
      try return attempt(snapshot(root))
      catch {
        case e: java.util.ConcurrentModificationException =>
          if (i >= maxAttempts) throw e
      }
    }
    None // unreachable
  }

  /** Keyed last-write-wins MERGE as one transactional commit: survivors
    * (anti-join) ∪ batch, published as a full overwrite version. Returns
    * the new version. Concurrent upserters serialize via CAS retry. */
  def upsert(spark: SparkSession, root: String, batch: DataFrame, key: String,
      note: String = ""): Long =
    withRetry(root) {
      case None =>
        Some(init(spark, root, batch, note))
      case Some(snap) =>
        val current = read(spark, root, snap.version)
        val merged = current.join(batch.select(key), Seq(key), "left_anti")
          .unionByName(batch)
        Some(commitOverwrite(spark, root, merged, snap.version, note))
    }.get

  /** Transactional targeted delete: survivors republished as a new
    * version (copy-on-write rewrite, manifest-atomic). */
  def delete(spark: SparkSession, root: String, victim: org.apache.spark.sql.Column,
      note: String = ""): Long =
    withRetry(root) { snapOpt =>
      val snap = snapOpt.getOrElse(
        throw new IllegalStateException(s"delete on uninitialized txlog $root"))
      // SQL DELETE semantics: only rows where the predicate is TRUE are
      // removed; NULL-predicate rows survive. A bare `!victim` would drop
      // them too (!NULL is NULL, and filter keeps only TRUE).
      val survivors = read(spark, root, snap.version)
        .filter(org.apache.spark.sql.functions.not(
          victim <=> org.apache.spark.sql.functions.lit(true)))
      Some(commitOverwrite(spark, root, survivors, snap.version, note))
    }.get

  /** Effectively-once tagged fold (the Rollup discipline on the log):
    * `merge(current)` builds the folded table; a tag already in the
    * snapshot's notes makes the fold a no-op (returns false). Safe under
    * CONCURRENT folders — the CAS loser re-reads the winner's tag set. */
  def foldOnce(spark: SparkSession, root: String, tag: String,
      merge: Option[DataFrame] => DataFrame): Boolean = {
    require(tag.matches("[A-Za-z0-9_-]+"), s"unsafe fold tag: $tag")
    withRetry(root) {
      case Some(snap) if snap.notes(tag) => Some(false)
      case None =>
        init(spark, root, merge(None), tag); Some(true)
      case Some(snap) =>
        commitOverwrite(spark, root,
          merge(Some(read(spark, root, snap.version))), snap.version, tag)
        Some(true)
    }.get
  }

  /** Bin-pack the LATEST version's files into `targetFiles` outputs and
    * republish — same row multiset, fewer files, zero shuffle
    * (`coalesce`), manifest-atomic, and pinned readers of older versions
    * keep their files until [[pruneHistory]] + [[vacuum]]. */
  def compact(spark: SparkSession, root: String, targetFiles: Int): Long =
    withRetry(root) { snapOpt =>
      val snap = snapOpt.getOrElse(
        throw new IllegalStateException(s"compact on uninitialized txlog $root"))
      val packed = read(spark, root, snap.version).coalesce(targetFiles.max(1))
      Some(commitOverwrite(spark, root, packed, snap.version, "compact"))
    }.get

  /** Drop all manifests except the newest `keepLast` (readers may no
    * longer pin the dropped versions; their exclusive data files become
    * vacuum-able). */
  def pruneHistory(root: String, keepLast: Int = 1): Unit = {
    val vs = allVersions(root)
    vs.dropRight(keepLast.max(1))
      .foreach(v => Files.deleteIfExists(manifestPath(root, v)))
  }

  /** Default [[vacuum]] retention: staged-but-unpublished data younger
    * than this is presumed to belong to an in-flight committer and is
    * left alone (the Delta vacuum discipline, scaled to single-commit
    * staging times rather than query lifetimes). */
  val DefaultVacuumGraceMs: Long = 15L * 60 * 1000

  /** Delete every `data/c-*` directory not referenced by ANY retained
    * manifest — CAS losers' and crashed writers' staged batches, plus
    * versions released by [[pruneHistory]] — PROVIDED the directory has
    * been quiescent for `graceMs`. The grace window is what makes vacuum
    * safe concurrent with writers: between [[stageData]] and [[publish]]
    * a committer's data directory is referenced by no manifest yet, so an
    * ungraced sweep would delete it and let the subsequent CAS publish a
    * manifest pointing at missing files. With the mtime grace, only
    * stagings older than any plausible in-flight commit are swept; pass
    * `graceMs = 0` only when no writer can be mid-commit (tests,
    * single-writer maintenance windows). Returns directories removed. */
  def vacuum(root: String, graceMs: Long = DefaultVacuumGraceMs): Int = {
    val referenced: Set[String] = allVersions(root)
      .flatMap(v => parseManifest(manifestPath(root, v))).flatMap(_._1)
      .map(f => f.split("/").take(2).mkString("/")).toSet
    val cutoff = System.currentTimeMillis() - graceMs
    val dataDir = new java.io.File(s"$root/data")
    val orphans = Option(dataDir.listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && d.getName.startsWith("c-") &&
        !referenced.contains(s"data/${d.getName}") &&
        quiescentSince(d) <= cutoff)
    orphans.foreach(org.apache.commons.io.FileUtils.deleteQuietly)
    orphans.length
  }

  /** Newest mtime anywhere under `d` — a staging Spark is still writing
    * keeps bumping this, so "old" means genuinely abandoned. */
  private def quiescentSince(d: java.io.File): Long = {
    val children = Option(d.listFiles()).getOrElse(Array.empty)
    (d.lastModified() +: children.map(quiescentSince)).max
  }
}
