package graft.operators

import java.nio.file.{Files, Paths, StandardOpenOption}

import scala.jdk.CollectionConverters._

/** Cross-PROCESS writer coordination for the persisted indexes
  * ([[IvfIndex.appendIvf]], [[SigIndex.append]]). The in-process
  * `buildLock` serializes concurrent queries inside one driver JVM, but
  * two DRIVERS appending to the same index directory would interleave
  * unchecked: both read the same meta count, both append, and the final
  * meta describes only the last writer's view.
  *
  * The protocol is optimistic concurrency over atomic file creation —
  * the only primitive plain parquet directories offer (no transaction
  * log):
  *
  *   - the committed history lives as `commits/commit-<k>` marker files;
  *     the current version is the largest k;
  *   - a writer READS the version alongside the meta it bases its append
  *     on, then CLAIMS version k+1 via `Files.createFile` — atomic at the
  *     filesystem level, so of two racing writers exactly ONE wins; the
  *     loser gets [[java.util.ConcurrentModificationException]] BEFORE
  *     writing any data file and retries against the fresh state;
  *   - the winner appends its data and then FINALIZES the marker (writes
  *     `done` into it) together with the new meta count.
  *
  * A writer that crashes between claim and finalize leaves an
  * unfinalized marker: [[unfinalized]] exposes it, and the policy —
  * pinned in IndexCommitSpec — is that the next maintenance entry
  * detects it and falls back to a full rebuild ([[reset]]), exactly the
  * single-crash recovery discipline of Compaction.recoverSwap. What this
  * protocol deliberately does NOT attempt is making concurrent appends
  * both succeed: plain-parquet appends are not atomic, so the honest
  * contract is first-writer-wins, second-writer-rejected-loudly
  * (a transaction log — Delta/Iceberg — is the upgrade path).
  */
object IndexCommit {

  private def commitsDir(idx: String) = Paths.get(idx, "commits")

  private def markers(idx: String): Seq[(Long, java.nio.file.Path)] =
    Option(commitsDir(idx).toFile.listFiles()).getOrElse(Array.empty).toSeq
      .flatMap { f =>
        val n = f.getName
        if (n.startsWith("commit-"))
          scala.util.Try(n.stripPrefix("commit-").toLong).toOption.map(_ -> f.toPath)
        else None
      }

  /** Current committed version (0 for a fresh/legacy index). */
  def version(idx: String): Long =
    markers(idx).map(_._1).foldLeft(0L)(math.max)

  /** The version of a claimed-but-never-finalized commit, if any — a
    * writer died mid-append and the data directories may hold a partial
    * batch; the caller's policy is a rebuild. */
  def unfinalized(idx: String): Option[Long] =
    markers(idx).collect {
      case (k, p) if Files.size(p) == 0L => k
    }.sorted.headOption

  /** Atomically claim version `readVersion + 1`. Exactly one of any set
    * of racing writers succeeds; the rest throw
    * ConcurrentModificationException having written NOTHING. */
  def claim(idx: String, readVersion: Long): Long = {
    Files.createDirectories(commitsDir(idx))
    val next = readVersion + 1
    try {
      Files.createFile(commitsDir(idx).resolve(s"commit-$next"))
      next
    } catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new java.util.ConcurrentModificationException(
          s"index $idx: version $next was claimed by another writer " +
            s"(this writer read stale version $readVersion); re-read and retry")
    }
  }

  /** Mark a claimed version's data as fully written. `note` rides in the
    * marker (e.g. a streaming batch id) so replayed work can recognize
    * itself — see [[committedNotes]]. */
  def finalizeCommit(idx: String, version: Long, note: String = ""): Unit =
    Files.write(commitsDir(idx).resolve(s"commit-$version"),
      (if (note.isEmpty) "done" else s"done $note").getBytes("UTF-8"),
      StandardOpenOption.WRITE)

  /** The notes of every finalized commit — the durable record an
    * at-least-once caller (foreachBatch under retries) consults to make
    * its append idempotent: a batch whose note is already here was fully
    * committed by a previous attempt and must not append again. */
  def committedNotes(idx: String): Set[String] =
    markers(idx).flatMap { case (_, p) =>
      val txt = new String(Files.readAllBytes(p), "UTF-8")
      if (txt.startsWith("done ")) Some(txt.stripPrefix("done ")) else None
    }.toSet

  /** Record, immediately after [[claim]] and BEFORE any data write, the
    * exact file population of the index's data roots — the rollback
    * manifest. A janitor ([[cleanPartial]]) can then undo a crashed
    * writer's partial batch by deleting every file NOT in the snapshot:
    * parquet appends only ever ADD uniquely-named part files, so
    * "present but not in the snapshot" identifies the batch exactly.
    * The manifest rides next to the claim marker, so its existence is
    * scoped to this commit attempt. */
  def stage(idx: String, version: Long, roots: Seq[String]): Unit = {
    val base = Paths.get(idx)
    val listing = roots.flatMap { r =>
      val root = base.resolve(r)
      if (Files.isDirectory(root)) {
        val s = Files.walk(root)
        try s.iterator().asScala.filter(Files.isRegularFile(_))
          .map(p => base.relativize(p).toString).toVector
        finally s.close()
      } else Vector.empty
    }
    val lines: java.util.List[String] =
      (s"roots\t${roots.mkString("\t")}" +: listing).asJava
    Files.write(commitsDir(idx).resolve(s"commit-$version.staged"), lines,
      java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Roll back a crashed writer's partial batch using its staged
    * manifest: delete every file under the manifest's roots that is not
    * in the pre-append snapshot (including Spark `_temporary` leftovers
    * and freshly-created partition directories, removed once empty),
    * then retire the claim marker — the index returns to its last
    * committed state and appends unblock. Returns (version, files
    * deleted); None when there is nothing to clean OR the unfinalized
    * claim predates the manifest protocol (no `.staged` file — the only
    * safe policy there remains a rebuild, since nothing records what the
    * dead writer touched). Callers must ensure the claimed writer is
    * actually dead (an operator decision, same as the rebuild lever):
    * cleaning under a live, slow writer would corrupt its in-flight
    * batch. */
  def cleanPartial(idx: String): Option[(Long, Long)] =
    unfinalized(idx).flatMap { k =>
      val mf = commitsDir(idx).resolve(s"commit-$k.staged")
      if (!Files.exists(mf)) None
      else {
        val lines = Files.readAllLines(mf).asScala
        val roots = lines.head.split("\t", -1).drop(1).toSeq.filter(_.nonEmpty)
        val keep = lines.tail.toSet
        val base = Paths.get(idx)
        var deleted = 0L
        roots.foreach { r =>
          val root = base.resolve(r)
          if (Files.isDirectory(root)) {
            val s = Files.walk(root)
            // deepest-first so files empty their dirs before the dir visit
            val all = try s.iterator().asScala.toVector.sortBy(-_.getNameCount)
              finally s.close()
            all.foreach { p =>
              if (Files.isRegularFile(p) &&
                  !keep.contains(base.relativize(p).toString)) {
                Files.delete(p); deleted += 1
              } else if (Files.isDirectory(p) && p != root) {
                val ls = Files.list(p)
                val empty = try !ls.iterator().hasNext finally ls.close()
                if (empty) Files.delete(p) // batch-introduced partition dir
              }
            }
          }
        }
        // marker FIRST: a janitor crash between the deletes then leaves an
        // inert orphan manifest (unfinalized() keys off markers, and the
        // next stage() of a re-claimed version truncate-overwrites it) —
        // the reverse order would strand a manifest-less claim that only a
        // full rebuild could clear, after the data was already recovered
        Files.delete(commitsDir(idx).resolve(s"commit-$k"))
        Files.deleteIfExists(mf)
        Some((k, deleted))
      }
    }

  /** Reset the history to one finalized version — what a full (re)build
    * does: the rebuild overwrote every data directory, so prior claims,
    * finalized or orphaned, are history. `note` tags the rebuild commit
    * (streaming bootstrap batches use it for replay detection). */
  def reset(idx: String, note: String = ""): Unit = {
    markers(idx).foreach(m => Files.deleteIfExists(m._2))
    Files.createDirectories(commitsDir(idx))
    Files.write(commitsDir(idx).resolve("commit-1"),
      (if (note.isEmpty) "done" else s"done $note").getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.WRITE)
  }
}
