package graft.analytics

import java.io.File
import java.nio.file.Files

/** Crash-safe staged rewrites for the persisted index maintenance ops
  * ([[IvfIndex.purgeTombstones]]/[[IvfIndex.compactLists]],
  * [[Int8Index.purgeTombstones]], [[MinHashBandIndex.purgeTombstones]]).
  *
  * Protocol (local FS; an object store flips a manifest pointer
  * instead):
  *
  *  1. The rewrite lands in a dot-prefixed STAGING dir next to the
  *     target (`.purge-<target>` / `.compact-<target>`) — Spark readers
  *     ignore dot-prefixed paths, so a half-written staging dir is
  *     invisible. Its `_SUCCESS` marker doubles as the commit record.
  *  2. [[swapIn]] snapshots the target's current data files, MOVES the
  *     staged data files in FIRST (part-file names carry task UUIDs —
  *     never colliding with existing names), then deletes the
  *     snapshot and drops the staging dir.
  *  3. [[recover]] runs at the START of every maintenance op: a
  *     leftover staging dir WITH `_SUCCESS` has its remaining files
  *     moved in (completing step 2); one without is discarded (the
  *     target was never touched).
  *
  * Crash-window analysis — why no state is ever lost:
  *  - before `_SUCCESS`: target untouched; recovery discards staging.
  *  - between `_SUCCESS` and the last move: target holds old ∪ some
  *    staged files — DUPLICATES of surviving rows (deleted rows are
  *    still masked: a purge clears its tombstones only after every
  *    swap). Recovery completes the moves; the caller's rewrite is
  *    natural-key-deduplicating, so the next rewrite of that target
  *    converges to the exact row set.
  *  - between the last move and the snapshot delete: same duplicate
  *    state, same convergence.
  * The old delete-then-move order had a window where the data existed
  * ONLY in the (reader-invisible) staging dir; this order never does.
  */
private[analytics] object StagedSwap {

  def rmrf(f: File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(rmrf)); f.delete(); ()
  }

  /** Parquet data files of a dir (skips `_SUCCESS`/`.crc` sidecars). */
  def dataFiles(d: File): Array[File] =
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && !f.getName.startsWith(".") &&
                   !f.getName.startsWith("_"))

  /** Staging dir for `target` under `parent` (dot-prefixed → invisible
    * to Spark readers until swapped in). */
  def stagingFor(parent: File, op: String, targetName: String): File =
    new File(parent, s".$op-$targetName")

  /** Complete (or discard) interrupted swaps under `parent` for the
    * given op prefix. Returns the target names whose swap was
    * COMPLETED from a committed staging dir — callers must force a
    * deduplicating rewrite of those targets (the recovered state may
    * hold old ∪ staged duplicates). */
  def recover(parent: File, op: String): Seq[String] = {
    val prefix = s".$op-"
    Option(parent.listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && d.getName.startsWith(prefix))
      .flatMap { staged =>
        val targetName = staged.getName.stripPrefix(prefix)
        if (new File(staged, "_SUCCESS").exists()) {
          val target = new File(parent, targetName)
          target.mkdirs()
          dataFiles(staged).foreach { f =>
            Files.move(f.toPath, new File(target, f.getName).toPath)
          }
          rmrf(staged)
          Some(targetName)
        } else { rmrf(staged); None }
      }.toSeq
  }

  /** Move the committed staging dir's data files into `target`, then
    * delete the files `target` held before the move. */
  def swapIn(target: File, staged: File): Unit = {
    require(new File(staged, "_SUCCESS").exists(),
      s"staging dir ${staged.getPath} has no _SUCCESS marker")
    target.mkdirs()
    val superseded = dataFiles(target)
    dataFiles(staged).foreach { f =>
      Files.move(f.toPath, new File(target, f.getName).toPath)
    }
    superseded.foreach(_.delete())
    rmrf(staged)
  }
}
