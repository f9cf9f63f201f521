package graft.core

import org.apache.hadoop.fs.{FileSystem, Path}

/** Directory-artifact maintenance shared by the index compactors
  * (serving codes, dedup bands) — the backup-rename swap discipline
  * of `IdMapStore.swapIn`, factored out so every compactor gets the
  * SAME safety:
  *
  *  - a stale `<live>__prev` from a previously crashed swap is
  *    deleted up front (without this, a rename onto an existing
  *    directory silently nests the new data INSIDE the old one —
  *    Hadoop rename-into-existing-dir semantics — and the index is
  *    corrupted while the call reports success);
  *  - every rename's return value is checked and a failure raises
  *    rather than continuing into the destructive tail.
  *
  * Crash windows, stated honestly: a crash BETWEEN the two renames
  * leaves only `<live>__prev` on disk (no `<live>`) — the next
  * [[swapIn]] self-heals by renaming the backup back before starting
  * (so a re-run of the interrupted compactor just works); a crash
  * after publish leaves a stale backup the next swap clears. Readers
  * here do not auto-fall-back to the backup (IdMapStore's resolve
  * does, because its store is read on every CLI invocation; the
  * index compactors are operator-invoked maintenance where a loud
  * missing-directory error is preferable to silently serving the
  * pre-compact state).
  */
object Artifacts {

  /** Publish `staging` as `live`, retiring any existing `live` to
    * `<live>__prev` and reclaiming the backup on success.
    */
  /** Self-heal a crash between [[swapIn]]'s two renames: `live`
    * missing but `<live>__prev` present means the old swap retired
    * the live directory and died before publishing — restore the
    * backup so the caller's read (and a re-run of the interrupted
    * compactor) just works. Compactors call this BEFORE reading the
    * live relation; a healthy directory is a no-op.
    */
  def heal(fs: FileSystem, live: String): Unit = {
    val liveP = new Path(live)
    val prevP = new Path(live + "__prev")
    if (!fs.exists(liveP) && fs.exists(prevP)
        && !fs.rename(prevP, liveP))
      sys.error(s"Artifacts: failed to restore $prevP -> $live")
  }

  /** Roll-forward half of a loop batch transaction: idempotently move
    * every staged leaf file under `src` into `destRoot`, preserving
    * relative subdirectories (parquet partition dirs like `cent_id=N`
    * ride along) and prefixing each file name with `tag` so batches
    * never collide. Callable any number of times — the staged tree is
    * frozen by its atomic publish rename before this runs, so names
    * are stable across retries: a file already moved no longer exists
    * under `src`, a destination that already exists is skipped, and a
    * crash mid-walk resumes with the remaining files. Underscore/dot
    * entries (`_SUCCESS`, checksums) are dropped, matching what a
    * parquet read would ignore anyway.
    */
  def publishTree(fs: FileSystem, src: String, destRoot: String,
      tag: String): Unit = {
    val srcP = new Path(src)
    if (!fs.exists(srcP)) return
    def walk(p: Path, rel: String): Unit =
      fs.listStatus(p).foreach { st =>
        val name = st.getPath.getName
        if (!name.startsWith("_") && !name.startsWith(".")) {
          if (st.isDirectory) walk(st.getPath, s"$rel$name/")
          else {
            val destDir =
              if (rel.isEmpty) new Path(destRoot)
              else new Path(destRoot, rel)
            if (!fs.exists(destDir)) fs.mkdirs(destDir)
            val dest = new Path(destDir, s"${tag}_$name")
            if (!fs.exists(dest) && !fs.rename(st.getPath, dest))
              sys.error(s"Artifacts: failed to publish ${st.getPath} -> $dest")
          }
        }
      }
    walk(srcP, "")
  }

  def swapIn(fs: FileSystem, staging: String, live: String): Unit = {
    val stagingP = new Path(staging)
    val liveP = new Path(live)
    val prevP = new Path(live + "__prev")
    // Defense in depth: the same mid-swap crash can also be healed
    // here (callers that derived staging from an already-read live
    // state reach this with live absent only after such a crash).
    heal(fs, live)
    fs.delete(prevP, true)
    if (fs.exists(liveP) && !fs.rename(liveP, prevP))
      sys.error(s"Artifacts: failed to retire $live")
    if (!fs.rename(stagingP, liveP))
      sys.error(s"Artifacts: failed to publish $staging -> $live")
    fs.delete(prevP, true)
  }
}
