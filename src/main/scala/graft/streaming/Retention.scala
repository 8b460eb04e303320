package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}

/** Generation retention — the VACUUM / `expire_snapshots` side of the
  * generation protocol. Every persisted table in this package keeps a
  * full `gen=N` timeline for time travel and crash safety; under
  * continuous CDC ingest that timeline grows one generation per batch
  * FOREVER (compaction bounds the current snapshot's read fan-out, not
  * the historical tree), so a long-running 100 TB table needs the
  * weekly lakehouse janitor operation: expire generations older than a
  * horizon, reclaim their bytes, and make past-horizon time travel fail
  * LOUDLY instead of wrong.
  *
  * Protocol — two-phase mark-then-sweep over tiny CAS-published
  * retention records (`dir/retention/<idx>`, whole-or-absent via
  * temp-file + rename-if-absent, the [[CdcCommits]] discipline):
  *
  *  1. MARK: a vacuum pass raises the retention FLOOR (lowest readable
  *     generation) and records the newly-expired units as PENDING. New
  *     reads below the floor refuse immediately (deterministic), but
  *     the marked directories stay on disk.
  *  2. SWEEP: the NEXT vacuum pass physically deletes what an earlier
  *     pass marked. A reader that planned its scan before the mark —
  *     the manifest was read, the file list is fixed — therefore
  *     survives at least one full janitor cycle (the grace window);
  *     on local FS/HDFS open handles survive the delete itself too.
  *
  * Racing janitors are idempotent by construction: the record publish
  * is a rename-if-absent CAS, a loser simply accepts the winner's
  * (equivalent) floor, each pass sweeps only what it saw pending at
  * LOAD time (never what a racing winner just marked — that would
  * collapse the grace window), and double-deleting an already-swept
  * directory is a no-op.
  */
private[graft] object Retention {

  /** Latest retention state: record index, the floor (lowest readable
    * generation; 0 when never vacuumed), and the units marked by that
    * record awaiting sweep (paths relative to the table root). */
  final case class State(idx: Long, floor: Int, pending: Seq[String])

  val Fresh: State = State(-1L, 0, Nil)

  def load(fs: FileSystem, root: String): State = {
    val p = new Path(s"$root/retention")
    if (!fs.exists(p)) Fresh
    else fs.listStatus(p).toSeq
      .filter(s => !s.isDirectory && s.getPath.getName.forall(_.isDigit))
      .sortBy(-_.getPath.getName.toLong)
      .iterator.flatMap { s =>
        try {
          val in = fs.open(s.getPath)
          val bytes = try {
            val out = new java.io.ByteArrayOutputStream()
            org.apache.hadoop.io.IOUtils.copyBytes(in, out, 4096, false)
            out.toByteArray
          } finally in.close()
          val lines = new String(bytes, "UTF-8").split("\n").toSeq
            .map(_.trim).filter(_.nonEmpty)
          lines.headOption.flatMap(_.toIntOption).map(f =>
            State(s.getPath.getName.toLong, f, lines.tail))
        } catch { case _: Exception => None } // torn: previous record wins
      }.nextOption().getOrElse(Fresh)
  }

  /** Rename-if-absent CAS at `retention/<idx>`: false = a racing
    * janitor published this index first (accept its state). */
  def tryPublish(fs: FileSystem, root: String, st: State): Boolean = {
    val dir = new Path(s"$root/retention")
    if (!fs.exists(dir)) fs.mkdirs(dir)
    val tmp = new Path(dir, s".${st.idx}.tmp")
    val out = fs.create(tmp, true)
    try out.write((st.floor.toString +: st.pending).mkString("\n")
      .getBytes("UTF-8"))
    finally out.close()
    val dst = new Path(dir, st.idx.toString)
    if (fs.rename(tmp, dst)) true
    else { fs.delete(tmp, false); false }
  }

  def floorOf(fs: FileSystem, root: String): Int = load(fs, root).floor

  /** Vacuum a FLAT `gen=N` tree (CdcTable / KmvRollupTable /
    * HllRollupTable): retain the newest `retainLast` generations,
    * mark the rest, sweep what a previous pass marked. Returns the
    * new floor. */
  def vacuumFlat(fs: FileSystem, root: String, gen: Int,
      retainLast: Int): Int = {
    require(retainLast >= 1, s"retainLast $retainLast must be >= 1")
    val st = load(fs, root)
    st.pending.foreach(p => fs.delete(new Path(root, p), true))
    val floorNew = math.max(st.floor, math.max(gen - retainLast + 1, 0))
    val newly = (st.floor until floorNew).map(g => s"gen=$g")
    if (newly.nonEmpty || st.pending.nonEmpty) {
      if (!tryPublish(fs, root, State(st.idx + 1, floorNew, newly)))
        return load(fs, root).floor // racing janitor advanced: accept
    }
    floorNew
  }

  /** Generic mark-then-sweep for index trees whose expired units are
    * arbitrary root-relative paths with no numeric floor — the
    * incremental index family (HammingIndex / InvertedIndex / IvfIndex
    * / StreamingDedup), where shadowing is STRUCTURAL (the newest
    * committed fold covers everything below its boundary) rather than
    * a generation floor. Sweep what a previous pass marked, mark
    * `newly` for the NEXT pass: a reader that planned its scan against
    * the pre-fold tree keeps its files for one full janitor cycle,
    * exactly the [[vacuumFlat]] grace contract. The record floor field
    * is carried through unchanged (these trees don't use it). Racing
    * janitors are idempotent: the publish is a CAS, a loser's marks are
    * re-derived next pass from the directory listing (still-live dirs
    * re-mark; swept ones no longer list). */
  def markSweepUnits(fs: FileSystem, root: String,
      newly: Seq[String]): Unit = {
    val st = load(fs, root)
    st.pending.foreach(p => fs.delete(new Path(root, p), true))
    val fresh = newly.filterNot(st.pending.contains).distinct
    if (fresh.nonEmpty || st.pending.nonEmpty) {
      // loser of the CAS: accept the winner's record — our fresh marks
      // re-surface on the next pass (the directories still exist)
      tryPublish(fs, root, State(st.idx + 1, st.floor, fresh))
      ()
    }
  }

  /** Keep only the newest `keep` commit-record files under
    * `root/commits` — recovery reads the latest record only, but a
    * forever-running ingester otherwise accumulates one tiny file per
    * batch until LISTING the directory dominates recovery cost. */
  def pruneCommitRecords(fs: FileSystem, commitsRoot: String,
      keep: Int): Unit = {
    val p = new Path(commitsRoot)
    if (fs.exists(p)) {
      val recs = fs.listStatus(p).toSeq
        .filter(s => !s.isDirectory && s.getPath.getName.forall(_.isDigit))
        .sortBy(-_.getPath.getName.toLong)
      recs.drop(math.max(keep, 1)).foreach(s => fs.delete(s.getPath, false))
    }
  }
}
