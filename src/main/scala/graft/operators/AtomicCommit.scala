package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** A concurrent writer lost the publication race (or one is in
  * flight). The table/index state on disk is the OTHER writer's —
  * consistent, just not yours. Callers either reload-and-retry
  * (content-independent publishes) or surface this to the operator
  * that must recompute against the new committed state. */
final class ConcurrentWriteException(msg: String)
  extends RuntimeException(msg)

/** Conditional publication — the rename-if-absent CAS that turns the
  * generation protocol's "second pointer swap silently wins" race into
  * a detected loss. Every persisted table in this repo publishes
  * write-new-then-flip: data lands in a fresh directory and the flip
  * is the directory (or meta/manifest) appearing under its final
  * generation-numbered name. Before this helper the flip was
  * `mode("overwrite")` straight onto the final path, so two writers
  * racing the same generation number both "succeeded" and the second
  * silently clobbered the first. Now the attempt is written to a
  * HIDDEN sibling (dot-prefixed — invisible to every parquet reader
  * and `gen=`-listing) and published by rename, which the filesystem
  * arbitrates: exactly one attempt becomes the destination, and the
  * loser DETECTS it.
  *
  * Verification, not hope: Hadoop's rename-onto-existing-directory
  * semantics differ by filesystem (HDFS refuses; the local FS may move
  * the source INSIDE the destination), so winning is verified by the
  * writer's own marker file being present directly under the
  * destination — a nested lost attempt is detected and cleaned up.
  *
  * Contracts and limits (document-level, same spirit as the crash
  * notes on each table):
  *  - HDFS/local: rename is atomic; the CAS holds.
  *  - Object stores without atomic rename (S3 without a committer):
  *    the CAS degrades to best-effort detection — run SINGLE-WRITER
  *    there, exactly as every transactional table format also requires
  *    (their LOG commit is the same rename-if-absent primitive).
  *  - A TORN destination (crashed writer: directory without a commit
  *    marker) is reclaimed by the next attempt — via rename-ASIDE, so
  *    two live writers re-racing a crashed writer's generation cannot
  *    double-win: the slower one moves the faster one's just-committed
  *    dst to its private tomb, DETECTS the commit marker there, restores
  *    it and loses. Committed data is never deleted on the reclaim path;
  *    the only residual (a three-writer race on one torn generation,
  *    restore finding dst re-occupied) leaves the committed content
  *    parked in a hidden tomb rather than destroyed — and throws
  *    [[ConcurrentWriteException]] naming the tomb, because two writers
  *    have then both observed a successful publish for one generation
  *    and arbitration is ambiguous.
  */
object AtomicCommit {

  /** Commit markers accepted as "this directory is a finished write":
    * Spark's job marker plus [[graft.streaming.StreamingDedup]]'s own
    * (deployments disable `_SUCCESS` on object stores). */
  private val CommitMarkers = Seq("_SUCCESS", "_GRAFT_COMMITTED")

  private def isCommitted(fs: org.apache.hadoop.fs.FileSystem,
      dir: Path): Boolean =
    CommitMarkers.exists(m => fs.exists(new Path(dir, m)))

  /** Write via `write(tmpPath)` into a hidden sibling attempt directory
    * of `dst`, then conditionally publish. Returns true iff THIS
    * writer's attempt became `dst`; false means a concurrent writer's
    * publication won (the attempt is cleaned up). */
  def publishParquet(spark: SparkSession, dst: String)
      (write: String => Unit): Boolean = {
    val dstPath = new Path(dst)
    val fs = dstPath.getFileSystem(spark.sessionState.newHadoopConf())
    val uuid = java.util.UUID.randomUUID().toString
    val tmp = new Path(dstPath.getParent,
      s".attempt-${dstPath.getName}-$uuid")
    write(tmp.toString)
    publishDir(fs, tmp, dstPath, uuid)
  }

  /** The CAS itself: publish the fully-written `tmp` as `dst`.
    * Exactly one concurrent caller per `dst` returns true. */
  def publishDir(fs: org.apache.hadoop.fs.FileSystem, tmp: Path,
      dst: Path, uuid: String): Boolean = {
    val marker = s".graft-writer-$uuid"
    fs.create(new Path(tmp, marker), true).close()
    if (fs.exists(dst)) {
      if (isCommitted(fs, dst)) { fs.delete(tmp, true); return false }
      // Torn leftover of a crashed writer: reclaim. NOT delete-in-place —
      // between the isCommitted check above and a delete, a concurrent
      // writer's rename could have committed dst, and deleting would
      // erase its just-won data (check-to-delete TOCTOU). Instead the
      // dst is renamed ASIDE to a hidden tomb (atomic, moves whatever
      // is there now), re-checked once OFF the racing path: a tomb that
      // turns out committed was a winner we raced — restore it and lose;
      // a torn tomb is provably a crashed writer's (no live writer can
      // touch the uuid'd tomb path) and is safe to drop.
      val tomb = new Path(dst.getParent, s".torn-${dst.getName}-$uuid")
      if (fs.rename(dst, tomb)) {
        if (isCommitted(fs, tomb)) {
          // restore and lose. A failed restore means a THIRD writer took
          // dst in the gap — leave the tomb on disk (committed data is
          // never deleted; a hidden tomb is recoverable, a delete isn't)
          // but REFUSE loudly: two writers have then both seen a true
          // publish for this generation, so arbitration is ambiguous and
          // silence would let both proceed as winners.
          val restored = fs.rename(tomb, dst)
          fs.delete(tmp, true)
          if (!restored && fs.exists(tomb)) {
            throw new ConcurrentWriteException(
              s"AtomicCommit: committed content of $dst was moved aside " +
                s"during torn-destination reclaim and could not be " +
                s"restored (a third writer re-committed the destination " +
                s"in the gap). The original winner's committed data is " +
                s"PARKED at $tomb — recover it before trusting $dst; " +
                s"generation arbitration for this slot is ambiguous.")
          }
          return false
        }
        fs.delete(tomb, true)
      }
      // aside-rename failed: dst vanished or was just replaced — fall
      // through; the rename-if-absent below still arbitrates.
    }
    fs.rename(tmp, dst)
    if (fs.exists(new Path(dst, marker))) true
    else {
      // lost: dst appeared first (rename refused), or local-FS rename
      // moved the attempt INSIDE the winner's dst as a hidden subdir
      val nested = new Path(dst, tmp.getName)
      if (fs.exists(new Path(nested, marker))) fs.delete(nested, true)
      else if (fs.exists(tmp)) fs.delete(tmp, true)
      false
    }
  }
}
