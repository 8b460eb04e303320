package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared covered-boundary fold machinery for the incremental index
  * family ([[IvfIndex]], [[IvfPq]]; [[HammingIndex]] and
  * [[InvertedIndex]] carry bespoke variants of the same contract with
  * their extra per-tree state): an `ingest_batch=N` increment tree is
  * periodically folded into a committed `gen=G` unit, increments
  * strictly below the newest committed fold's number are SHADOWED
  * (served reads skip them even while their directories exist), and the
  * covered directories are reclaimed through
  * [[graft.streaming.Retention.markSweepUnits]] — marked by the fold
  * pass, physically deleted by the NEXT janitor pass, so a reader that
  * planned its scan against the pre-fold tree keeps its files for one
  * full cycle. This is what keeps a forever-maintained index's
  * directory count O(1) instead of one-per-micro-batch (the small-files
  * death at 100 TB) WITHOUT ever deleting a file a planned scan may
  * still read.
  */
private[graft] object GenFold {

  def hfs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sessionState.newHadoopConf())

  /** Numbered subdirectories `<prefix><N>` of `root` — fully-numeric
    * suffixes only (stray litter must not wedge listings). */
  def listNumDirs(fs: FileSystem, root: Path, prefix: String)
      : Seq[(Long, Path)] =
    if (!fs.exists(root)) Nil
    else fs.listStatus(root).toSeq.filter(_.isDirectory).flatMap { s =>
      val name = s.getPath.getName
      val suffix = name.stripPrefix(prefix)
      if (name.startsWith(prefix) && suffix.nonEmpty &&
        suffix.forall(_.isDigit))
        scala.util.Try(suffix.toLong).toOption.map(n => (n, s.getPath))
      else None
    }

  /** Newest COMMITTED fold under `genRoot` (marker-verified — a torn
    * fold from a crashed janitor neither serves nor shadows).
    * Long.MinValue when never folded. */
  def committedBoundary(fs: FileSystem, genRoot: Path)
      : (Long, Option[Path]) =
    listNumDirs(fs, genRoot, "gen=")
      .filter { case (_, p) =>
        Seq("_SUCCESS", "_GRAFT_COMMITTED").exists(m =>
          fs.exists(new Path(p, m)))
      }
      .sortBy(_._1).lastOption
      .map { case (g, p) => (g, Some(p)) }
      .getOrElse((Long.MinValue, None))

  /** The served relation: newest committed fold + the increments it
    * does not cover (the `ingest_batch` partition column is dropped —
    * both legs expose identical schemas; any deeper partition column,
    * e.g. `cluster=`, stays discovered on both). None when the tree is
    * empty. */
  def readCovered(spark: SparkSession, incRoot: String,
      genRoot: String): Option[DataFrame] = {
    val fs = hfs(spark, incRoot)
    val (boundary, genDir) = committedBoundary(fs, new Path(genRoot))
    val live = listNumDirs(fs, new Path(incRoot), "ingest_batch=")
      .filter(_._1 >= boundary)
    val liveDf =
      if (live.isEmpty) None
      else Some(spark.read.option("basePath", incRoot)
        .parquet(live.map(_._2.toString): _*)
        .drop("ingest_batch"))
    val genDf = genDir.map(p => spark.read.parquet(p.toString))
    (genDf, liveDf) match {
      case (Some(g), Some(l)) => Some(g.unionByName(l))
      case (Some(g), None) => Some(g)
      case (None, l) => l
    }
  }

  /** Next free increment id, respecting the fold boundary: covered ids
    * are retention-reclaimed and must never be reissued. */
  def nextBatchId(spark: SparkSession, incRoot: String,
      genRoot: String): Long = {
    val fs = hfs(spark, incRoot)
    val maxInc = listNumDirs(fs, new Path(incRoot), "ingest_batch=")
      .map(_._1).maxOption.map(_ + 1).getOrElse(0L)
    val (boundary, _) = committedBoundary(fs, new Path(genRoot))
    math.max(maxInc, if (boundary == Long.MinValue) 0L else boundary)
  }

  /** Fold the previous committed fold and every increment strictly
    * below `upTo` into one CAS-committed `genRoot/gen=upTo`
    * (partitioned by `partCols`), then MARK the covered directories —
    * root-relative via `relInc`/`relGen` — for the next pass to sweep.
    * A lost CAS against an already-committed identical fold (replay,
    * racing janitor over the same committed sources) proceeds straight
    * to the mark. */
  def compact(spark: SparkSession, tableRoot: String, incRoot: String,
      genRoot: String, relInc: Long => String, relGen: Long => String,
      upTo: Long, partCols: Seq[String]): Unit = {
    require(upTo > 0, s"upTo must be positive, got $upTo")
    val fs = hfs(spark, tableRoot)
    val (boundary, genDir) = committedBoundary(fs, new Path(genRoot))
    val allIncs = listNumDirs(fs, new Path(incRoot), "ingest_batch=")
      .filter(_._1 < upTo)
    val live = allIncs.filter(_._1 >= boundary)
    // a replayed/raced pass whose gen=upTo is already committed must not
    // re-fold — it proceeds straight to the marks (and sweeps an earlier
    // pass's marks on the way)
    val dstCommitted = boundary == upTo ||
      listNumDirs(fs, new Path(genRoot), "gen=")
        .exists { case (g, p) => g == upTo &&
          Seq("_SUCCESS", "_GRAFT_COMMITTED").exists(m =>
            fs.exists(new Path(p, m))) }
    if (!dstCommitted && (genDir.nonEmpty || live.nonEmpty)) {
      val liveDf =
        if (live.isEmpty) None
        else Some(spark.read.option("basePath", incRoot)
          .parquet(live.map(_._2.toString): _*)
          .drop("ingest_batch"))
      val folded = (genDir.map(p => spark.read.parquet(p.toString)).toSeq
        ++ liveDf.toSeq).reduce(_ unionByName _)
      val dst = s"$genRoot/gen=$upTo"
      val won = AtomicCommit.publishParquet(spark, dst) { tmp =>
        val w = folded.write.mode("overwrite")
        (if (partCols.isEmpty) w else w.partitionBy(partCols: _*))
          .parquet(tmp)
        fs.create(new Path(tmp, "_GRAFT_COMMITTED"), true).close()
      }
      if (!won && !Seq("_SUCCESS", "_GRAFT_COMMITTED").exists(m =>
          fs.exists(new Path(s"$dst/$m"))))
        throw new ConcurrentWriteException(
          s"GenFold.compact: gen=$upTo at $genRoot lost its publish and " +
            "the destination is not committed")
    }
    if (dstCommitted || genDir.nonEmpty || live.nonEmpty)
      graft.streaming.Retention.markSweepUnits(fs, tableRoot,
        allIncs.map { case (n, _) => relInc(n) } ++
          listNumDirs(fs, new Path(genRoot), "gen=")
            .filter(_._1 < upTo).map { case (g, _) => relGen(g) })
  }

  /** Sweep whatever an earlier [[compact]] marked without folding
    * anything new — the janitor tick for a quiescent index. */
  def vacuum(spark: SparkSession, tableRoot: String): Unit =
    graft.streaming.Retention.markSweepUnits(
      hfs(spark, tableRoot), tableRoot, Nil)

  /** Reset the fold + retention state of a rebuilt tree (build() wipes
    * increments; stale folds and marks of the previous index must die
    * with them). */
  def resetTrees(spark: SparkSession, tableRoot: String,
      genRoot: String): Unit = {
    val fs = hfs(spark, tableRoot)
    Seq(genRoot, s"$tableRoot/retention").foreach { p =>
      val hp = new Path(p)
      if (fs.exists(hp)) fs.delete(hp, true)
    }
  }
}
