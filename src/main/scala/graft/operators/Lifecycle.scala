package graft.operators

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Storage lifecycle for operators that materialize intermediates.
  *
  * The problem this solves: an operator whose plan consumes a
  * corpus-scale intermediate more than once must materialize it, but
  * every in-session mechanism pins storage past the operator's life —
  * `persist()` registers in the CacheManager, which holds a strong
  * reference until an explicit `unpersist()` that a lazy-returning
  * operator has no place to call (observed as round-3's q65 "Asked to
  * cache already cached data" cross-run contamination), and
  * `localCheckpoint()` blocks are in principle freed by the
  * ContextCleaner on GC but in practice are not (measured in this JVM:
  * dropped checkpoint RDDs survive repeated full GCs indefinitely —
  * the RDD object stays strongly reachable; see CheckpointGcScratch).
  *
  * The design here is what a 100 TB pipeline does anyway: materialize
  * stage outputs AS TABLES. [[materializeToScratch]] writes the frame
  * to a scratch path as parquet and returns a clean scan of it — zero
  * pinned executor storage, lineage truncated, and the intermediate is
  * inspectable/resumable on disk. The scratch root is
  * `spark.conf "graft.scratch.dir"` — set it to a shared filesystem
  * (HDFS/S3) on a real cluster; unset, it defaults to a per-application
  * java.io.tmpdir subtree deleted on JVM exit (correct for local[*],
  * where driver and executors share a machine).
  *
  * [[releaseLocalCheckpoint]] complements it for ITERATIVE operators
  * (closure, components): rounds still use fast `localCheckpoint()` for
  * lineage truncation, and the operator frees every round's blocks
  * explicitly once the final result is materialized — deterministic
  * cleanup instead of hoping the GC-driven cleaner fires.
  */
private[graft] object Lifecycle {

  /** The private[sql] surface the release paths reflect on, asserted
    * resolvable AT CLASS LOAD so a Spark upgrade that moves or renames
    * any of it fails loudly here — with a message naming the member —
    * instead of silently never matching `getSimpleName` and leaking
    * every intermediate. */
  private val reflectedSurface: Seq[(String, String)] = Seq(
    ("org.apache.spark.sql.execution.LogicalRDD", "rdd"),
    ("org.apache.spark.sql.execution.datasources.LogicalRelation", "relation"),
    ("org.apache.spark.sql.execution.datasources.HadoopFsRelation", "location"),
    ("org.apache.spark.sql.execution.datasources.FileIndex", "rootPaths"))
  private[graft] def assertReflectedSurface(): Unit =
    reflectedSurface.foreach { case (cls, method) =>
      val ok = try Class.forName(cls).getMethods.exists(_.getName == method)
        catch { case _: ClassNotFoundException => false }
      require(ok, s"graft Lifecycle: $cls.$method no longer resolves — " +
        "the bundled Spark version moved the reflected storage-release " +
        "surface; update Lifecycle.release/releaseLocalCheckpoint")
    }
  assertReflectedSurface()

  private val counter = new java.util.concurrent.atomic.AtomicLong(0)
  private val cleanupRegistered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Scratch root: `graft.scratch.dir` conf namespaced by the Spark
    * applicationId (two concurrent or restarted applications sharing
    * one configured root must not clobber each other's scratch-table
    * numbering), else a per-application tmpdir subtree (registered for
    * recursive delete at JVM exit). */
  def scratchRoot(spark: SparkSession): String = {
    val conf = spark.conf.get("graft.scratch.dir", "")
    if (conf.nonEmpty)
      s"${conf.stripSuffix("/")}/${spark.sparkContext.applicationId}"
    else {
      val root = Paths.get(System.getProperty("java.io.tmpdir"),
        s"graft-scratch-${spark.sparkContext.applicationId}").toString
      if (cleanupRegistered.add(root))
        Runtime.getRuntime.addShutdownHook(new Thread(() =>
          try deleteRecursively(Paths.get(root)) catch { case _: Throwable => () }))
      root
    }
  }

  private[graft] def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
      finally walk.close()
    }

  /** Liveness marker: `<namespace>/_graft_alive`, touched (mtime
    * refreshed) on every materialize. [[pruneScratch]] skips a whole
    * namespace while its heartbeat is fresh, so another application's
    * janitor can never delete a LIVE application's in-flight
    * intermediate out from under it no matter how short the caller's
    * TTL — a crashed app's heartbeat goes stale and normal TTL pruning
    * resumes. */
  private[graft] val HeartbeatName = "_graft_alive"

  private def touchHeartbeat(spark: SparkSession): Unit = {
    val conf = spark.conf.get("graft.scratch.dir", "")
    if (conf.nonEmpty) {
      val hb = new org.apache.hadoop.fs.Path(
        s"${scratchRoot(spark)}/$HeartbeatName")
      // create(overwrite=true) rewrites the 0-byte file, refreshing its
      // FILE mtime — real on object stores, unlike directory statuses.
      // RAW fs on checksummed schemes: a `.crc` sidecar next to the
      // marker would read as foreign content in the stale-namespace
      // sweep (and checksumming a 0-byte liveness marker buys nothing).
      val fs = hb.getFileSystem(spark.sessionState.newHadoopConf()) match {
        case c: org.apache.hadoop.fs.ChecksumFileSystem => c.getRawFileSystem
        case f => f
      }
      try fs.create(hb, true).close() catch { case _: java.io.IOException => () }
    }
  }

  /** Runs `df`'s job now, storing the result as a scratch parquet
    * table, and returns a plain scan of that table: no pinned blocks,
    * no lineage, no CacheManager entry. */
  def materializeToScratch(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    touchHeartbeat(spark)
    val path = s"${scratchRoot(spark)}/m${counter.incrementAndGet()}"
    df.write.mode("overwrite").parquet(path)
    spark.read.parquet(path)
  }

  /** [[materializeToScratch]] `out`, then unpersist the pinned
    * `intermediates` the plan consumed. */
  def materializeThenRelease(out: DataFrame, intermediates: DataFrame*): DataFrame = {
    val m = materializeToScratch(out)
    intermediates.foreach(_.unpersist(blocking = false))
    m
  }

  /** Frees the storage blocks behind every localCheckpoint scan in
    * `df`'s plan. Call ONLY when the checkpointed data is no longer
    * reachable from any live plan (i.e. after the final result has
    * been materialized elsewhere). Reflection because LogicalRDD is
    * private[sql]; its `rdd` accessor is public at the JVM level. */
  def releaseLocalCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach { p =>
      if (p.getClass.getSimpleName == "LogicalRDD")
        p.getClass.getMethod("rdd").invoke(p)
          .asInstanceOf[org.apache.spark.rdd.RDD[_]]
          .unpersist(blocking = false)
    }

  /** Deletes the scratch tables behind `dfs`' plans (file scans whose
    * root lives under [[scratchRoot]]; scans elsewhere are untouched).
    * The DISK side of the lifecycle contract: eager operators return
    * scans over scratch parquet, which otherwise lives until JVM exit
    * (local default) or forever (caller-owned `graft.scratch.dir`) — a
    * long-lived service calls this once a result is consumed, exactly
    * as it would unpersist a cached frame. The frame is unusable
    * afterwards. */
  def release(dfs: DataFrame*): Unit =
    dfs.foreach { df =>
      val spark = df.sparkSession
      val hconf = spark.sessionState.newHadoopConf()
      val rootPath = new org.apache.hadoop.fs.Path(scratchRoot(spark))
      val root = rootPath.getFileSystem(hconf).makeQualified(rootPath)
      df.queryExecution.analyzed.foreach { p =>
        if (p.getClass.getSimpleName == "LogicalRelation") {
          val rel = p.getClass.getMethod("relation").invoke(p)
          if (rel.getClass.getSimpleName == "HadoopFsRelation") {
            val loc = rel.getClass.getMethod("location").invoke(rel)
            loc.getClass.getMethod("rootPaths").invoke(loc)
              .asInstanceOf[Seq[org.apache.hadoop.fs.Path]]
              .foreach { hp =>
                // delete via the Hadoop FileSystem of the path, so an
                // HDFS/S3 scratch root releases the same as a local one
                val fs = hp.getFileSystem(hconf)
                val q = fs.makeQualified(hp)
                if (isUnder(q, root)) fs.delete(q, true)
              }
          }
        }
      }
    }

  private def isUnder(p: org.apache.hadoop.fs.Path,
      root: org.apache.hadoop.fs.Path): Boolean =
    p == root || p.toString.startsWith(root.toString.stripSuffix("/") + "/")

  /** Whether `path` would be reclaimed by [[release]] — i.e. its
    * FS-qualified form lives under [[scratchRoot]]. Durable outputs
    * (dedup indexes, corpus dirs) must NOT be placed there; callers
    * use this to fail loudly instead of silently losing data. */
  def isUnderScratchRoot(spark: SparkSession, path: String): Boolean = {
    val hconf = spark.sessionState.newHadoopConf()
    val rootPath = new org.apache.hadoop.fs.Path(scratchRoot(spark))
    val root = rootPath.getFileSystem(hconf).makeQualified(rootPath)
    val p = new org.apache.hadoop.fs.Path(path)
    isUnder(p.getFileSystem(hconf).makeQualified(p), root)
  }

  /** Retention policy for the scratch root: delete scratch tables older
    * than `ttlMillis`, then — oldest first — until the total size is
    * under `maxBytes`. The TTL/size hook for a long-lived service whose
    * caller-owned `graft.scratch.dir` would otherwise grow without
    * bound (the tmpdir default already deletes at JVM exit).
    *
    * Call when quiescent, or with a TTL comfortably above the longest
    * operator's lifetime: a scratch table is unreferenced the moment
    * every frame scanning it is dropped, but this method cannot see
    * live frames — it prunes by age, exactly like a shared-cluster
    * scratch janitor. Goes through the Hadoop FileSystem, so it works
    * on any scheme. */
  /** Scratch tables are always named `m<N>` ([[materializeToScratch]]'s
    * counter); the janitor touches ONLY such entries, so a shared root
    * holding other tools' content is safe. */
  private val ScratchTableName = "^m\\d+$".r

  /** Spark applicationId shapes across cluster managers (local, YARN,
    * standalone, k8s/connect UUID-suffixed). Only namespaces matching
    * one of these are graft's to sweep when empty — an empty dir some
    * OTHER tool put under a shared scratch root is not ours to delete. */
  private val AppIdName =
    "^(local-\\d+|application_\\d+_\\d+|app-\\d{14}-\\d{4}|spark-[0-9a-zA-Z-]+)$".r

  /** Table age for expiry decisions: the newest FILE mtime under the
    * table (one recursive listing). Directory statuses are synthetic on
    * object stores (mtime 0 or listing-time depending on store/version),
    * which would read as "everything instantly expired" or "nothing
    * ever expires"; file mtimes are real everywhere. A file-less dir
    * (crashed before the first part file) falls back to the directory
    * status, guarded so a synthetic 0 reads as fresh — an empty dir is
    * litter but deleting live data is worse. */
  private def newestFileMtime(fs: org.apache.hadoop.fs.FileSystem,
      st: org.apache.hadoop.fs.FileStatus): Long = {
    var newest = 0L
    val it = fs.listFiles(st.getPath, true)
    while (it.hasNext) newest = math.max(newest, it.next().getModificationTime)
    if (newest > 0) newest
    else if (st.getModificationTime > 0) st.getModificationTime
    else Long.MaxValue // synthetic status + no files: treat as fresh
  }

  def pruneScratch(spark: SparkSession, ttlMillis: Long,
      maxBytes: Long = Long.MaxValue,
      sizeCapMinAgeMillis: Long = 15 * 60 * 1000L,
      heartbeatTtlMillis: Long = 60 * 60 * 1000L): Unit = {
    val hconf = spark.sessionState.newHadoopConf()
    // janitor scope: for a caller-owned `graft.scratch.dir` prune the
    // CONFIGURED root — scratch tables of every application (the appId
    // namespacing means previous/crashed runs leave subtrees the
    // current app's own root would never see, and "grows without
    // bound" is exactly what this method exists to prevent). TTL is
    // the live-data guard, same as any shared-cluster scratch janitor.
    // The tmpdir default stays per-app (each run registers its own
    // exit cleanup).
    val conf = spark.conf.get("graft.scratch.dir", "")
    val rootPath = new org.apache.hadoop.fs.Path(
      if (conf.nonEmpty) conf else scratchRoot(spark))
    val fs = rootPath.getFileSystem(hconf)
    if (!fs.exists(rootPath)) return
    val now = System.currentTimeMillis()
    // entries = scratch tables: <root>/<appId>/m<N> for the configured
    // layout, <root>/m<N> for the tmpdir default — plus LEGACY
    // pre-namespacing tables directly under a configured root, which
    // would otherwise be permanent litter. Only m<N>-named dirs are
    // graft's to delete. ANOTHER application's namespace with a fresh
    // `_graft_alive` heartbeat (touched on every materialize) is a
    // LIVE application's: skipped wholesale, whatever the caller's TTL
    // — so no janitor can delete a live app's in-flight intermediate.
    // The janitor's OWN namespace is still pruned by TTL (the app
    // chose its TTL knowing its own operators' lifetimes).
    val ownId = spark.sparkContext.applicationId
    val entries = fs.listStatus(rootPath).toSeq.flatMap { st =>
      val name = st.getPath.getName
      if (conf.nonEmpty && st.isDirectory && !ScratchTableName.matches(name)) {
        val children = fs.listStatus(st.getPath).toSeq
        val hbFresh = name != ownId && children.exists(c =>
          c.getPath.getName == HeartbeatName &&
            now - c.getModificationTime <= heartbeatTtlMillis)
        if (hbFresh) Seq.empty else children
      } else Seq(st)
    }.filter(st => st.isDirectory &&
        ScratchTableName.matches(st.getPath.getName))
      .map(st => (st.getPath, newestFileMtime(fs, st)))
    val (expired, kept) = entries.partition {
      case (_, mtime) => now - mtime > ttlMillis
    }
    expired.foreach { case (p, _) => fs.delete(p, true) }
    // sizes are a full recursive stat per table (expensive on object
    // stores) — only computed when a size cap is actually set. The cap
    // pass never touches tables younger than `sizeCapMinAgeMillis`:
    // with the cross-app scope, a seconds-old table may be another
    // live application's in-flight intermediate.
    if (maxBytes < Long.MaxValue) {
      val sized = kept.map { case (p, mtime) =>
        (p, mtime, fs.getContentSummary(p).getLength) }
      var total = sized.map(_._3).sum
      sized.sortBy(_._2).foreach { case (p, mtime, bytes) =>
        if (total > maxBytes && now - mtime > sizeCapMinAgeMillis) {
          fs.delete(p, true); total -= bytes
        }
      }
    }
    // appId namespaces left empty (or holding only a stale heartbeat)
    // after table pruning are litter — but ONLY dirs named like a Spark
    // applicationId are graft's to sweep; other tools' empty dirs under
    // a shared root stay. NON-recursive table-less delete: it fails
    // (harmlessly) if a concurrently starting application just wrote
    // its first table between the check and the delete — a recursive
    // delete here would race and destroy live data.
    if (conf.nonEmpty)
      fs.listStatus(rootPath).toSeq.foreach { st =>
        if (st.isDirectory && AppIdName.matches(st.getPath.getName)) {
          val children = fs.listStatus(st.getPath).toSeq
          val onlyStaleHb = children.forall(c =>
            c.getPath.getName == HeartbeatName &&
              now - c.getModificationTime > heartbeatTtlMillis)
          if (children.isEmpty)
            try fs.delete(st.getPath, false)
            catch { case _: java.io.IOException => () }
          else if (children.nonEmpty && onlyStaleHb) {
            // stale heartbeat is the only content: the app is dead and
            // its tables are gone; remove marker then the empty dir
            children.foreach(c => fs.delete(c.getPath, false))
            try fs.delete(st.getPath, false)
            catch { case _: java.io.IOException => () }
          }
        }
      }
  }
}
