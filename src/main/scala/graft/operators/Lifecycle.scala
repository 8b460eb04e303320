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

  private val counter = new java.util.concurrent.atomic.AtomicLong(0)
  private val cleanupRegistered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Scratch root: `graft.scratch.dir` conf, else a per-application
    * tmpdir subtree (registered for recursive delete at JVM exit). */
  def scratchRoot(spark: SparkSession): String = {
    val conf = spark.conf.get("graft.scratch.dir", "")
    if (conf.nonEmpty) conf
    else {
      val root = Paths.get(System.getProperty("java.io.tmpdir"),
        s"graft-scratch-${spark.sparkContext.applicationId}").toString
      if (cleanupRegistered.add(root))
        Runtime.getRuntime.addShutdownHook(new Thread(() =>
          try deleteRecursively(Paths.get(root)) catch { case _: Throwable => () }))
      root
    }
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))

  /** Runs `df`'s job now, storing the result as a scratch parquet
    * table, and returns a plain scan of that table: no pinned blocks,
    * no lineage, no CacheManager entry. */
  def materializeToScratch(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
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
      val root = Paths.get(scratchRoot(df.sparkSession))
        .toAbsolutePath.normalize
      df.queryExecution.analyzed.foreach { p =>
        if (p.getClass.getSimpleName == "LogicalRelation") {
          val rel = p.getClass.getMethod("relation").invoke(p)
          if (rel.getClass.getSimpleName == "HadoopFsRelation") {
            val loc = rel.getClass.getMethod("location").invoke(rel)
            loc.getClass.getMethod("rootPaths").invoke(loc)
              .asInstanceOf[Seq[org.apache.hadoop.fs.Path]]
              .foreach { hp =>
                val local = Paths.get(hp.toUri.getPath)
                  .toAbsolutePath.normalize
                if (local.startsWith(root)) deleteRecursively(local)
              }
          }
        }
      }
    }
}
