package graft.streaming

import graft.operators.Upsert
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** [[CdcTable]] with per-batch write volume proportional to the BATCH,
  * not the table: the snapshot is hash-bucketed on the key
  * (`__bkt = pmod(hash(key), nBuckets)`, a real partition column) and a
  * change batch rewrites ONLY the buckets containing its touched keys.
  * At 100 TB this is the difference between a CDC sink that works and
  * one that rewrites the warehouse every micro-batch.
  *
  * Layout:
  * {{{
  *   dir/data/gen=D/__bkt=B/   rows of bucket B as rewritten at data
  *                             gen D (only TOUCHED buckets appear)
  *   dir/manifest/gen=G/       (__bkt, data_gen): for every bucket, the
  *                             data generation holding its current rows
  * }}}
  *
  * The manifest is the generation's entire commit: data directories
  * land first, the manifest lands last, and recovery (and
  * [[generation]] on construction) only ever flips to the highest
  * manifest directory whose `_SUCCESS` marker exists — a torn write
  * leaves orphan data/manifest files that are never referenced, the
  * same write-new-then-flip contract as the flat table, now at bucket
  * granularity. Every old manifest stays readable, so
  * [[snapshotAt]] gives free time travel over all generations.
  *
  * DATA generations are allocated independently of manifest
  * generations (first number above both the highest committed data gen
  * and the current manifest gen). This is what makes crashed and
  * racing writers harmless: a data gen whose manifest never landed —
  * a crash between the two, or a lost manifest race — is simply never
  * referenced, the next writer allocates PAST it instead of fighting
  * its committed `_SUCCESS` for the slot (the r12 wedge: the retry
  * loop lost the data CAS to the crashed writer's own orphan three
  * times and refused), and [[vacuum]] reclaims it later. The manifest
  * CAS remains the single arbitration point.
  *
  * Read path: the manifest (≤ nBuckets rows — a bounded config
  * constant, collected driver-side like [[graft.operators.IvfIndex]]'s
  * probe routing) groups buckets by their data generation; the
  * snapshot is one partition-PRUNED scan per referenced generation
  * (`__bkt IN (…)` on the partition column prunes every other bucket
  * directory). Referenced generations grow by at most one per batch
  * and reset at [[compact]]; `autoCompactAt` bounds them, so read
  * fan-out is bounded the way [[StreamingDedup]] bounds its index
  * directories.
  */
final class BucketedCdcTable(
    spark: SparkSession, dir: String, keyCol: String, nBuckets: Int,
    opCol: String = "op", seqCol: Option[String] = None,
    autoCompactAt: Int = 16, statsCols: Seq[String] = Nil) {
  require(nBuckets >= 1, s"nBuckets $nBuckets")
  require(autoCompactAt >= 2, s"autoCompactAt $autoCompactAt")

  private val Bkt = "__bkt"

  private def fs = new org.apache.hadoop.fs.Path(dir)
    .getFileSystem(spark.sessionState.newHadoopConf())

  /** Recovered, not assumed: the highest manifest directory whose
    * _SUCCESS marker landed. A process restart resumes exactly at the
    * last committed generation. */
  @volatile private var gen: Int =
    CdcCommits.maxCommittedGen(fs, s"$dir/manifest")

  def generation: Int = gen

  private def bucketOf(c: org.apache.spark.sql.Column) =
    pmod(hash(c), lit(nBuckets)).cast("int")

  /** CAS-published ([[graft.operators.AtomicCommit]]): the manifest IS
    * the generation's commit, so the flip must be conditional — two
    * writers racing generation g get exactly one winner and a DETECTED
    * loser. Returns whether this writer won. */
  private def writeManifest(m: Seq[(Int, Int)], g: Int): Boolean = {
    import spark.implicits._
    val won = graft.operators.AtomicCommit
      .publishParquet(spark, s"$dir/manifest/gen=$g") { tmp =>
        m.toDF(Bkt, "data_gen").coalesce(1)
          .write.mode("overwrite").parquet(tmp)
      }
    // the winner knows the committed content — seed the cache so the
    // immediate read-back (referencedGens, next applyBatch's routing)
    // costs nothing
    if (won) manifestCache.put(g, m)
    won
  }

  private def reloadGen(): Unit =
    gen = CdcCommits.maxCommittedGen(fs, s"$dir/manifest")

  private def refuse(what: String): Nothing =
    throw new graft.operators.ConcurrentWriteException(
      s"BucketedCdcTable $dir: lost the $what race 3 times — a " +
        "concurrent writer is live on this table; coordinate upstream")

  /** Retry harness for the conditional commits: each attempt runs
    * against the CURRENT committed generation (reloaded after a lost
    * race so the recompute sees the winner's state), refusing loudly
    * after 3 losses. */
  private def retrying(what: String)(attempt: () => Boolean): Unit = {
    var tries = 0
    while (!attempt()) {
      reloadGen()
      tries += 1
      if (tries >= 3) refuse(what)
    }
  }

  /** Committed manifests are IMMUTABLE (CAS-published directories that
    * are never rewritten), so their contents memoize per instance.
    * The protocol consults the current manifest on every operation —
    * routing, assembly, liveness, fan-out checks — and each uncached
    * consult is a whole Spark job (read + collect) over a ≤ nBuckets-row
    * file: pure per-batch fixed cost at ANY data scale (guide §1.2 —
    * remove work, here repeated driver-side metadata jobs, before
    * tuning inside it). Only ever keyed by generations that exist on
    * disk; a reloadGen() after a lost race adds keys, never changes
    * one. */
  private val manifestCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Seq[(Int, Int)]]()

  private def readManifest(g: Int): Seq[(Int, Int)] =
    manifestCache.computeIfAbsent(g, _ =>
      spark.read.parquet(s"$dir/manifest/gen=$g")
        .select(col(Bkt), col("data_gen"))
        .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq)

  /** Publish a full base snapshot as generation 0 (or the next
    * generation when called again): every bucket's data lands under
    * this generation. Range-cluster `df` on the stats columns upstream
    * (`repartitionByRange` / [[graft.operators.Layout]] z-order) to
    * make the per-file min/max ranges narrow — hash bucketing routes
    * KEYS to directories, but the write tasks' row clustering is what
    * [[scanWhere]]'s file skipping feeds on. */
  /** First data-gen number above both the highest committed data gen
    * and the current manifest gen: never contends with a crashed
    * writer's committed orphan, and two LIVE writers picking the same
    * number are arbitrated by the data CAS (the loser re-allocates
    * above the winner on retry). */
  private def allocDataGen(): Int =
    math.max(CdcCommits.maxCommittedGen(fs, s"$dir/data"), gen) + 1

  def publish(df: DataFrame): Unit = retrying("publish") { () =>
    val next = gen + 1
    val dg = allocDataGen()
    // a won data write followed by a LOST manifest race is a plain
    // retry (a concurrent writer committed the manifest slot first);
    // our committed data gen is now unreferenced — vacuum food, never
    // a wedge, because allocation skips past it
    writeGen(df.withColumn(Bkt, bucketOf(col(keyCol))), dg) &&
      writeManifest((0 until nBuckets).map((_, dg)), next) &&
      { gen = next; true }
  }

  /** Clamp to an externally-committed generation ([[BucketedCdcAggTable]]
    * recovery: the commit record is the truth for the pair). */
  private[streaming] def resetTo(g: Int): Unit = gen = g

  def snapshot: DataFrame = snapshotAt(gen)

  // ── schema evolution ────────────────────────────────────────────────
  // Evolution ops are tiny versioned records under dir/schema/v=N (one
  // parquet row each, CAS-published like everything else: two writers
  // racing an evolution get one winner). Data files are NEVER rewritten:
  // every read normalizes each generation's scan to the MERGED schema —
  // an added column materializes as its recorded default over
  // pre-evolution rows, a widened column casts up. Old manifests stay
  // valid, so time travel crosses evolution boundaries for free, always
  // answering under the merged schema (the lakehouse convention).

  /** Per-version memo for schema-evolution records: each `v=N`
    * directory is CAS-published and immutable, so its single row is
    * read at most once per instance. Discovery (the listing) stays per
    * call — a cheap FS op, where the per-version `spark.read` was a
    * Spark job apiece, repeated by every normalize/assemble. */
  private val schemaOpCache = new java.util.concurrent.ConcurrentHashMap[
    Int, (String, String, String, String)]()

  private def readSchemaOps(): Seq[(String, String, String, String)] = {
    val root = new org.apache.hadoop.fs.Path(s"$dir/schema")
    if (!fs.exists(root)) Nil
    else fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
      .flatMap(s => s.getPath.getName.stripPrefix("v=").toIntOption
        .map(n => (n, s.getPath.toString)))
      .sortBy(_._1)
      .map { case (n, p) =>
        schemaOpCache.computeIfAbsent(n, _ => {
          val r = spark.read.parquet(p).head()
          (r.getString(0), r.getString(1), r.getString(2), r.getString(3))
        })
      }
  }

  private def nextSchemaVersion: Int = {
    val root = new org.apache.hadoop.fs.Path(s"$dir/schema")
    if (!fs.exists(root)) 0
    else fs.listStatus(root).toSeq
      .flatMap(_.getPath.getName.stripPrefix("v=").toIntOption)
      .maxOption.map(_ + 1).getOrElse(0)
  }

  private def writeSchemaOp(op: String, name: String, typ: String,
      default: String): Unit = {
    import spark.implicits._
    val v = nextSchemaVersion
    val won = graft.operators.AtomicCommit
      .publishParquet(spark, s"$dir/schema/v=$v") { tmp =>
        Seq((op, name, typ, default)).toDF("op", "name", "typ", "default")
          .coalesce(1).write.mode("overwrite").parquet(tmp)
      }
    if (!won) throw new graft.operators.ConcurrentWriteException(
      s"BucketedCdcTable $dir: schema version $v was published by a " +
        "concurrent writer; re-read the schema and retry the evolution")
  }

  /** Add a column with a default: recorded in the schema meta, never a
    * data rewrite. Pre-evolution rows read back with the default; the
    * default is stored as a STRING and cast to `typeDdl` at read, so it
    * replays identically in any engine. */
  def evolveAddColumn(name: String, typeDdl: String,
      default: String): Unit = {
    require(!snapshot.columns.contains(name) && name != Bkt,
      s"evolveAddColumn: column '$name' already exists")
    writeSchemaOp("add", name, typeDdl, default)
  }

  /** Widen an integral column in place (short/int → long — the only
    * always-safe cast family): recorded, never rewritten; every read
    * casts pre-evolution generations up. Stats-file pruning is
    * unaffected — per-file min/max are stored as LONG from day one
    * (the [[writeStats]] contract), so a widened column's old stats
    * remain exact. */
  def evolveWiden(name: String, toTypeDdl: String = "long"): Unit = {
    val from = snapshot.schema(name).dataType.typeName
    require(Seq("short", "integer", "int").contains(from),
      s"evolveWiden: '$name' is $from; only short/int -> long is a " +
        "lossless in-place widening")
    require(toTypeDdl == "long" || toTypeDdl == "bigint",
      s"evolveWiden: target must be long/bigint, got $toTypeDdl")
    writeSchemaOp("widen", name, "long", "")
  }

  /** Normalize one generation's scan to the merged schema. Idempotent:
    * generations written after an evolution already carry the column /
    * width and pass through unchanged. */
  private def normalize(df: DataFrame,
      ops: Seq[(String, String, String, String)]): DataFrame =
    ops.foldLeft(df) { case (d, (op, name, typ, default)) =>
      op match {
        case "add" if !d.columns.contains(name) =>
          d.withColumn(name, lit(default).cast(typ))
        case "widen" if d.columns.contains(name) &&
            d.schema(name).dataType.typeName != typ =>
          d.withColumn(name, col(name).cast(typ))
        case _ => d
      }
    }

  private def assemble(m: Seq[(Int, Int)]): DataFrame = {
    val ops = readSchemaOps()
    m.groupBy(_._2).toSeq.sortBy(_._1).map { case (dataGen, buckets) =>
      normalize(spark.read.parquet(s"$dir/data/gen=$dataGen"), ops)
        .filter(col(Bkt).isin(buckets.map(_._1): _*))
    }.reduce(_ unionByName _).drop(Bkt)
  }

  /** Lowest readable generation ([[vacuum]] raises it; 0 = full
    * history). Recovered from the retention record on construction. */
  @volatile private var floor: Int = Retention.floorOf(fs, dir)

  def retentionFloor: Int = floor

  /** The table as of generation `g` — any committed generation within
    * the retention horizon (manifests and the data they reference are
    * never rewritten). Below the horizon the request fails LOUDLY:
    * the generation is expired or already reclaimed, and a read that
    * happened to find surviving files would be nondeterministic. */
  def snapshotAt(g: Int): DataFrame = {
    require(g >= 0 && g <= gen, s"generation $g not in [0, $gen]")
    require(g >= floor,
      s"generation $g expired by retention (floor=$floor) — vacuumed")
    assemble(readManifest(g))
  }

  /** Data generations referenced by any manifest in [`from`, current]
    * — the liveness set for retention decisions. Bounded driver work:
    * retained-generation count × nBuckets manifest rows. */
  private def liveDataGens(from: Int): Set[Int] =
    (math.max(from, 0) to gen).flatMap(g => readManifest(g).map(_._2)).toSet

  private def committedDataGens: Set[Int] = {
    val root = new org.apache.hadoop.fs.Path(s"$dir/data")
    if (!fs.exists(root)) Set.empty
    else fs.listStatus(root).toSeq.flatMap { s =>
      val suffix = s.getPath.getName.stripPrefix("gen=")
      if (s.isDirectory && s.getPath.getName.startsWith("gen=") &&
          suffix.nonEmpty && suffix.forall(_.isDigit)) Some(suffix.toInt)
      else None
    }.toSet
  }

  /** Expire time travel older than the newest `retainLast` generations
    * and reclaim the bytes ([[Retention]] mark-then-sweep — this pass
    * marks, the NEXT pass deletes, so a reader whose scan was planned
    * before the mark survives one full janitor cycle). Expired units:
    * manifests below the new floor, plus every data generation (and
    * its stats file) referenced by NO retained manifest — which also
    * collects the unreferenced orphans that crashed or CAS-losing
    * writers leave behind ([[allocDataGen]]). Data liveness is
    * RE-CHECKED at sweep time: a data gen marked while its writer's
    * manifest was still in flight has become referenced since, and the
    * manifest tree — not the mark — is the truth. Racing janitors are
    * idempotent (CAS-published records; double-delete is a no-op). */
  def vacuum(retainLast: Int): Unit = {
    require(retainLast >= 1, s"retainLast $retainLast must be >= 1")
    // liveness must span the CURRENT committed manifest tree, not this
    // instance's possibly-stale view — a long-lived janitor vacuuming
    // while another writer advances the table would otherwise treat
    // data gens referenced only by newer manifests as orphans and (on
    // the next pass, under the same stale cap) delete committed data
    reloadGen()
    val st = Retention.load(fs, dir)
    if (st.pending.nonEmpty) {
      val live = liveDataGens(st.floor)
      st.pending.foreach { p =>
        if (p.startsWith("data/gen=")) {
          val dg = p.stripPrefix("data/gen=").toInt
          if (!live(dg)) {
            fs.delete(new org.apache.hadoop.fs.Path(s"$dir/$p"), true)
            fs.delete(
              new org.apache.hadoop.fs.Path(s"$dir/stats/gen=$dg"), true)
          }
        } else fs.delete(new org.apache.hadoop.fs.Path(s"$dir/$p"), true)
      }
    }
    val floorNew = math.max(st.floor, math.max(gen - retainLast + 1, 0))
    val retained = liveDataGens(floorNew)
    val newly = (st.floor until floorNew).map(g => s"manifest/gen=$g") ++
      (committedDataGens -- retained).toSeq.sorted.map(d => s"data/gen=$d")
    if (newly.nonEmpty || st.pending.nonEmpty) {
      if (!Retention.tryPublish(fs, dir,
          Retention.State(st.idx + 1, floorNew, newly))) {
        floor = math.max(floorNew, Retention.floorOf(fs, dir))
        return // racing janitor advanced: accept its (equivalent) state
      }
    }
    floor = floorNew
  }

  /** Buckets the batch's keys hash to — the bounded driver-side
    * routing collect (≤ nBuckets ints, never data). */
  def touchedBuckets(changes: DataFrame): Set[Int] =
    changes.select(bucketOf(col(keyCol)).as(Bkt))
      .distinct().collect().map(_.getInt(0)).toSet

  /** Partition-pruned snapshot of ONLY the given buckets — the
    * old-image lookup surface for incremental maintenance: a CDC
    * batch's keys live entirely in its touched buckets, so a
    * maintainer never reads the rest of the table. */
  def snapshotOf(buckets: Set[Int]): DataFrame = {
    val m = readManifest(gen).filter(t => buckets(t._1))
    if (m.isEmpty) snapshot.limit(0) else assemble(m)
  }

  /** Write one data generation. When the rows are empty (a batch that
    * deleted every remaining row of its touched buckets), a
    * `partitionBy` write would land ZERO data files — only _SUCCESS —
    * and the next snapshot would die on parquet schema inference; the
    * fallback writes the empty frame unpartitioned, which still emits
    * one schema-bearing (empty) parquet file, keeping every referenced
    * generation readable. `__bkt` survives as a plain column there, so
    * [[assemble]]'s bucket filter and drop behave identically. */
  private def writeGen(rows: DataFrame, g: Int,
      preshaped: Boolean = false): Boolean = {
    val won = graft.operators.AtomicCommit
      .publishParquet(spark, s"$dir/data/gen=$g") { tmp =>
        if (rows.isEmpty) rows.write.mode("overwrite").parquet(tmp)
        else if (preshaped) // caller shaped the partitioning/order
          rows.write.mode("overwrite").partitionBy(Bkt).parquet(tmp)
        else {
          // widen a narrow plan (publish's single-file base scan arrives
          // as ONE input split) so buckets write in parallel; a plan
          // already at/above bucket parallelism writes as-is — no extra
          // shuffle on the wide path, which is the only path at scale
          val parts = rows.queryExecution.toRdd.getNumPartitions
          val w = if (parts < math.min(nBuckets,
              spark.conf.get("spark.sql.shuffle.partitions").toInt))
            rows.repartition(math.min(nBuckets,
              spark.conf.get("spark.sql.shuffle.partitions").toInt), col(Bkt))
          else rows
          w.write.mode("overwrite").partitionBy(Bkt).parquet(tmp)
        }
      }
    // stats read the COMMITTED path (file names are manifest content),
    // so they land after the CAS and only for the winner
    if (won && statsCols.nonEmpty) writeStats(g)
    won
  }

  /** Per-FILE manifest stats for generation `g`: one row per data file
    * written at `g` carrying `(file, __bkt, min_c, max_c …)` for every
    * stats column — the data-skipping layer of the manifest. Cost ∝
    * the generation just written (one re-read of the new files), never
    * the table. Stats columns are stored as LONG — integral columns
    * cast (the cents discipline), DOUBLE/FLOAT columns through the
    * order-preserving IEEE-754 bit lift
    * ([[graft.functions.IeeeSortable]]): min/max of the lifted values
    * IS the lift of min/max (monotone bijection), so file skipping on
    * float metrics is exactly as tight as on integers while the stats
    * file keeps one flat typed schema for any column set. Stats land
    * BEFORE the manifest flips ([[writeGen]] precedes
    * [[writeManifest]] everywhere), so a committed manifest always has
    * its stats and a torn attempt's stats are orphans recovery never
    * reads — the same crash contract as the data files. */
  private def statExpr(df: DataFrame, c: String): org.apache.spark.sql.Column =
    df.schema(c).dataType.typeName match {
      case "double" | "float" =>
        graft.functions.VectorFunctions.register(spark)
        // signed-order variant (top bit flipped): these stats flow
        // through ordinary min/max/< — see IeeeSortable.liftSigned
        call_function(graft.functions.VectorFunctions.ieeeSortableName,
          col(c).cast("double")).bitwiseXOR(lit(Long.MinValue))
      case _ => col(c).cast("long")
    }

  /** A column's floating-ness is immutable (the only retype op is the
    * integral widen), so the footer sniff runs once per column. */
  private val floatCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  private def isFloating(c: String): Boolean =
    floatCache.computeIfAbsent(c, _ => {
      val m = readManifest(gen)
      val dg = m.map(_._2).max
      Seq("double", "float").contains(
        spark.read.parquet(s"$dir/data/gen=$dg").schema(c).dataType.typeName)
    })

  private def writeStats(g: Int): Unit = {
    val genDf = spark.read.parquet(s"$dir/data/gen=$g")
    val aggs = statsCols.flatMap(c => Seq(
      min(statExpr(genDf, c)).as(s"min_$c"),
      max(statExpr(genDf, c)).as(s"max_$c")))
    genDf
      // relative to $dir/data: manifests stay valid if the table moves
      .withColumn("file",
        substring_index(input_file_name(), "/data/", -1))
      .groupBy(col("file"), col(Bkt).cast("int").as(Bkt))
      .agg(aggs.head, aggs.tail: _*)
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/stats/gen=$g")
  }

  /** The files a range predicate `lo <= statsCol <= hi` must read
    * under the current manifest, next to the snapshot's total file
    * count — the data-skipping decision, exposed for measurement. A
    * file survives iff its `[min, max]` intersects `[lo, hi]`; a null
    * min/max (stats column all-null in that file) keeps the file —
    * skipping is an optimization, never a correctness gate. Stats must
    * have been configured from the table's first write (every
    * referenced generation carries a stats file). */
  def pruneFiles(statsCol: String, lo: Long, hi: Long): (Seq[String], Int) = {
    require(!isFloating(statsCol),
      s"$statsCol is floating-point — use pruneFilesDouble/scanWhereDouble")
    pruneBounds(statsCol, lo, hi)
  }

  /** [[pruneFiles]] over a DOUBLE/FLOAT stats column: bounds are
    * lifted through the same order-preserving IEEE-754 map the stats
    * were written with, so skipping is exactly as tight as on
    * integers (a file with NaNs keeps a +max stat and is never
    * wrongly skipped). */
  def pruneFilesDouble(statsCol: String, lo: Double,
      hi: Double): (Seq[String], Int) = {
    require(isFloating(statsCol),
      s"$statsCol is integral — use pruneFiles/scanWhere")
    pruneBounds(statsCol, graft.functions.IeeeSortable.liftSigned(lo),
      graft.functions.IeeeSortable.liftSigned(hi))
  }

  /** Per-(data gen, stats column) memo of collected file stats: a
    * generation's stats file is written once, after its data CAS, and
    * never rewritten, so each (gen, column) pair collects at most once
    * per instance instead of one union+collect job per prune call. */
  private val statsCache = new java.util.concurrent.ConcurrentHashMap[
    (Int, String), Array[(String, Int, Option[Long], Option[Long])]]()

  private def statsOf(g: Int,
      statsCol: String): Array[(String, Int, Option[Long], Option[Long])] =
    statsCache.computeIfAbsent((g, statsCol), _ =>
      spark.read.parquet(s"$dir/stats/gen=$g")
        .select(col("file"), col(Bkt),
          col(s"min_$statsCol"), col(s"max_$statsCol"))
        .collect().map(r => (r.getString(0), r.getInt(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          if (r.isNullAt(3)) None else Some(r.getLong(3)))))

  private def pruneBounds(statsCol: String, lo: Long,
      hi: Long): (Seq[String], Int) = {
    require(statsCols.contains(statsCol),
      s"$statsCol not in statsCols $statsCols")
    val m = readManifest(gen)
    val current = m.toSet
    val rows = m.map(_._2).distinct.sorted
      .flatMap(g => statsOf(g, statsCol)).toArray
      // a file belongs to the snapshot iff the manifest maps its
      // bucket to the generation that wrote it (encoded in its path)
      .filter { case (f, b, _, _) =>
        f.split("/").head.stripPrefix("gen=").toIntOption
          .exists(fg => current((b, fg))) }
    val kept = rows.collect {
      case (f, _, mn, mx)
          if mn.isEmpty || mx.isEmpty ||
            (mn.get <= hi && mx.get >= lo) => f
    }
    (kept.toSeq, rows.length)
  }

  /** Snapshot rows satisfying `lo <= statsCol <= hi`, reading ONLY the
    * files whose min/max range intersects — predicate-level skipping
    * on top of the manifest's bucket-level pruning. Equivalent to
    * `snapshot.filter(col(statsCol).between(lo, hi))` by construction
    * (the exact predicate is still applied; stats only drop files that
    * cannot contain a match). */
  def scanWhere(statsCol: String, lo: Long, hi: Long): DataFrame =
    scanKept(pruneFiles(statsCol, lo, hi)._1,
      col(statsCol).cast("long").between(lo, hi))

  /** [[scanWhere]] over a DOUBLE/FLOAT stats column — equivalent to
    * `snapshot.filter(col(statsCol).between(lo, hi))` by construction,
    * reading only files whose lifted min/max range intersects. */
  def scanWhereDouble(statsCol: String, lo: Double, hi: Double): DataFrame =
    scanKept(pruneFilesDouble(statsCol, lo, hi)._1,
      col(statsCol).cast("double").between(lo, hi))

  private def scanKept(files: Seq[String],
      pred: org.apache.spark.sql.Column): DataFrame =
    if (files.isEmpty) snapshot.limit(0).filter(pred)
    // normalize BEFORE the predicate: kept files may predate an
    // evolution (a filter on an added column must see its default;
    // a widened column compares at the merged width)
    else normalize(spark.read.parquet(files.map(f => s"$dir/data/$f"): _*),
      readSchemaOps()).filter(pred)

  /** Fold one change batch in, rewriting only the buckets its keys
    * hash to. Write volume per batch ∝ touched buckets (≈ batch size ×
    * table/nBuckets), never the table.
    *
    * The batch is scratch-materialized FIRST: it is consumed twice
    * (bucket routing, then the rewrite join), and a lazy caller plan —
    * q114's change feeds are three-way unions over the source scan —
    * would re-execute per consumer; one batch-sized scratch write is
    * the cheaper side of that trade at every scale (cost ∝ batch,
    * matching this method's contract). Released before return
    * ([[graft.operators.Lifecycle]] — nothing stays pinned). */
  def applyBatch(changes: DataFrame): Unit = {
    val ch =
      if (changes.isStreaming) changes
      else graft.operators.Lifecycle.materializeToScratch(changes)
    try {
      val touched = touchedBuckets(ch)
      retrying("applyBatch") { () =>
        val next = gen + 1
        if (touched.isEmpty) {
          val won = writeManifest(readManifest(gen), next)
          if (won) gen = next
          won
        } else {
          // recomputed per attempt: a lost race reloads `gen`, so the
          // old images come from the WINNER's committed state
          val m = readManifest(gen)
          val affected = assemble(m.filter(t => touched(t._1)))
          // a batch from a pre-evolution producer folds under the
          // merged schema too (normalize is a no-op otherwise)
          val chN = normalize(ch, readSchemaOps())
          val dg = allocDataGen()
          writeGen(Upsert.applyChanges(affected, chN, keyCol, opCol,
              seqCol).withColumn(Bkt, bucketOf(col(keyCol))), dg) &&
            writeManifest(
              m.map { case (b, old) => (b, if (touched(b)) dg else old) },
              next) &&
            { gen = next; true }
        }
      }
      if (referencedGens > autoCompactAt) compact()
    } finally {
      if (!(ch eq changes)) graft.operators.Lifecycle.release(ch)
    }
  }

  /** Distinct data generations the current manifest references — the
    * snapshot's read fan-out. */
  def referencedGens: Int = readManifest(gen).map(_._2).distinct.size

  /** Rewrite the whole snapshot into one fresh generation (manifest →
    * single data_gen). The only full-table write after publish; run it
    * on the [[StreamingDedup]] cadence — amortized over many batches —
    * not per batch. Old generations stay readable for time travel. */
  def compact(): Unit = retrying("compact") { () =>
    val next = gen + 1
    val dg = allocDataGen()
    writeGen(snapshot.withColumn(Bkt, bucketOf(col(keyCol))), dg) &&
      writeManifest((0 until nBuckets).map((_, dg)), next) &&
      { gen = next; true }
  }

  /** [[compact]] that also RE-CLUSTERS the rows on the stats columns —
    * the OPTIMIZE step of this table format. Incremental batches write
    * whatever row order arrives, so after many batches every file's
    * min/max range is wide and [[scanWhere]]'s skipping decays toward
    * read-everything; a clustered rewrite range-partitions each bucket
    * into `nFiles` contiguous stats-column runs (and sorts within), so
    * per-file ranges become narrow again. Results are identical to
    * [[compact]] by construction — only the file layout (and therefore
    * [[pruneFiles]]'s kept-set) changes. Cost: one extra range
    * exchange over the full-table rewrite compact already pays. */
  def compactClustered(nFiles: Int): Unit = {
    require(statsCols.nonEmpty,
      "compactClustered clusters on statsCols — configure them at " +
        "construction (plain compact() needs no stats)")
    require(nFiles >= 1, s"nFiles $nFiles")
    retrying("compactClustered") { () =>
      val next = gen + 1
      val dg = allocDataGen()
      val keys = col(Bkt) +: statsCols.map(col)
      val clustered = snapshot.withColumn(Bkt, bucketOf(col(keyCol)))
        .repartitionByRange(nFiles, keys: _*)
        .sortWithinPartitions(keys: _*)
      writeGen(clustered, dg, preshaped = true) &&
        writeManifest((0 until nBuckets).map((_, dg)), next) &&
        { gen = next; true }
    }
  }

  def attach(changes: DataFrame): StreamingQuery =
    changes.writeStream
      .outputMode("append")
      .foreachBatch((batch: Dataset[Row], _: Long) => applyBatch(batch))
      .start()
}

/** [[CdcAggTable]] on the bucketed scale table: per-batch cost tracks
  * the BATCH on both sides — the table rewrite is bucket-local
  * ([[BucketedCdcTable.applyBatch]]) and the aggregate refresh's
  * old-image lookup reads ONLY the touched buckets
  * ([[BucketedCdcTable.snapshotOf]] — a partition-pruned manifest
  * view), where the flat [[CdcAggTable]] scans the whole snapshot for
  * the keys-join. Same commit-record crash recovery: the latest
  * (batchId, tableGen, aggGen) record is the truth for the pair, and
  * a torn attempt's orphan generations are never flipped to. The
  * maintain ≡ recompute invariant is pinned by BucketedCdcTableSpec
  * and oracle-gated by q134. */
final class BucketedCdcAggTable(
    spark: SparkSession, dir: String, keyCol: String, groupCol: String,
    countCol: String, sumCols: Seq[String], nBuckets: Int,
    opCol: String = "op") {

  val table = new BucketedCdcTable(
    spark, s"$dir/table", keyCol, nBuckets, opCol)
  @volatile private var aggGen: Int = -1
  @volatile private var lastBatchId: Long = -1L

  private def fs = new org.apache.hadoop.fs.Path(dir)
    .getFileSystem(spark.sessionState.newHadoopConf())

  // commit record = the pair's truth ([[CdcAggTable]]): recovery flips
  // to it, never past it. For the bucketed table the MANIFEST tree is
  // its commit point; orphan DATA gens need no reclaim — allocation
  // skips past them and vacuum collects them.
  locally {
    val (b, tg, ag) = CdcCommits.latest(fs, s"$dir/commits")
      .getOrElse((-1L, -1, -1))
    lastBatchId = b; table.resetTo(tg); aggGen = ag
  }

  // Torn-generation reclaim is deferred to the first WRITE through this
  // instance ([[CdcAggTable.reclaimTorn]]): a pure reader constructed
  // mid-commit must never delete the writer's committed-but-unrecorded
  // generation. The boundary is re-read at reclaim time — generations
  // recorded since our recovery are live, and deleting them would turn
  // a must-lose CAS into a silent win.
  private lazy val reclaimTorn: Unit = {
    val (_, tg, ag) = CdcCommits.latest(fs, s"$dir/commits")
      .getOrElse((-1L, -1, -1))
    CdcCommits.reclaimAbove(fs, s"$dir/table/manifest",
      math.max(tg, table.generation))
    CdcCommits.reclaimAbove(fs, s"$dir/agg", math.max(ag, aggGen))
  }

  private def commit(batchId: Long): Unit =
    CdcCommits.write(fs, s"$dir/commits", idx = aggGen.toLong,
      batchId = batchId, tableGen = table.generation, aggGen = aggGen)

  /** CAS-published; the agg+table PAIR is single-logical-writer (see
    * [[CdcAggTable.writeAgg]]) so a lost race refuses loudly. */
  private def writeAgg(df: DataFrame): Unit = {
    val next = aggGen + 1
    val won = graft.operators.AtomicCommit
      .publishParquet(spark, s"$dir/agg/gen=$next") { tmp =>
        df.write.mode("overwrite").parquet(tmp)
      }
    if (!won) throw new graft.operators.ConcurrentWriteException(
      s"BucketedCdcAggTable $dir: aggregate generation $next was " +
        "published by a concurrent writer; this table is single-writer " +
        "— coordinate upstream")
    aggGen = next
  }

  def publish(base: DataFrame): Unit = {
    reclaimTorn
    table.publish(base)
    writeAgg(base.groupBy(col(groupCol))
      .agg(count(lit(1)).as(countCol),
        sumCols.map(c => sum(col(c)).as(c)): _*))
    commit(lastBatchId)
  }

  def aggSnapshot: DataFrame = {
    require(aggGen >= 0,
      "BucketedCdcAggTable has no snapshot yet — publish first")
    spark.read.parquet(s"$dir/agg/gen=$aggGen")
  }

  /** Fold one change batch in: aggregate first (old images from the
    * PRE-change touched buckets only), table second, commit last. */
  def applyBatch(changes: DataFrame, batchId: Long = -1L): Unit = {
    reclaimTorn
    writeAgg(graft.operators.Ivm.maintainSumCountAgg(
      aggSnapshot, table.snapshotOf(table.touchedBuckets(changes)),
      changes, keyCol, opCol, groupCol, countCol, sumCols))
    table.applyBatch(changes)
    if (batchId >= 0) lastBatchId = batchId
    commit(lastBatchId)
  }

  def attach(changes: DataFrame): StreamingQuery =
    changes.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        if (id > lastBatchId) applyBatch(batch, id)
      }
      .start()

  /** Retention across the whole pair ([[CdcAggTable.vacuum]]): table
    * manifests + data + stats, aggregate generations, and the
    * per-batch commit-record files. */
  def vacuum(retainLast: Int): Unit = {
    table.vacuum(retainLast)
    Retention.vacuumFlat(fs, s"$dir/agg", aggGen, retainLast)
    Retention.pruneCommitRecords(fs, s"$dir/commits", retainLast)
  }
}

/** Commit-state recovery shared by the CDC tables: a generation COUNTS
  * only once its directory's `_SUCCESS` marker exists (the standard
  * Hadoop committer contract), so a torn write is invisible to
  * recovery. */
private[streaming] object CdcCommits {

  /** Highest `gen=N` child of `root` whose _SUCCESS landed; -1 if none. */
  def maxCommittedGen(fs: org.apache.hadoop.fs.FileSystem,
      root: String): Int = {
    val p = new org.apache.hadoop.fs.Path(root)
    if (!fs.exists(p)) -1
    else fs.listStatus(p).toSeq.flatMap { s =>
      val name = s.getPath.getName
      val suffix = name.stripPrefix("gen=")
      if (s.isDirectory && name.startsWith("gen=") && suffix.nonEmpty &&
          suffix.forall(_.isDigit) &&
          fs.exists(new org.apache.hadoop.fs.Path(s.getPath, "_SUCCESS")))
        Some(suffix.toInt)
      else None
    }.maxOption.getOrElse(-1)
  }

  /** Delete every `gen=N` child of `root` with N > `keep` — committed
    * or torn. Recovery-time reclaim for the PAIR protocol (table +
    * aggregate + commit record): there the commit RECORD is the truth,
    * so a gen directory beyond the latest record is protocol-torn even
    * when its own `_SUCCESS` landed (the writer crashed between the gen
    * write and the record). Without the reclaim, a redelivered batch
    * loses the CAS to its own orphan forever (the r12 crash-loop).
    * Single-logical-writer context only — construction, before any
    * writes — which is exactly the pair protocol's contract. */
  def reclaimAbove(fs: org.apache.hadoop.fs.FileSystem,
      root: String, keep: Int): Unit = {
    val p = new org.apache.hadoop.fs.Path(root)
    if (fs.exists(p)) fs.listStatus(p).foreach { s =>
      val suffix = s.getPath.getName.stripPrefix("gen=")
      if (s.isDirectory && s.getPath.getName.startsWith("gen=") &&
          suffix.nonEmpty && suffix.forall(_.isDigit) &&
          suffix.toInt > keep)
        fs.delete(s.getPath, true)
    }
  }

  /** Read the latest commit record under `root` (tiny JSON-ish CSV
    * files, one per commit, named by commit index). Returns
    * (batchId, tableGen, aggGen) or None. Torn/unparseable files are
    * skipped — the previous commit wins, matching the never-flip-to-
    * torn-state contract. */
  def latest(fs: org.apache.hadoop.fs.FileSystem,
      root: String): Option[(Long, Int, Int)] = {
    val p = new org.apache.hadoop.fs.Path(root)
    if (!fs.exists(p)) None
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
          new String(bytes, "UTF-8").trim.split(",") match {
            case Array(b, t, a) => Some((b.toLong, t.toInt, a.toInt))
            case _ => None
          }
        } catch { case _: Exception => None }
      }.nextOption()
  }

  /** Write commit record `idx` atomically: temp file + rename. HDFS
    * returns false (not an exception) when the destination exists, so
    * the result is CHECKED: a re-commit of the same index deletes the
    * stale record first, and a rename that still fails throws rather
    * than silently dropping the commit (which would make recovery
    * resume one batch earlier than the caller believes). */
  def write(fs: org.apache.hadoop.fs.FileSystem, root: String,
      idx: Long, batchId: Long, tableGen: Int, aggGen: Int): Unit = {
    val dir = new org.apache.hadoop.fs.Path(root)
    if (!fs.exists(dir)) fs.mkdirs(dir)
    val tmp = new org.apache.hadoop.fs.Path(root, s".$idx.tmp")
    val out = fs.create(tmp, true)
    try out.write(s"$batchId,$tableGen,$aggGen".getBytes("UTF-8"))
    finally out.close()
    val dst = new org.apache.hadoop.fs.Path(root, idx.toString)
    if (!fs.rename(tmp, dst)) {
      if (fs.exists(dst)) fs.delete(dst, false)
      if (!fs.rename(tmp, dst))
        throw new java.io.IOException(
          s"CdcCommits: rename $tmp -> $dst failed; commit record dropped")
    }
  }
}
