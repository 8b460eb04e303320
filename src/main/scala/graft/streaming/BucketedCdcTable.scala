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
  *   dir/data/gen=G/__bkt=B/   rows of bucket B as rewritten at gen G
  *                             (only TOUCHED buckets appear under G)
  *   dir/manifest/gen=G/       (__bkt, data_gen): for every bucket, the
  *                             generation holding its current rows
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
    autoCompactAt: Int = 16) {
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

  private def writeManifest(m: Seq[(Int, Int)], g: Int): Unit = {
    import spark.implicits._
    m.toDF(Bkt, "data_gen").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/manifest/gen=$g")
  }

  private def readManifest(g: Int): Seq[(Int, Int)] =
    spark.read.parquet(s"$dir/manifest/gen=$g")
      .select(col(Bkt), col("data_gen"))
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq

  /** Publish a full base snapshot as generation 0 (or the next
    * generation when called again): every bucket's data lands under
    * this generation. */
  def publish(df: DataFrame): Unit = {
    val next = gen + 1
    df.withColumn(Bkt, bucketOf(col(keyCol)))
      .write.mode("overwrite").partitionBy(Bkt)
      .parquet(s"$dir/data/gen=$next")
    writeManifest((0 until nBuckets).map((_, next)), next)
    gen = next
  }

  def snapshot: DataFrame = snapshotAt(gen)

  /** The table as of generation `g` — any committed generation, since
    * manifests and the data they reference are never rewritten. */
  def snapshotAt(g: Int): DataFrame = {
    require(g >= 0 && g <= gen, s"generation $g not in [0, $gen]")
    val m = readManifest(g)
    m.groupBy(_._2).toSeq.sortBy(_._1).map { case (dataGen, buckets) =>
      spark.read.parquet(s"$dir/data/gen=$dataGen")
        .filter(col(Bkt).isin(buckets.map(_._1): _*))
    }.reduce(_ unionByName _).drop(Bkt)
  }

  /** Fold one change batch in, rewriting only the buckets its keys
    * hash to. Write volume per batch ∝ touched buckets (≈ batch size ×
    * table/nBuckets), never the table. */
  def applyBatch(changes: DataFrame): Unit = {
    val next = gen + 1
    // ≤ nBuckets ints — the bounded routing collect, not a data collect
    val touched = changes.select(bucketOf(col(keyCol)).as(Bkt))
      .distinct().collect().map(_.getInt(0)).toSet
    if (touched.isEmpty) { writeManifest(readManifest(gen), next); gen = next }
    else {
      val m = readManifest(gen)
      val affected = m.filter(t => touched(t._1)).groupBy(_._2).toSeq
        .sortBy(_._1).map { case (dataGen, buckets) =>
          spark.read.parquet(s"$dir/data/gen=$dataGen")
            .filter(col(Bkt).isin(buckets.map(_._1): _*))
        }.reduce(_ unionByName _).drop(Bkt)
      Upsert.applyChanges(affected, changes, keyCol, opCol, seqCol)
        .withColumn(Bkt, bucketOf(col(keyCol)))
        .write.mode("overwrite").partitionBy(Bkt)
        .parquet(s"$dir/data/gen=$next")
      writeManifest(
        m.map { case (b, dg) => (b, if (touched(b)) next else dg) }, next)
      gen = next
    }
    if (referencedGens > autoCompactAt) compact()
  }

  /** Distinct data generations the current manifest references — the
    * snapshot's read fan-out. */
  def referencedGens: Int = readManifest(gen).map(_._2).distinct.size

  /** Rewrite the whole snapshot into one fresh generation (manifest →
    * single data_gen). The only full-table write after publish; run it
    * on the [[StreamingDedup]] cadence — amortized over many batches —
    * not per batch. Old generations stay readable for time travel. */
  def compact(): Unit = {
    val next = gen + 1
    snapshot.withColumn(Bkt, bucketOf(col(keyCol)))
      .write.mode("overwrite").partitionBy(Bkt)
      .parquet(s"$dir/data/gen=$next")
    writeManifest((0 until nBuckets).map((_, next)), next)
    gen = next
  }

  def attach(changes: DataFrame): StreamingQuery =
    changes.writeStream
      .outputMode("append")
      .foreachBatch((batch: Dataset[Row], _: Long) => applyBatch(batch))
      .start()
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

  /** Write commit record `idx` atomically: temp file + rename. */
  def write(fs: org.apache.hadoop.fs.FileSystem, root: String,
      idx: Long, batchId: Long, tableGen: Int, aggGen: Int): Unit = {
    val dir = new org.apache.hadoop.fs.Path(root)
    if (!fs.exists(dir)) fs.mkdirs(dir)
    val tmp = new org.apache.hadoop.fs.Path(root, s".$idx.tmp")
    val out = fs.create(tmp, true)
    try out.write(s"$batchId,$tableGen,$aggGen".getBytes("UTF-8"))
    finally out.close()
    fs.rename(tmp, new org.apache.hadoop.fs.Path(root, idx.toString))
  }
}
