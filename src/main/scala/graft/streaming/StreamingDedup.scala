package graft.streaming

import graft.operators.{Dedup, Lifecycle, Multimodal, Similarity}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Incremental corpus deduplication — the ingestion-time shape of
  * blocked near-dup: documents arrive in batches, each batch is
  * deduplicated against itself and against an on-disk blocking-key
  * index of everything kept so far, and only NOVEL documents (and
  * their blocking keys) are admitted. This is what "dedup" means for a
  * training corpus that grows continuously — the batch self-join
  * ([[Dedup.minHashPairs]], [[graft.operators.Fusion]]) is the
  * backfill shape, this is the steady-state shape.
  *
  * The blocking relation is pluggable: (id, block_key) rows where two
  * docs sharing ANY key are duplicates. [[minHashBlocks]] gives
  * MinHash+LSH text blocking (q80); [[fusedBlocks]] unions text bands
  * with image-embedding hyperplane buckets, so a pair is caught when
  * EITHER modality collides (q81) — the ingestion-time counterpart of
  * [[graft.operators.Fusion.imageTextNearDupPairs]].
  *
  * Semantics (shared verbatim by the streaming ingester and the batch
  * fold, and replayed by the q80/q81 DuckDB oracles): a document is
  * NOVEL iff it shares no block key with (a) any smaller-id document
  * of its own batch, nor (b) any already-admitted document of an
  * earlier batch. Only novel documents' keys enter the index, so a
  * duplicate-of-a-duplicate resolves against the earliest kept copy,
  * and the index stays bounded by the deduplicated corpus size.
  *
  * Scale: per batch, one blocking pass over the batch (scan-side
  * signatures, no shuffle), one self-join on the block key (quadratic
  * only within blocks), and one key-joined probe against the index —
  * batch×index, never index×index. The index is a parquet table
  * partitioned by `ingest_batch=`; on a real cluster both paths live
  * on the shared FS.
  *
  * Exactly-once: [[start]] writes each micro-batch's output and index
  * rows into an `ingest_batch=<batchId>` partition directory with
  * overwrite — a replayed batch after crash recovery overwrites its
  * own partition instead of duplicating it, and [[readIndex]] filters
  * to partitions strictly below the current batch id so a half-written
  * partition from a failed attempt can never shadow its own replay.
  */
object StreamingDedup {

  // --- Index-recorded blocking shape ---
  //
  // A FIXED band shape is the text-LSH scale cliff (the q79 class:
  // noise candidates grow ~n² at fixed rows — see
  // Dedup.adaptiveBandShape), and for an INCREMENTAL index the shape
  // must also never drift between creation and appends: keys from two
  // shapes don't collide, so a mismatched append silently misses every
  // cross-shape duplicate. The shape is therefore sized ONCE at index
  // creation (from the expected corpus size), persisted under
  // `<indexPath>/_shape`, inherited by every later blocking pass, and
  // a conflicting re-declaration is refused loudly.

  /** The blocking shape an index was created with. */
  final case class TextShape(shingleN: Int, numHashes: Int, bands: Int,
      seed: Long, portable: Boolean)

  /** The pre-adaptive fixed default (16 hashes × 4 bands): what a
    * legacy no-hint [[start]] records — recorded, never silent. */
  val LegacyShape: TextShape = TextShape(3, 16, 4, 42L, portable = false)

  /** Adaptive shape for an index expected to hold ~`corpusSizeHint`
    * docs: [[Dedup.adaptiveBandShape]]'s (rows ∝ log n, threshold held
    * at ~0.707) — 10× corpus → wider bands, spec-pinned there. */
  def adaptiveTextShape(corpusSizeHint: Long, shingleN: Int = 3,
      seed: Long = 42L, portable: Boolean = false): TextShape = {
    val (numHashes, bands, _) = Dedup.adaptiveBandShape(corpusSizeHint)
    TextShape(shingleN, numHashes, bands, seed, portable)
  }

  private def shapeDir(indexPath: String) = s"$indexPath/_shape"

  /** The shape recorded under `indexPath`, if any. (`_shape` is
    * invisible to the gen=/ingest_batch=/tombstone= listings, so
    * compaction never touches it.) */
  def readShape(spark: SparkSession, indexPath: String): Option[TextShape] = {
    val p = new org.apache.hadoop.fs.Path(shapeDir(indexPath))
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) None
    else {
      val r = spark.read.parquet(p.toString).head()
      Some(TextShape(r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3),
        r.getBoolean(4)))
    }
  }

  /** Record `shape` as `indexPath`'s blocking shape. Idempotent for an
    * equal shape; REFUSES a different one — appends under a different
    * shape would silently admit every cross-shape duplicate. */
  def recordShape(spark: SparkSession, indexPath: String,
      shape: TextShape): TextShape = {
    readShape(spark, indexPath) match {
      case Some(existing) =>
        require(existing == shape,
          s"index $indexPath was created with blocking shape $existing; " +
            s"refusing to operate with $shape — rebuild the index to " +
            "change its shape")
        existing
      case None =>
        import spark.implicits._
        Seq((shape.shingleN, shape.numHashes, shape.bands, shape.seed,
          shape.portable))
          .toDF("shingle_n", "num_hashes", "bands", "seed", "portable")
          .coalesce(1).write.mode("overwrite")
          .parquet(shapeDir(indexPath))
        shape
    }
  }

  /** Size the index's blocking shape adaptively from the expected
    * corpus size and record it — call ONCE before the first ingest;
    * every later [[textBlocks]]/no-shape [[start]] inherits it. */
  def createTextIndex(spark: SparkSession, indexPath: String,
      corpusSizeHint: Long, shingleN: Int = 3, seed: Long = 42L,
      portable: Boolean = false): TextShape =
    recordShape(spark, indexPath,
      adaptiveTextShape(corpusSizeHint, shingleN, seed, portable))

  /** The blocking function of an index's RECORDED shape — the append
    * path: whatever the index was created with is what every later
    * batch blocks with. */
  def textBlocks(spark: SparkSession, indexPath: String, idCol: String,
      textCol: String): DataFrame => DataFrame = {
    val s = readShape(spark, indexPath).getOrElse(
      throw new IllegalArgumentException(
        s"no blocking shape recorded under $indexPath — run " +
          "createTextIndex (or one ingest) first"))
    minHashBlocks(idCol, textCol, s.shingleN, s.numHashes, s.bands,
      s.seed, s.portable)
  }

  /** The fused (text ∪ image) blocking shape — text bands plus the
    * image hyperplane bit-width, both of which cliff at a fixed size
    * (the q79 pair of causes). Recorded/inherited/refused exactly like
    * [[TextShape]], under its own `_shape_fused` table. */
  final case class FusedShape(shingleN: Int, numHashes: Int, bands: Int,
      nBits: Int, seed: Long, planeSeed: Long, portable: Boolean)

  /** The pre-adaptive fused default (16×4 text bands, 8 image bits). */
  val LegacyFusedShape: FusedShape =
    FusedShape(3, 16, 4, 8, 42L, 7L, portable = false)

  /** Adaptive fused shape: text bands from [[Dedup.adaptiveBandShape]],
    * image bits from [[Similarity.adaptiveHyperplaneBits]] — both
    * sized from the EXPECTED corpus, because an incremental index must
    * fix them at creation (per-batch sizing would change the key
    * space batch to batch). */
  def adaptiveFusedShape(corpusSizeHint: Long, shingleN: Int = 3,
      seed: Long = 42L, planeSeed: Long = 7L,
      portable: Boolean = false): FusedShape = {
    val (numHashes, bands, _) = Dedup.adaptiveBandShape(corpusSizeHint)
    FusedShape(shingleN, numHashes, bands,
      Similarity.adaptiveHyperplaneBits(corpusSizeHint), seed, planeSeed,
      portable)
  }

  private def fusedShapeDir(indexPath: String) = s"$indexPath/_shape_fused"

  def readFusedShape(spark: SparkSession, indexPath: String)
      : Option[FusedShape] = {
    val p = new org.apache.hadoop.fs.Path(fusedShapeDir(indexPath))
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) None
    else {
      val r = spark.read.parquet(p.toString).head()
      Some(FusedShape(r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6)))
    }
  }

  /** Record-or-validate, the [[recordShape]] contract for fused
    * indexes. */
  def recordFusedShape(spark: SparkSession, indexPath: String,
      shape: FusedShape): FusedShape =
    readFusedShape(spark, indexPath) match {
      case Some(existing) =>
        require(existing == shape,
          s"index $indexPath was created with fused shape $existing; " +
            s"refusing to operate with $shape — rebuild the index to " +
            "change its shape")
        existing
      case None =>
        import spark.implicits._
        Seq((shape.shingleN, shape.numHashes, shape.bands, shape.nBits,
          shape.seed, shape.planeSeed, shape.portable))
          .toDF("shingle_n", "num_hashes", "bands", "n_bits", "seed",
            "plane_seed", "portable")
          .coalesce(1).write.mode("overwrite")
          .parquet(fusedShapeDir(indexPath))
        shape
    }

  /** Size + record a fused index's shape from the expected corpus. */
  def createFusedIndex(spark: SparkSession, indexPath: String,
      corpusSizeHint: Long, shingleN: Int = 3, seed: Long = 42L,
      planeSeed: Long = 7L, portable: Boolean = false): FusedShape =
    recordFusedShape(spark, indexPath,
      adaptiveFusedShape(corpusSizeHint, shingleN, seed, planeSeed,
        portable))

  /** [[fusedBlocks]] in the index's RECORDED shape (legacy default
    * recorded when absent — same contract as the no-shape text
    * [[start]]). */
  def fusedBlocksFor(spark: SparkSession, indexPath: String,
      idCol: String, textCol: String, binCol: String, dim: Int)
      : DataFrame => DataFrame = {
    val s = readFusedShape(spark, indexPath)
      .getOrElse(recordFusedShape(spark, indexPath, LegacyFusedShape))
    fusedBlocks(idCol, textCol, binCol, dim, s.shingleN, s.numHashes,
      s.bands, s.nBits, s.seed, s.planeSeed, s.portable)
  }

  /** MinHash+LSH text blocking: one key per band,
    * `t:<band_idx>:<band_hash>`. */
  def minHashBlocks(idCol: String, textCol: String, shingleN: Int = 3,
      numHashes: Int = 16, bands: Int = 4, seed: Long = 42L,
      portable: Boolean = false)(df: DataFrame): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    Dedup.bandedSignatures(
      Dedup.withMinHashSignature(df, idCol, textCol, shingleN,
        numHashes, seed, portable),
      idCol, bands, numHashes / bands, portable)
      .select(col(idCol), concat_ws(":", lit("t"), col("band_idx"),
        col("band_hash")).as("block_key"))
  }

  /** SimHash banded blocking: `s:<band_idx>:<band_val>` over 4 bands
    * of the vote-signature (pigeonhole: signatures within Hamming ≤3
    * share ≥1 exact band). Same (id, block_key) contract as
    * [[minHashBlocks]]/[[fusedBlocks]]; null-text docs carry no keys
    * (simHashSignatures drops the NULL shingle), so they join no
    * near-dup relation, as everywhere else. */
  def simHashBlocks(idCol: String, textCol: String, shingleN: Int = 3,
      portable: Boolean = false)(df: DataFrame): DataFrame = {
    val nBits = if (portable) 60 else 64
    val bandBits = nBits / 4
    val mask = (1L << bandBits) - 1
    Dedup.simHashSignatures(df, idCol, textCol, shingleN, portable)
      .select(col(idCol), posexplode(array((0 until 4).map(b =>
        shiftright(col("simhash"), b * bandBits).bitwiseAND(lit(mask))): _*)))
      .select(col(idCol), concat_ws(":", lit("s"), col("pos"),
        col("col")).as("block_key"))
  }

  /** Multimodal fused blocking: text MinHash bands ∪ image hyperplane
    * buckets (`i:<bucket>` over [[Multimodal.withFeatures]] embeddings)
    * — a pair is a candidate when EITHER modality collides, catching
    * same-image-rewritten-text AND same-text-reencoded-image dups. */
  def fusedBlocks(idCol: String, textCol: String, binCol: String,
      dim: Int, shingleN: Int = 3, numHashes: Int = 16, bands: Int = 4,
      nBits: Int = 8, seed: Long = 42L, planeSeed: Long = 7L,
      portable: Boolean = false)(df: DataFrame): DataFrame = {
    // hyperplaneBucket builds on the registered vector-dot expression;
    // register here like every Similarity entry point does, so fused
    // blocking works in a fresh session (not just after some other
    // vector operator happened to run first)
    graft.functions.VectorFunctions.register(df.sparkSession)
    val text = minHashBlocks(idCol, textCol, shingleN, numHashes,
      bands, seed, portable)(df)
    val img = Multimodal.withFeatures(df.select(col(idCol), col(binCol)),
        binCol, dim)
      // null-payload docs must join no near-dup relation (NullTextSpec
      // pins the same rule for text): without this filter they'd all
      // land in hyperplane bucket 0 (NULL projections take the
      // `otherwise` branch bit by bit) and spuriously collide
      .filter(col("features").isNotNull)
      .select(col(idCol), concat(lit("i:"),
        Similarity.hyperplaneBucket(col("features"), dim, nBits,
          planeSeed).cast("string")).as("block_key"))
    text.union(img)
  }

  /** The ingest step over an ALREADY-BLOCKED batch: `blocks` must be
    * the (id, block_key) relation of exactly `batch`'s docs, already
    * durable (scratch table / index partition) since the plan consumes
    * it three times. Shared verbatim by the streaming ingester (via
    * [[processBatch]], which blocks + scratch-materializes the arriving
    * batch) and the batch fold (which blocks the whole corpus ONCE and
    * slices — same per-doc keys, one materialization instead of one
    * per batch). Returns (novel docs, their block keys), both lazy. */
  def processBlockedBatch(batch: DataFrame, blocks: DataFrame,
      index: Option[DataFrame], idCol: String)
      : (DataFrame, DataFrame) = {
    val dupIds = dupIdsOf(blocks, index, idCol)
    val novel = batch.join(dupIds, Seq(idCol), "left_anti")
    (novel, blocks.join(dupIds, Seq(idCol), "left_anti"))
  }

  /** The duplicate-id set of an already-blocked batch: ids sharing a
    * block key with a smaller-id batch doc or with any indexed doc.
    * Lazy — callers that consume it more than once should materialize
    * it first. */
  private def dupIdsOf(blocks: DataFrame, index: Option[DataFrame],
      idCol: String): DataFrame = {
    val withinDup = blocks.alias("x").join(blocks.alias("y"),
        col("x.block_key") === col("y.block_key") &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"y.$idCol").as(idCol))
    (index match {
      case Some(ix) =>
        withinDup.union(
          blocks.alias("n").join(ix.alias("ix"), Seq("block_key"))
            .select(col(s"n.$idCol").as(idCol)))
      case None => withinDup
    }).distinct()
  }

  /** One ingest step: deduplicate `batch` within itself and against
    * `index` ((id, block_key) rows of all previously admitted docs;
    * None on the first batch). Returns (novel docs, their block keys)
    * — both lazy scans over a scratch-materialized blocking of the
    * batch, nothing left pinned.
    *
    * The duplicate-id set is scratch-materialized too: the ingest call
    * sites WRITE both returned frames, and a lazy dup set would re-run
    * the batch self-join + index probe — the expensive part, corpus-
    * keyed at scale — once per write instead of once per batch
    * (measured ~0.3 s/batch of pure recompute at sf0.1; at a real
    * index size it is the dominant cost, doubled). The tiny id table
    * is freed by the same per-batch `Lifecycle.release(novelBlocks)`
    * the call sites already run (both outputs scan it). */
  def processBatch(batch: DataFrame, index: Option[DataFrame],
      idCol: String, blockRows: DataFrame => DataFrame)
      : (DataFrame, DataFrame) = {
    val blocks = Lifecycle.materializeToScratch(blockRows(batch))
    val dupIds = Lifecycle.materializeToScratch(
      dupIdsOf(blocks, index, idCol))
    (batch.join(dupIds, Seq(idCol), "left_anti"),
      blocks.join(dupIds, Seq(idCol), "left_anti"))
  }

  /** Index child directories by prefix, via the Hadoop FileSystem of
    * `indexPath` — NOT java.io.File, so the index works on any scheme
    * (HDFS/S3/file:) exactly as the object doc promises. Returns
    * (numeric suffix, fully-qualified path) pairs. */
  private def listIndexDirs(spark: SparkSession, indexPath: String,
      prefix: String): Seq[(Long, org.apache.hadoop.fs.Path)] = {
    val p = new org.apache.hadoop.fs.Path(indexPath)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(prefix))
      .flatMap { s =>
        // fully-numeric suffixes ONLY: a stray `gen=2.bak` or
        // `ingest_batch=3-copy` (manual backup, tool litter) must read
        // as "not ours", not throw NumberFormatException and wedge
        // every readIndex/compactIndex under it
        val suffix = s.getPath.getName.stripPrefix(prefix)
        scala.util.Try(suffix.toLong).toOption
          .filter(_ => suffix.nonEmpty && suffix.forall(_.isDigit))
          .map(n => (n, s.getPath))
      }
  }

  /** Our own commit marker, written AFTER a generation's parquet job
    * finishes and BEFORE covered partitions are deleted. Deliberately
    * not `_SUCCESS`: deployments commonly disable Spark's marker on
    * object stores (`mapreduce.fileoutputcommitter.marksuccessfuljobs=
    * false`), and trusting a marker that might be configured away would
    * turn every committed generation invisible — compaction would then
    * delete the covered partitions and silently lose the index. Either
    * marker is accepted on read (generations written before this marker
    * existed carry only `_SUCCESS`). */
  private val CommitMarker = "_GRAFT_COMMITTED"

  private def markCommitted(fs: org.apache.hadoop.fs.FileSystem,
      genDir: org.apache.hadoop.fs.Path): Unit =
    fs.create(new org.apache.hadoop.fs.Path(genDir, CommitMarker), true)
      .close()

  /** `gen=` directories whose commit finished (our marker or Spark's
    * `_SUCCESS`). A crash mid-compaction leaves a TORN generation;
    * reading it would shadow the still-present batch partitions it
    * claims to cover — either wedging the stream on a _temporary-only
    * dir or silently admitting duplicates from a partial key set.
    * Readers and the covered-boundary computation use only committed
    * generations; torn ones are invisible (and get overwritten or
    * reclaimed by the next compaction, which lists ALL gen dirs for
    * deletion). */
  private def filterCommitted(spark: SparkSession,
      gens: Seq[(Long, org.apache.hadoop.fs.Path)])
      : Seq[(Long, org.apache.hadoop.fs.Path)] =
    if (gens.isEmpty) gens
    else {
      val fs = gens.head._2.getFileSystem(spark.sessionState.newHadoopConf())
      gens.filter { case (_, p) =>
        fs.exists(new org.apache.hadoop.fs.Path(p, CommitMarker)) ||
          fs.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS")) }
    }

  private def committedGens(spark: SparkSession, path: String)
      : Seq[(Long, org.apache.hadoop.fs.Path)] =
    filterCommitted(spark, listIndexDirs(spark, path, "gen="))

  /** Retraction (takedown) support: real corpora DELETE documents, and
    * an admitted-key index that only grows would keep blocking
    * near-dups of content that is gone. [[retract]] writes the ids as a
    * numbered `tombstone=<k>` partition next to the index/corpus
    * partitions; [[readIndex]]/[[readCorpus]] anti-join every committed
    * tombstone, and [[compactIndex]]/[[compactOutput]] fold generations
    * WITHOUT the tombstoned rows, so retracted data physically leaves
    * the storage at the next compaction. Tombstone partitions
    * themselves are retained (they are id-only and tiny): a live
    * un-compacted batch partition may still carry a tombstoned row, so
    * dropping the marker would resurrect it — the read-side filter is
    * the invariant, compaction is the space reclaim. Same commit-marker
    * discipline as generations: a torn tombstone write is invisible to
    * readers, and the next retract (max committed + 1) overwrites it. */
  def retract(spark: SparkSession, path: String, ids: DataFrame,
      idCol: String): Long = {
    val k = filterCommitted(spark, listIndexDirs(spark, path, "tombstone="))
      .map(_._1).maxOption.map(_ + 1).getOrElse(0L)
    val dir = new org.apache.hadoop.fs.Path(s"$path/tombstone=$k")
    ids.select(col(idCol)).distinct()
      .write.mode("overwrite").parquet(dir.toString)
    markCommitted(dir.getFileSystem(spark.sessionState.newHadoopConf()), dir)
    k
  }

  /** All committed tombstoned ids under `path` (single id column named
    * as at [[retract]] time); None when nothing was ever retracted. */
  def readTombstones(spark: SparkSession, path: String)
      : Option[DataFrame] =
    readTombstonesRaw(spark, path).map(_.distinct())

  /** [[readTombstones]] without the distinct: each tombstone partition
    * is already distinct at [[retract]] time, so only CROSS-partition
    * repeats (the same id retracted twice) survive here — harmless to
    * every internal consumer (LEFT ANTI ignores right-side duplicates)
    * and skipping the distinct keeps a shuffle out of every
    * tombstone-filtered read plan. */
  private def readTombstonesRaw(spark: SparkSession, path: String)
      : Option[DataFrame] = {
    val dirs = filterCommitted(spark,
      listIndexDirs(spark, path, "tombstone="))
    if (dirs.isEmpty) None
    else Some(spark.read.parquet(dirs.map(_._2.toString): _*))
  }

  /** `df` minus rows whose id appears in `path`'s tombstones (the id
    * column name is taken from the tombstone schema — whatever column
    * [[retract]] was given). */
  private def applyTombstones(spark: SparkSession, path: String,
      df: DataFrame): DataFrame =
    readTombstonesRaw(spark, path) match {
      case Some(ts) =>
        val c = ts.columns.head
        df.join(ts, df(c) === ts(c), "left_anti")
      case None => df
    }

  /** Block-key index accumulated by batches strictly below
    * `beforeBatch`; None when no batch has committed yet. Reads the
    * newest generation file ≤ `beforeBatch` (see [[compactIndex]]) plus
    * the per-batch partitions it does not cover, minus tombstoned ids.
    * Listing goes through the Hadoop FileSystem API, so a shared-FS
    * (`hdfs://`/`s3a://`) index path behaves identically to a local
    * one — with java.io.File listing this silently returned None on a
    * cluster and admitted every duplicate. */
  def readIndex(spark: SparkSession, indexPath: String,
      beforeBatch: Long): Option[DataFrame] = {
    val gens = committedGens(spark, indexPath)
      .filter(_._1 <= beforeBatch)
    val gen = if (gens.isEmpty) None else Some(gens.maxBy(_._1))
    val covered = gen.map(_._1).getOrElse(Long.MinValue)
    val batches = listIndexDirs(spark, indexPath, "ingest_batch=")
      .filter { case (b, _) => b >= covered && b < beforeBatch }
    val paths = (gen.toSeq ++ batches).map(_._2.toString)
    if (paths.isEmpty) None
    else Some(applyTombstones(spark, indexPath,
      spark.read.parquet(paths: _*)))
  }

  /** Compacts committed `ingest_batch=` partitions strictly below
    * `upTo` into one generation file set `gen=<upTo>`, then deletes the
    * partitions (and older generations) it covers. Retention for a
    * long-lived ingester: the index directory stays O(generations + 1)
    * instead of accumulating one small parquet dir per micro-batch
    * forever, and [[readIndex]] scans one consolidated table instead of
    * thousands of fragments. Crash-safe in the same way the ingester
    * is: the generation is written BEFORE the covered partitions are
    * deleted, and a crash between the two only leaves batch dirs that
    * `readIndex` already excludes (it reads batches from the newest
    * generation forward) — duplication and loss are both impossible.
    *
    * `upTo` must not exceed the highest committed batch id + 1: a
    * compacted batch can never be replayed (Structured Streaming only
    * replays the batch after the last checkpoint commit). The no-arg
    * overload compacts below the highest batch partition present,
    * which is always safe — every batch below it has committed. */
  def compactIndex(spark: SparkSession, indexPath: String,
      upTo: Long): Unit = {
    // sources come from COMMITTED generations only (a torn gen from a
    // crashed compaction must not supply data or move the covered
    // boundary); the deletion list below includes torn gens so they
    // are reclaimed once a new generation commits over them
    val oldGens = listIndexDirs(spark, indexPath, "gen=")
      .filter(_._1 < upTo)
    val goodGens = filterCommitted(spark, oldGens)
    val covered = goodGens.map(_._1).maxOption.getOrElse(Long.MinValue)
    val allBatches = listIndexDirs(spark, indexPath, "ingest_batch=")
      .filter(_._1 < upTo)
    // read only what the newest generation doesn't cover; batch dirs
    // BELOW it are crash leftovers readIndex already ignores — they
    // are retention-reclaimed but never re-read (no duplication)
    val batches = allBatches.filter(_._1 >= covered)
    val srcs = (goodGens.filter(_._1 == covered) ++ batches).map(_._2.toString)
    // a replayed/raced compaction whose gen=upTo already committed must
    // not re-fold (its covered sources may linger under retention grace
    // — folding them again into the SAME committed gen is wasted work,
    // and the CAS would refuse); it proceeds straight to the marks
    val dstCommitted = filterCommitted(spark,
      listIndexDirs(spark, indexPath, "gen=").filter(_._1 == upTo)).nonEmpty
    if (srcs.nonEmpty && !dstCommitted) {
      // no explicit coalesce: the scan packs small fragments into
      // ~maxPartitionBytes-sized read splits, so the write comes out
      // consolidated without a single-task bottleneck at scale
      val genDir = new org.apache.hadoop.fs.Path(s"$indexPath/gen=$upTo")
      val fs = genDir.getFileSystem(spark.sessionState.newHadoopConf())
      // conditional commit: the generation is assembled in a hidden
      // attempt (with its commit marker already inside, so it is
      // committed the instant the rename lands) and published by CAS —
      // two compactors racing gen=upTo get one winner; the loser must
      // NOT run the covered-partition delete below over sources the
      // winner's fold may not have seen. Crash before the rename
      // leaves an invisible attempt with every source intact.
      val won = graft.operators.AtomicCommit
        .publishParquet(spark, genDir.toString) { tmp =>
          // fold WITHOUT tombstoned rows: compaction is where retracted
          // data physically leaves the index (readIndex filters it out
          // until then)
          applyTombstones(spark, indexPath, spark.read.parquet(srcs: _*))
            .write.mode("overwrite").parquet(tmp)
          markCommitted(fs, new org.apache.hadoop.fs.Path(tmp))
        }
      if (!won) throw new graft.operators.ConcurrentWriteException(
        s"StreamingDedup.compactIndex: gen=$upTo at $indexPath was " +
          "published by a concurrent compactor; run one janitor per index")
    }
    // retention, not deletion ([[Retention.markSweepUnits]]): once
    // gen=upTo is committed, the covered partitions and superseded
    // generations are MARKED and swept by the next compaction or
    // [[vacuumIndex]] pass, so a reader that planned its scan against
    // the pre-fold tree keeps its files for one janitor cycle.
    // readIndex never reads below the newest committed generation, so
    // the lingering dirs are shadow-only. Runs on the replay path too
    // (dstCommitted): each pass sweeps what an earlier one marked.
    if (srcs.nonEmpty || dstCommitted) {
      val fs = new org.apache.hadoop.fs.Path(indexPath)
        .getFileSystem(spark.sessionState.newHadoopConf())
      Retention.markSweepUnits(fs, indexPath,
        oldGens.map { case (g, _) => s"gen=$g" } ++
          allBatches.map { case (b, _) => s"ingest_batch=$b" })
    }
  }

  /** Sweep whatever an earlier [[compactIndex]] marked without folding
    * anything new — the janitor tick for an index whose ingest has gone
    * quiet. */
  def vacuumIndex(spark: SparkSession, indexPath: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(indexPath)
      .getFileSystem(spark.sessionState.newHadoopConf())
    Retention.markSweepUnits(fs, indexPath, Nil)
  }

  /** [[compactIndex]] below the highest `ingest_batch=` partition
    * present (everything below it is committed — safe with no
    * knowledge of the checkpoint). */
  def compactIndex(spark: SparkSession, indexPath: String): Unit =
    listIndexDirs(spark, indexPath, "ingest_batch=").map(_._1).maxOption
      .foreach(maxB => compactIndex(spark, indexPath, maxB))

  /** One assembly of the mixed `gen=`/`ingest_batch=` corpus layout,
    * bounded by `upTo` (exclusive; Long.MaxValue = everything): newest
    * COMMITTED generation + the live partitions it does not cover.
    * Generations carry `ingest_batch` as data; live partitions get it
    * from the directory name via basePath partition discovery. Shared
    * by [[readCorpus]] and [[compactOutput]] so the layout rules (the
    * covered boundary, the torn-generation filter, the cast) live in
    * exactly one place. */
  private def assembleCorpus(spark: SparkSession, outPath: String,
      upTo: Long): Option[DataFrame] = {
    val gens = committedGens(spark, outPath).filter(_._1 < upTo)
    val gen = if (gens.isEmpty) None else Some(gens.maxBy(_._1))
    val covered = gen.map(_._1).getOrElse(Long.MinValue)
    val batches = listIndexDirs(spark, outPath, "ingest_batch=")
      .filter { case (b, _) => b >= covered && b < upTo }
    val genDf = gen.map { case (_, p) => spark.read.parquet(p.toString)
      .withColumn("ingest_batch", col("ingest_batch").cast("long")) }
    val batchDf =
      if (batches.isEmpty) None
      else Some(spark.read.option("basePath", outPath)
        .parquet(batches.map(_._2.toString): _*)
        .withColumn("ingest_batch", col("ingest_batch").cast("long")))
    val assembled = (genDf, batchDf) match {
      case (Some(g), Some(b)) => Some(g.unionByName(b))
      case (g, b)             => g.orElse(b)
    }
    assembled.map(applyTombstones(spark, outPath, _))
  }

  /** The admitted corpus under `outPath`, whatever mix of per-batch
    * partitions and [[compactOutput]] generations is present, with the
    * `ingest_batch` column intact. None before the first commit. */
  def readCorpus(spark: SparkSession, outPath: String): Option[DataFrame] =
    assembleCorpus(spark, outPath, Long.MaxValue)

  /** Output-side analog of [[compactIndex]]: folds committed
    * `ingest_batch=` corpus partitions strictly below `upTo` into a
    * `gen=<upTo>` generation (the `ingest_batch` column is
    * materialized INTO the generation, so [[readCorpus]] is lossless),
    * then deletes what it covered. Same crash-safety argument and the
    * same replay rule: `upTo` ≤ highest committed batch id + 1. */
  def compactOutput(spark: SparkSession, outPath: String,
      upTo: Long): Unit =
    assembleCorpus(spark, outPath, upTo).foreach { df =>
      val genDir = new org.apache.hadoop.fs.Path(s"$outPath/gen=$upTo")
      val fs = genDir.getFileSystem(spark.sessionState.newHadoopConf())
      // same conditional commit as [[compactIndex]]
      val won = graft.operators.AtomicCommit
        .publishParquet(spark, genDir.toString) { tmp =>
          df.write.mode("overwrite").parquet(tmp)
          markCommitted(fs, new org.apache.hadoop.fs.Path(tmp))
        }
      if (!won) throw new graft.operators.ConcurrentWriteException(
        s"StreamingDedup.compactOutput: gen=$upTo at $outPath was " +
          "published by a concurrent compactor; run one janitor per corpus")
      // deletion covers torn generations too (assembleCorpus never
      // read them; now that a committed gen=upTo supersedes them they
      // are reclaimable litter)
      (listIndexDirs(spark, outPath, "gen=").filter(_._1 < upTo) ++
        listIndexDirs(spark, outPath, "ingest_batch=").filter(_._1 < upTo))
        .foreach { case (_, p) => fs.delete(p, true) }
    }

  /** [[compactOutput]] below the highest corpus partition present. */
  def compactOutput(spark: SparkSession, outPath: String): Unit =
    listIndexDirs(spark, outPath, "ingest_batch=").map(_._1).maxOption
      .foreach(maxB => compactOutput(spark, outPath, maxB))

  /** Streaming ingester: each micro-batch of `docs` (a streaming frame
    * with at least idCol + the columns `blockRows` reads) is
    * deduplicated per [[processBatch]]; novel docs append to `outPath`
    * and their block keys to `indexPath`, both as `ingest_batch=`
    * partitions (idempotent under replay — see object doc).
    * Restartable via `checkpointDir`; batch ids continue across
    * restarts, so the index accumulates correctly.
    *
    * `compactEvery = Some(n)` runs [[compactIndex]] every n batches
    * inside the batch hook, bounding the index directory for a
    * long-lived ingester with no external janitor. Safe at that point:
    * it compacts strictly below the CURRENT batch (all committed), and
    * if the current batch crashes before its checkpoint commit, its
    * replay reads the new generation — which covers exactly the
    * batches below it — never its own half-written partition. */
  def start(docs: DataFrame, idCol: String,
      blockRows: DataFrame => DataFrame, indexPath: String,
      outPath: String, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow(),
      compactEvery: Option[Int] = None): StreamingQuery = {
    // the per-batch scratch release below deletes every scanned root
    // under Lifecycle.scratchRoot — a durable index/output placed there
    // would be reclaimed out from under later batches and duplicates
    // silently admitted. Fail loudly instead.
    Seq("indexPath" -> indexPath, "outPath" -> outPath).foreach {
      case (what, p) =>
        require(!Lifecycle.isUnderScratchRoot(docs.sparkSession, p),
          s"$what ($p) must not live under the scratch root: " +
            "per-batch scratch release would reclaim it")
    }
    compactEvery.foreach(n => require(n > 0,
      s"compactEvery must be positive, got $n (0 would divide by zero " +
        "inside the batch hook; negative never compacts)"))
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val (novel, novelBlocks) = processBatch(batch,
          readIndex(spark, indexPath, batchId), idCol, blockRows)
        novel.write.mode("overwrite")
          .parquet(s"$outPath/ingest_batch=$batchId")
        novelBlocks.write.mode("overwrite")
          .parquet(s"$indexPath/ingest_batch=$batchId")
        // both outputs are on durable storage now — free this batch's
        // scratch-materialized blocking (novelBlocks scans it), or a
        // long-lived ingester accumulates one scratch table per
        // micro-batch until JVM exit
        Lifecycle.release(novelBlocks)
        if (compactEvery.exists(n => batchId > 0 && batchId % n == 0))
          compactIndex(spark, indexPath)
        ()
      }
      .start()
  }

  /** [[start]] with explicit text-MinHash blocking params: records
    * them as the index's shape (first use) or validates against the
    * recorded shape (restart/append) — a mismatch is refused, never
    * silently mixed. */
  def start(docs: DataFrame, idCol: String, textCol: String,
      indexPath: String, outPath: String, checkpointDir: String,
      shingleN: Int, numHashes: Int, bands: Int, seed: Long,
      portable: Boolean, trigger: Trigger): StreamingQuery = {
    val shape = recordShape(docs.sparkSession, indexPath,
      TextShape(shingleN, numHashes, bands, seed, portable))
    start(docs, idCol, minHashBlocks(idCol, textCol, shape.shingleN,
      shape.numHashes, shape.bands, shape.seed, shape.portable),
      indexPath, outPath, checkpointDir, trigger)
  }

  /** [[start]] with text blocking in the index's RECORDED shape —
    * run [[createTextIndex]] first to size it from the expected corpus;
    * an index with no recorded shape gets [[LegacyShape]] (recorded,
    * so later ingests still inherit a single shape). */
  def start(docs: DataFrame, idCol: String, textCol: String,
      indexPath: String, outPath: String, checkpointDir: String)
      : StreamingQuery = {
    val spark = docs.sparkSession
    val shape = readShape(spark, indexPath)
      .getOrElse(recordShape(spark, indexPath, LegacyShape))
    start(docs, idCol, textCol, indexPath, outPath, checkpointDir,
      shape.shingleN, shape.numHashes, shape.bands, shape.seed,
      shape.portable, trigger = Trigger.AvailableNow())
  }

  /** Batch replay of the same semantics: assign every doc a batch via
    * `batchExpr` (values 0 until nBatches), fold the batches in order
    * through [[processBlockedBatch]]. Returns (idCol, ingest_batch) of
    * the admitted docs. Streaming-vs-fold equivalence is pinned by
    * StreamingDedupSpec; the q80/q81 oracles replay this in SQL.
    *
    * Unlike the ingester — which must block each batch as it arrives —
    * the fold sees the whole corpus up front, so it blocks every batch
    * in ONE scratch materialization (per-doc blocking is
    * batch-independent: blocking a slice ≡ slicing the blocked corpus)
    * and per batch materializes only the tiny admitted-id set. That
    * replaces the 2-per-batch corpus-scale scratch writes of the naive
    * fold with one corpus write + n id writes; the index probe for
    * batch k is a key join of the blocked corpus below k against the
    * admitted ids — batch×index, never index×index, as before. */
  def incrementalDedupBlocked(docs: DataFrame, idCol: String,
      batchExpr: Column, nBatches: Int,
      blockRows: DataFrame => DataFrame): DataFrame = {
    val withB = Lifecycle.materializeToScratch(
      docs.withColumn("ingest_batch", batchExpr))
    val allBlocks = Lifecycle.materializeToScratch(
      (0 until nBatches).map { k =>
        blockRows(withB.filter(col("ingest_batch") === k))
          .withColumn("__b", lit(k))
      }.reduce(_ unionByName _))
    var admitted: Option[DataFrame] = None // materialized (idCol) sets
    (0 until nBatches).map { k =>
      val batchK = withB.filter(col("ingest_batch") === k)
      val blocksK = allBlocks.filter(col("__b") === k).drop("__b")
      val index = admitted.map(ids =>
        allBlocks.filter(col("__b") < k).drop("__b")
          .join(ids, Seq(idCol)))
      val (novel, _) = processBlockedBatch(batchK, blocksK, index, idCol)
      val novelIds = Lifecycle.materializeToScratch(
        novel.select(col(idCol)))
      admitted = Some(admitted.map(_.union(novelIds)).getOrElse(novelIds))
      batchK.join(novelIds, Seq(idCol), "left_semi")
        .select(col(idCol), col("ingest_batch"))
    }.reduce(_ union _)
  }

  /** [[incrementalDedupBlocked]] with text MinHash blocking (q80). */
  def incrementalDedup(docs: DataFrame, idCol: String, textCol: String,
      batchExpr: Column, nBatches: Int, shingleN: Int = 3,
      numHashes: Int = 16, bands: Int = 4, seed: Long = 42L,
      portable: Boolean = false): DataFrame =
    incrementalDedupBlocked(docs, idCol, batchExpr, nBatches,
      minHashBlocks(idCol, textCol, shingleN, numHashes, bands, seed,
        portable))
}
