package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted binary-code (sign-bit) ANN index — the steady-state
  * serving form of [[Similarity.hammingTopK]], which rebuilds and
  * scratch-materializes the packed codes on EVERY call: the measured
  * codes-pass win (~6× float brute force at 1M, hamscale) only
  * materializes when the codes are a stored artifact the query reads,
  * not a per-query byproduct. This module stores them once — 1
  * bit/dimension, 1/32 of the float32 corpus bytes — under the
  * [[IvfIndex]] lifecycle contract (build / idempotent `ingest_batch=`
  * appends / crash replay / meta), and serves two ladders off them:
  *
  *  - [[topK]]: whole-index Hamming shortlist → exact rerank (the
  *    IVFADC+R shape with 3-instruction xor/popcount scoring);
  *  - [[topKProbed]]: coarse-centroid routing FIRST — the codes are
  *    partitioned by a cluster column, the probed set compiles into a
  *    literal partition-pruning predicate, and the Hamming shortlist
  *    runs only inside probed cells. Cluster pruning and bit pruning
  *    compose multiplicatively (nprobe/kc of 1/32 of the bytes) — the
  *    production "coarse quantizer + binary re-rank" ladder.
  *
  * Shortlist extraction is the bounded [[graft.functions.TopKAgg]]
  * heap, never a global sort of the |corpus|×|queries| candidate
  * volume (the q84 lesson; [[Similarity.hammingShortlist]]).
  *
  * Layout:
  * {{{
  *   path/codes/ingest_batch=N[/cluster=C]  (id, __code: array<long>)
  *   path/meta                              (dim, words, cluster_col)
  * }}}
  * `dim`/`words` live in the meta so appends ENCODE UNDER THE INDEX'S
  * SHAPE (a batch encoded at a different width would Hamming-compare
  * garbage — refused, never silent), and the cluster column name
  * records whether [[topKProbed]] is servable.
  */
object HammingIndex {

  final case class Index(codes: DataFrame, dim: Int, words: Int,
      idCol: String, clusterCol: Option[String])

  private def words(dim: Int): Int = (dim + 63) / 64

  /** Pack + persist the corpus codes as the base increment, plus the
    * meta. `clusterCol` (pre-assigned coarse cluster — k-means label,
    * [[IvfPq]] assignment) partitions the codes on disk for
    * [[topKProbed]]'s scan pruning. A rebuild deletes the whole codes
    * tree first — stale increments of a previous index must not
    * survive. */
  def build(corpus: DataFrame, idCol: String, vecCol: String, dim: Int,
      path: String, clusterCol: Option[String] = None): Unit = {
    val spark = corpus.sparkSession
    val codesRoot = new org.apache.hadoop.fs.Path(s"$path/codes")
    val fs = codesRoot.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(codesRoot)) fs.delete(codesRoot, true)
    writeIncrement(corpus, idCol, vecCol, dim, path, 0L, clusterCol,
      replay = false)
    import spark.implicits._
    Seq((dim, words(dim), clusterCol.orNull))
      .toDF("dim", "words", "cluster_col")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  private def writeIncrement(batch: DataFrame, idCol: String,
      vecCol: String, dim: Int, path: String, batchId: Long,
      clusterCol: Option[String], replay: Boolean): Unit = {
    val codes = batch.select(
      col(idCol) +: Similarity.signBits(col(vecCol), dim).as("__code") +:
        clusterCol.map(col).toSeq: _*)
    val dst = s"$path/codes/ingest_batch=$batchId"
    def write(out: String): Unit = {
      val w = codes.write.mode("overwrite")
      clusterCol.fold(w)(c => w.partitionBy(c)).parquet(out)
    }
    if (replay) write(dst) // checkpoint-serialized single writer:
    // overwriting its own (possibly torn/committed-but-unacked)
    // increment IS the exactly-once mechanism
    else if (!AtomicCommit.publishParquet(batch.sparkSession, dst)(write))
      throw new ConcurrentWriteException(
        s"HammingIndex $path: increment $batchId was published by a " +
          "concurrent writer. Batch appends must serialize batch ids " +
          "(nextBatchId is a read, not a reservation); a streaming " +
          "replay of its OWN checkpointed id should go through " +
          "graft.streaming.StreamingHammingIndex, which overwrites.")
  }

  /** Append an increment WITHOUT rebuilding — encoded under the
    * index's recorded dim (meta is authoritative; there is no caller
    * dim to get wrong). A clustered index requires the batch to carry
    * the same cluster column (route upstream —
    * [[IvfIndex.routeToMedoids]] or the coarse model's assignment).
    *
    * `replay = true` is the streaming-maintenance escape hatch: the
    * caller's batch ids come from a CHECKPOINT (single writer by
    * construction) and a replayed id must overwrite its own increment
    * — that overwrite IS the exactly-once mechanism. Batch callers
    * keep the default conditional commit: a raced increment id fails
    * loudly ([[ConcurrentWriteException]]) instead of silently
    * clobbering the other writer's codes. */
  def append(spark: SparkSession, path: String, batch: DataFrame,
      idCol: String, vecCol: String, batchId: Long,
      replay: Boolean = false): Unit = {
    require(batchId > 0,
      s"batchId must be > 0 (0 is the build's base increment), got $batchId")
    val (dim, _, clusterCol) = readMeta(spark, path)
    clusterCol.foreach(c => require(batch.columns.contains(c),
      s"clustered index $path needs the batch to carry '$c'"))
    writeIncrement(batch, idCol, vecCol, dim, path, batchId, clusterCol,
      replay)
  }

  private def listNumDirs(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path, prefix: String)
      : Seq[(Long, org.apache.hadoop.fs.Path)] =
    if (!fs.exists(root)) Nil
    else fs.listStatus(root).toSeq.filter(_.isDirectory).flatMap { s =>
      val name = s.getPath.getName
      val suffix = name.stripPrefix(prefix)
      if (name.startsWith(prefix) && suffix.nonEmpty &&
        suffix.forall(_.isDigit))
        scala.util.Try(suffix.toLong).toOption.map(n => (n, s.getPath))
      else None
    }

  private def hfs(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())

  /** The in-place compaction boundary: increments strictly below it are
    * folded into (and shadowed by) the newest COMMITTED `gen=` fold
    * under `path/gen`. Long.MinValue when never compacted in place. */
  private def coveredBoundary(spark: SparkSession, path: String)
      : (Long, Option[org.apache.hadoop.fs.Path]) = {
    val fs = hfs(spark, path)
    val committed = listNumDirs(fs,
      new org.apache.hadoop.fs.Path(s"$path/gen"), "gen=")
      .filter { case (_, p) =>
        Seq("_SUCCESS", "_GRAFT_COMMITTED").exists(m =>
          fs.exists(new org.apache.hadoop.fs.Path(p, m)))
      }
    committed.sortBy(_._1).lastOption
      .map { case (g, p) => (g, Some(p)) }
      .getOrElse((Long.MinValue, None))
  }

  /** Next free increment id (1 right after [[build]]) — the
    * resume-after-crash loop's cursor, re-derived from the directory
    * names alone. Respects the in-place compaction boundary: ids below
    * a committed fold are COVERED (their directories are reclaimed), so
    * they must never be reissued. */
  def nextBatchId(spark: SparkSession, path: String): Long = {
    val fs = hfs(spark, path)
    val maxInc = listNumDirs(fs,
      new org.apache.hadoop.fs.Path(s"$path/codes"), "ingest_batch=")
      .map(_._1).maxOption.map(_ + 1).getOrElse(0L)
    val (boundary, _) = coveredBoundary(spark, path)
    math.max(maxInc, if (boundary == Long.MinValue) 0L else boundary)
  }

  private def readMeta(spark: SparkSession, path: String)
      : (Int, Int, Option[String]) = {
    val r = spark.read.parquet(s"$path/meta").head()
    (r.getInt(0), r.getInt(1), Option(r.getString(2)))
  }

  /** The served codes: the newest committed in-place fold (if any)
    * unioned with the increments it does not cover — increments below
    * the boundary are shadowed even if their directories still exist
    * (a crash between a fold's commit and its covered-directory delete
    * must not double-serve codes). One partition-pruned scan of the
    * increment tree plus one scan of the fold. */
  private def readCodes(spark: SparkSession, path: String): DataFrame = {
    val (boundary, genDir) = coveredBoundary(spark, path)
    val fs = hfs(spark, path)
    val hasIncs = listNumDirs(fs,
      new org.apache.hadoop.fs.Path(s"$path/codes"), "ingest_batch=")
      .exists(_._1 >= boundary)
    val incDf =
      if (!hasIncs) None // all folded: the codes tree may be empty
      else Some(spark.read.parquet(s"$path/codes")
        .filter(genDir.fold(lit(true))(_ =>
          col("ingest_batch") >= boundary))
        .drop("ingest_batch"))
    val genDf = genDir.map(p => spark.read.parquet(p.toString))
    (genDf, incDf) match {
      case (Some(g), Some(i)) => g.unionByName(i)
      case (Some(g), None) => g
      case (None, Some(i)) => i
      case (None, None) => throw new IllegalStateException(
        s"HammingIndex at $path has no codes (no increments, no fold)")
    }
  }

  def load(spark: SparkSession, path: String, idCol: String): Index = {
    val (dim, w, clusterCol) = readMeta(spark, path)
    Index(readCodes(spark, path), dim, w, idCol, clusterCol)
  }

  /** IN-PLACE periodic compaction: fold the previous committed fold and
    * every increment strictly below `upTo` into `path/gen/gen=upTo`,
    * then reclaim the covered directories — [[graft.streaming
    * .StreamingDedup.compactIndex]]'s covered-boundary pattern, applied
    * to the codes tree so a long-running [[graft.streaming
    * .StreamingHammingIndex]] maintenance query doesn't accumulate one
    * directory per micro-batch until listing cost dominates (the
    * small-files death at 100 TB). Serving stays correct at EVERY
    * point: the fold is CAS-published with its commit marker inside
    * ([[AtomicCommit]]), so readers see either the old increments or
    * the committed fold that shadows them — never both, never neither.
    * Idempotent under replay and concurrent janitors: a lost CAS
    * against an already-committed identical fold proceeds straight to
    * the covered-directory reclaim. Unlike [[compact]] (rewrite to a
    * FRESH root + caller pointer swap), this never moves the serving
    * path. */
  def compactIncrements(spark: SparkSession, path: String,
      upTo: Long): Unit = {
    require(upTo > 0, s"upTo must be positive, got $upTo")
    val fs = hfs(spark, path)
    val clusterCol = readMeta(spark, path)._3
    val (boundary, genDir) = coveredBoundary(spark, path)
    val allIncs = listNumDirs(fs,
      new org.apache.hadoop.fs.Path(s"$path/codes"), "ingest_batch=")
      .filter(_._1 < upTo)
    val live = allIncs.filter(_._1 >= boundary)
    val srcs = genDir.map(_.toString).toSeq ++ live.map(_._2.toString)
    // replay/race with gen=upTo already committed: skip the re-fold and
    // proceed to the marks (sweeping an earlier pass's marks on the way)
    val dstCommitted = boundary == upTo
    if (!dstCommitted && srcs.nonEmpty &&
        (live.nonEmpty || allIncs.nonEmpty)) {
      val folded = srcs.map(p => spark.read.parquet(p))
        .map(df => if (df.columns.contains("ingest_batch"))
          df.drop("ingest_batch") else df)
        .reduce(_ unionByName _)
      val dst = s"$path/gen/gen=$upTo"
      val won = AtomicCommit.publishParquet(spark, dst) { tmp =>
        val w = folded.write.mode("overwrite")
        clusterCol.fold(w)(c => w.partitionBy(c)).parquet(tmp)
        fs.create(new org.apache.hadoop.fs.Path(tmp, "_GRAFT_COMMITTED"),
          true).close()
      }
      // a lost CAS against a COMMITTED gen=upTo is a replay or a racing
      // janitor that folded the same committed sources — proceed to the
      // reclaim; publishParquet already reclaims torn destinations
      if (!won && !Seq("_SUCCESS", "_GRAFT_COMMITTED").exists(m =>
          fs.exists(new org.apache.hadoop.fs.Path(s"$dst/$m"))))
        throw new ConcurrentWriteException(
          s"HammingIndex.compactIncrements: gen=$upTo at $path lost its " +
            "publish and the destination is not committed")
    }
    // retention, not deletion: covered increments + superseded folds
    // (torn ones too) are MARKED now and swept by the NEXT compaction
    // or [[vacuum]] pass ([[graft.streaming.Retention.markSweepUnits]])
    // — a reader that planned its scan against the pre-fold tree keeps
    // its files for one full janitor cycle. Serving correctness never
    // depended on the delete: readCodes shadows covered increments by
    // boundary predicate and ignores non-newest folds.
    if (dstCommitted || srcs.nonEmpty)
      graft.streaming.Retention.markSweepUnits(fs, path,
        allIncs.map { case (n, _) => s"codes/ingest_batch=$n" } ++
          listNumDirs(fs, new org.apache.hadoop.fs.Path(s"$path/gen"), "gen=")
            .filter(_._1 < upTo).map { case (g, _) => s"gen/gen=$g" })
  }

  /** Sweep whatever an earlier [[compactIncrements]] marked without
    * folding anything new — the standalone janitor tick for an index
    * whose ingest has gone quiet (marked directories otherwise wait for
    * the next compaction forever). */
  def vacuum(spark: SparkSession, path: String): Unit =
    graft.streaming.Retention.markSweepUnits(hfs(spark, path), path, Nil)

  /** Serve top-k off the STORED codes: pass 1 scans ⌈dim/64⌉ longs per
    * row (never a vector), shortlists per query through the bounded
    * heap; pass 2 exact-reranks the |queries|·shortlist candidates
    * against the raw corpus. Output = [[Similarity.hammingTopK]]'s
    * (query_id, neighbor_id, rank, hamming, similarity) — and, for the
    * same corpus and queries, the same ROWS: this is that operator
    * with the code build amortized into the index. */
  def topK(index: Index, corpus: DataFrame, queries: DataFrame,
      vecCol: String, k: Int, shortlist: Int,
      queryIdCol: String = "query_id"): DataFrame = {
    require(shortlist >= k,
      s"shortlist ($shortlist) must be >= k ($k) or the rerank starves")
    graft.functions.VectorFunctions.register(corpus.sparkSession)
    val idCol = index.idCol
    val qCodes = broadcast(queries.select(col(idCol).as(queryIdCol),
      Similarity.signBits(col(vecCol), index.dim).as("__qcode")))
    val cand = Similarity.hammingShortlist(
      index.codes.join(qCodes, col(queryIdCol) =!= col(idCol))
        .withColumn("hamming", Similarity.hammingDist(
          col("__qcode"), col("__code"), index.words))
        .select(col(queryIdCol), col(idCol), col("hamming")),
      queryIdCol, idCol, shortlist)
    Similarity.hammingRerank(corpus, queries, cand, idCol, vecCol, k,
      queryIdCol)
  }

  /** Hard-negative mining off the STORED codes
    * ([[Similarity.hardNegatives]] at index scale): shortlist by
    * Hamming distance among rows whose `clusterCol` value DIFFERS from
    * the anchor's (the positive/dup-cluster id), then exact-rerank the
    * shortlist. Requires an index built with the exclusion column as
    * its cluster column — the stored codes then carry the group id and
    * the on-disk layout is partitioned by it. Candidate cost is the
    * codes scan (1/32 of corpus bytes at 64-dim), never a float vector;
    * same two-pass contract as [[topK]]. Ordering-null semantics: a
    * NULL group on either side never satisfies `=!=`, so unknown
    * clusters are excluded as unprovable negatives (matches q180). */
  def topKExcluding(index: Index, corpus: DataFrame, queries: DataFrame,
      vecCol: String, k: Int, shortlist: Int,
      queryIdCol: String = "query_id"): DataFrame = {
    require(shortlist >= k,
      s"shortlist ($shortlist) must be >= k ($k) or the rerank starves")
    val exCol = index.clusterCol.getOrElse(throw
      new IllegalArgumentException("topKExcluding needs an index built " +
        "with the exclusion column as its cluster column"))
    graft.functions.VectorFunctions.register(corpus.sparkSession)
    val idCol = index.idCol
    val qCodes = broadcast(queries.select(col(idCol).as(queryIdCol),
      col(exCol).as("__qex"),
      Similarity.signBits(col(vecCol), index.dim).as("__qcode")))
    val cand = Similarity.hammingShortlist(
      index.codes.join(qCodes, col("__qex") =!= col(exCol))
        .withColumn("hamming", Similarity.hammingDist(
          col("__qcode"), col("__code"), index.words))
        .select(col(queryIdCol), col(idCol), col("hamming")),
      queryIdCol, idCol, shortlist)
    Similarity.hammingRerank(corpus, queries, cand, idCol, vecCol, k,
      queryIdCol)
  }

  /** The coarse∧binary ladder: route each query to its `nprobe`
    * nearest literal `centroids` (the SAME ‖c‖²−2⟨q,c⟩ first-minimum
    * argmin as [[IvfPq]] assignment/routing, so an index clustered by
    * that model routes consistently), collect the probed set as a
    * literal predicate — the partitioned codes scan prunes every
    * unprobed cluster directory — then Hamming-shortlist WITHIN the
    * probed cells and exact-rerank. Query cost:
    * (nprobe/kc) · (bits/32) of the corpus bytes before the rerank. */
  /** Compact an index's increments into a fresh single-increment index
    * at `dstPath` — rewrite + pointer swap, the object-store compaction
    * pattern: the destination is built from scratch (codes first, meta
    * LAST — [[load]] fails without meta, so a crashed compaction leaves
    * an invisible torn directory, never a half-index), and the caller
    * swaps which path it serves from. Increment count is what grows
    * under streaming maintenance ([[graft.streaming
    * .StreamingHammingIndex]]): every micro-batch is one directory, and
    * a thousand tiny parquet dirs tax listing + read planning; after
    * compaction the codes are one `ingest_batch=0` written at scan
    * parallelism. Codes are copied, never re-encoded — no vector
    * source needed, bit-identity guaranteed by construction. */
  def compact(spark: SparkSession, srcPath: String, dstPath: String): Unit = {
    require(srcPath != dstPath,
      "compact rewrites to a FRESH root; in-place would tear the index")
    val (dim, w, clusterCol) = readMeta(spark, srcPath)
    // readCodes: partition-derived ingest_batch already dropped (the
    // rewritten files must not carry it as data) and the read is
    // boundary-aware — the source may hold in-place folds whose covered
    // increments were reclaimed ([[compactIncrements]])
    val codes = readCodes(spark, srcPath)
    val dstRoot = new org.apache.hadoop.fs.Path(dstPath)
    val fs = dstRoot.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(dstRoot)) fs.delete(dstRoot, true)
    // the WHOLE destination index (codes + meta) is assembled in a
    // hidden attempt root and published by one conditional rename: two
    // compactors racing the same dstPath get one winner and a loud
    // loser, and a crash leaves only an invisible attempt — never a
    // half-index (load() can't even see it)
    val uuid = java.util.UUID.randomUUID().toString
    val tmpRoot = new org.apache.hadoop.fs.Path(dstRoot.getParent,
      s".attempt-${dstRoot.getName}-$uuid")
    val writer = codes.write.mode("overwrite")
    clusterCol.fold(writer)(c => writer.partitionBy(c))
      .parquet(s"$tmpRoot/codes/ingest_batch=0")
    import spark.implicits._
    Seq((dim, w, clusterCol.orNull))
      .toDF("dim", "words", "cluster_col")
      .coalesce(1).write.mode("overwrite").parquet(s"$tmpRoot/meta")
    // root-level commit marker: publishDir distinguishes a COMMITTED
    // destination (lost race — back off) from a torn crash leftover
    // (reclaim) by it
    fs.create(new org.apache.hadoop.fs.Path(tmpRoot, "_GRAFT_COMMITTED"),
      true).close()
    if (!AtomicCommit.publishDir(fs, tmpRoot, dstRoot, uuid))
      throw new ConcurrentWriteException(
        s"HammingIndex.compact: $dstPath was published by a concurrent " +
          "compactor; serve from the winner or re-target")
  }

  def topKProbed(index: Index, corpus: DataFrame, queries: DataFrame,
      vecCol: String, centroids: Seq[Array[Double]], k: Int,
      shortlist: Int, nprobe: Int,
      queryIdCol: String = "query_id"): DataFrame = {
    require(shortlist >= k,
      s"shortlist ($shortlist) must be >= k ($k) or the rerank starves")
    val clusterCol = index.clusterCol.getOrElse(throw
      new IllegalArgumentException(
        "topKProbed needs an index built with a cluster column"))
    val spark = corpus.sparkSession
    graft.functions.VectorFunctions.register(spark)
    val idCol = index.idCol
    val routeW = Window.partitionBy(col(queryIdCol))
      .orderBy(col("__s"), col("__probe"))
    val routed = queries
      .select(col(idCol).as(queryIdCol),
        col(vecCol).cast("array<double>").as("__qv"))
      .withColumn("__rsc", ProductQuant.scoreArray(col("__qv"), centroids))
      .select(col(queryIdCol) :: col("__qv") ::
        posexplode(col("__rsc")).as(Seq("__probe", "__s")) :: Nil: _*)
      .withColumn("__r", row_number().over(routeW))
      .filter(col("__r") <= nprobe)
      .select(col(queryIdCol), col("__qv"), col("__probe"))
      .withColumn("__qcode",
        Similarity.signBits(col("__qv"), index.dim))
      .select(col(queryIdCol), col("__probe"), col("__qcode"))
    val probeClusters = routed.select(col("__probe")).distinct()
      .collect().map(_.get(0))
    val cand = Similarity.hammingShortlist(
      index.codes
        .filter(col(clusterCol).isin(probeClusters.toIndexedSeq: _*))
        .join(broadcast(routed),
          col("__probe") === col(clusterCol) &&
            col(queryIdCol) =!= col(idCol))
        .withColumn("hamming", Similarity.hammingDist(
          col("__qcode"), col("__code"), index.words))
        .select(col(queryIdCol), col(idCol), col("hamming")),
      queryIdCol, idCol, shortlist)
    Similarity.hammingRerank(corpus, queries, cand, idCol, vecCol, k,
      queryIdCol)
  }
}
