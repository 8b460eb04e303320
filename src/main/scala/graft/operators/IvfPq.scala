package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF-PQ composite index — the production billion-vector ANN layout:
  * a coarse k-means partitions the corpus ([[IvfIndex]]'s scan cut),
  * and each vector's RESIDUAL against its coarse centroid is
  * product-quantized ([[ProductQuant]]'s byte cut). Residual
  * quantization is where the recall comes from: residual magnitudes
  * are a fraction of the raw vectors', so the same m×k code budget
  * spends its resolution on the part of the vector the coarse cluster
  * doesn't already explain (flat PQ at m=4/k=16 measured 1.5/5 mean
  * top-5 overlap on the bench corpus; the residual variant is the
  * standard fix — Jégou et al.'s IVFADC composition, re-expressed as
  * Spark scan-side projections).
  *
  * Everything is deterministic and engine-replayable, inheriting the
  * fixed-point Lloyd trainer ([[ProductQuant.trainCodebooksLloyd]]):
  * coarse centroids = the m=1 books (q127's pinned k-means), residual
  * codebooks = the m-subspace books trained ON the residual frame, and
  * every score is the same ‖c‖² − 2⟨v,c⟩ argmin with first-minimum
  * tie-breaks. Centroids and books are driver-side literal constants
  * (KBs — the [[Similarity.hyperplanes]] pattern), so assignment,
  * residual, and encoding are pure codegen'd projections: ZERO joins
  * and ZERO shuffles on the corpus side of build.
  *
  * Layout (the [[IvfIndex]] lifecycle contract, codes instead of
  * vectors):
  * {{{
  *   path/codes/ingest_batch=N/cluster=C/   (id, __c0 … __c{m-1})
  *   path/model/centroids                   (cluster, cw)   — KBs
  *   path/model/books                       (s, code, cw)   — KBs
  * }}}
  * `cluster` is a discovered partition column, so a query's probed
  * clusters compile into a literal `cluster IN (…)` predicate and the
  * scan prunes every unprobed cluster directory — nprobe/kc of the
  * CODES (m bytes/vector at k≤256), not of the raw corpus: the two
  * scale cuts compose multiplicatively. Appends land in their own
  * `ingest_batch=N` directory with overwrite (crash-replay idempotent,
  * spec-pinned); the model is deliberately frozen across appends —
  * `build(A); append(B)` ≡ encoding A∪B under A's model, exactly the
  * fixed-medoid contract of [[IvfIndex.append]]. Retrain + rebuild on
  * drift cadence.
  */
object IvfPq {

  /** The trained model: kc coarse centroids over the full dimension +
    * m×k residual codebooks. Driver-side constants. */
  final case class Model(centroids: Seq[Array[Double]],
      books: Seq[Seq[Array[Double]]]) {
    def kc: Int = centroids.length
    def m: Int = books.length
    def k: Int = books.head.length
    def sub: Int = books.head.head.length
  }

  private def centroidsLit(cs: Seq[Array[Double]]): Column =
    array(cs.map(ProductQuant.litArray): _*)

  /** Train coarse centroids on the corpus, then residual codebooks on
    * the residual frame — two bounded driver collects, both through
    * the fixed-point Lloyd trainer, so the whole model replays
    * bit-for-bit in the oracle's unrolled CTEs. */
  def train(corpus: DataFrame, idCol: String, vecCol: String,
      kc: Int, coarseIters: Int, m: Int, k: Int, pqIters: Int,
      coarseSeedStride: Long = 1L, pqSeedStride: Long = 1L): Model = {
    graft.functions.VectorFunctions.register(corpus.sparkSession)
    val centroids = ProductQuant.trainCodebooksLloyd(
      corpus, idCol, vecCol, m = 1, k = kc, iters = coarseIters,
      seedStride = coarseSeedStride).head
    val books = ProductQuant.trainCodebooksLloyd(
      residuals(corpus, idCol, vecCol, centroids), idCol, "__rv",
      m, k, pqIters, seedStride = pqSeedStride)
    Model(centroids, books)
  }

  /** (id, cluster, __rv): assign each vector to its nearest literal
    * centroid (first-minimum argmin of ‖c‖² − 2⟨v,c⟩ — identical to
    * [[Similarity.kmeansAssign]]) and subtract that centroid
    * element-wise. Pure scan-side projection. */
  def residuals(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[Array[Double]]): DataFrame = {
    graft.functions.VectorFunctions.register(corpus.sparkSession)
    corpus
      .select(col(idCol), col(vecCol).cast("array<double>").as("__v"))
      .withColumn("cluster", ProductQuant.nearestCode(col("__v"), centroids))
      .withColumn("__cent",
        element_at(centroidsLit(centroids), col("cluster") + 1))
      .select(col(idCol), col("cluster"),
        zip_with(col("__v"), col("__cent"), (x, y) => x - y).as("__rv"))
  }

  /** (id, cluster, __c0 … __c{m-1}): the persisted row shape —
    * [[ProductQuant.encode]]'s per-subspace argmin over the RESIDUAL,
    * keeping the cluster column for partitioning. */
  def encodeAssigned(corpus: DataFrame, idCol: String, vecCol: String,
      model: Model): DataFrame = {
    val m = model.m
    val sub = model.sub
    residuals(corpus, idCol, vecCol, model.centroids)
      .select(col(idCol) :: col("cluster") :: (0 until m).map(s =>
        slice(col("__rv"), s * sub + 1, sub).as(s"__s$s")).toList: _*)
      .select(col(idCol) :: col("cluster") :: (0 until m).map(s =>
        ProductQuant.nearestCode(col(s"__s$s"), model.books(s))
          .as(s"__c$s")).toList: _*)
  }

  private def writeIncrement(batch: DataFrame, idCol: String,
      vecCol: String, model: Model, path: String, batchId: Long): Unit =
    encodeAssigned(batch, idCol, vecCol, model)
      .write.mode("overwrite").partitionBy("cluster")
      .parquet(s"$path/codes/ingest_batch=$batchId")

  /** Train on the corpus and persist model + base codes. Deletes any
    * previous codes tree first (stale increments of an older index —
    * encoded under a DIFFERENT model — must not survive). */
  def build(corpus: DataFrame, idCol: String, vecCol: String,
      kc: Int, coarseIters: Int, m: Int, k: Int, pqIters: Int,
      path: String, coarseSeedStride: Long = 1L,
      pqSeedStride: Long = 1L): Unit = {
    val spark = corpus.sparkSession
    val codesRoot = new org.apache.hadoop.fs.Path(s"$path/codes")
    val fs = codesRoot.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(codesRoot)) fs.delete(codesRoot, true)
    // stale folds/retention marks of a previous index (encoded under a
    // different model) must die with the codes tree
    GenFold.resetTrees(spark, path, s"$path/gen")
    val model = train(corpus, idCol, vecCol, kc, coarseIters, m, k,
      pqIters, coarseSeedStride, pqSeedStride)
    writeModel(spark, model, path)
    writeIncrement(corpus, idCol, vecCol, model, path, batchId = 0L)
    writeStats(spark, path, model)
  }

  /** Occupancy stats of the quantization CELLS (the distinct
    * (cluster, code…) tuples): the quantity [[topKRefined]]'s
    * auto-sizing needs, because ADC cannot rank WITHIN a cell — the
    * exact re-rank shortlist must cover the query's expected cellmates
    * (≈ n / occupied cells), not a constant (ivfpqscale measured
    * refine=10 recovering nothing at 1M where the cell population was
    * ~4000). One aggregate over the CODES (m small ints per vector —
    * ~1% of the raw corpus bytes), recomputed after build and after
    * every append so the stats always describe the whole index. */
  final case class CellStats(nVectors: Long, occupiedCells: Long) {
    def meanCellPop: Double =
      if (occupiedCells == 0) 0.0 else nVectors.toDouble / occupiedCells
  }

  private def writeStats(spark: SparkSession, path: String,
      model: Model): Unit = {
    import spark.implicits._
    val codes = readCodes(spark, path)
    val cellCols = col("cluster") +:
      (0 until model.m).map(s => col(s"__c$s"))
    val row = codes.agg(count(lit(1)).as("n"),
      count_distinct(struct(cellCols: _*)).as("cells")).head()
    Seq((row.getLong(0), row.getLong(1)))
      .toDF("n_vectors", "occupied_cells")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/model/stats")
  }

  def loadStats(spark: SparkSession, path: String): Option[CellStats] = {
    val p = new org.apache.hadoop.fs.Path(s"$path/model/stats")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) None
    else {
      val r = spark.read.parquet(s"$path/model/stats").head()
      Some(CellStats(r.getLong(0), r.getLong(1)))
    }
  }

  private def writeModel(spark: SparkSession, model: Model,
      path: String): Unit = {
    import spark.implicits._
    model.centroids.zipWithIndex
      .map { case (cw, c) => (c, cw.toSeq) }
      .toDF("cluster", "cw")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/model/centroids")
    (for ((book, s) <- model.books.zipWithIndex;
          (cw, code) <- book.zipWithIndex)
      yield (s, code, cw.toSeq))
      .toDF("s", "code", "cw")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/model/books")
  }

  def loadModel(spark: SparkSession, path: String): Model = {
    val cents = spark.read.parquet(s"$path/model/centroids")
      .orderBy(col("cluster")).collect()
      .map(r => r.getSeq[Double](1).toArray).toSeq
    val bookRows = spark.read.parquet(s"$path/model/books")
      .orderBy(col("s"), col("code")).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
    val books = bookRows.groupBy(_._1).toSeq.sortBy(_._1)
      .map(_._2.sortBy(_._2).map(_._3).toSeq)
    Model(cents, books)
  }

  /** Encode + write an increment of NEW vectors under the PERSISTED
    * model (frozen centroids + books, the fixed-medoid contract).
    * Idempotent: the increment overwrites its own `ingest_batch=`
    * directory, so a crashed-then-replayed append replaces any torn
    * partial output of the failed attempt. */
  def append(spark: SparkSession, path: String, batch: DataFrame,
      idCol: String, vecCol: String, batchId: Long): Unit = {
    require(batchId > 0,
      s"batchId must be > 0 (0 is the build's base increment), got $batchId")
    val model = loadModel(spark, path)
    writeIncrement(batch, idCol, vecCol, model, path, batchId)
    writeStats(spark, path, model)
  }

  /** Next free increment id, respecting the [[compactIncrements]]
    * boundary — covered ids are retention-reclaimed and must never be
    * reissued. */
  def nextBatchId(spark: SparkSession, path: String): Long =
    GenFold.nextBatchId(spark, s"$path/codes", s"$path/gen")

  /** Served codes: the newest committed fold + the increments it does
    * not cover ([[GenFold.readCovered]]); `cluster` stays a discovered
    * partition column on both legs, so probe pruning is unchanged. */
  private def readCodes(spark: SparkSession, path: String): DataFrame =
    GenFold.readCovered(spark, s"$path/codes", s"$path/gen")
      .getOrElse(throw new IllegalStateException(
        s"IvfPq at $path has no codes (no increments, no fold)"))

  /** IN-PLACE compaction + retention ([[GenFold.compact]]): fold
    * everything strictly below `upTo` into one committed `gen=upTo`
    * unit partitioned by cluster, mark the covered directories, and let
    * the NEXT janitor pass sweep them — one cycle of reader grace. */
  def compactIncrements(spark: SparkSession, path: String,
      upTo: Long): Unit =
    GenFold.compact(spark, path, s"$path/codes", s"$path/gen",
      n => s"codes/ingest_batch=$n", g => s"gen/gen=$g",
      upTo, Seq("cluster"))

  /** Sweep whatever an earlier [[compactIncrements]] marked — the
    * janitor tick for a quiescent index. */
  def vacuum(spark: SparkSession, path: String): Unit =
    GenFold.vacuum(spark, path)

  final case class Index(codes: DataFrame, model: Model, idCol: String,
      stats: Option[CellStats] = None)

  def load(spark: SparkSession, path: String, idCol: String): Index =
    Index(readCodes(spark, path), loadModel(spark, path),
      idCol, loadStats(spark, path))

  /** ADC top-k through the index. Per query: route to the `nprobe`
    * nearest coarse centroids (same argmin score as assignment, ties
    * to the lower cluster id), build one LUT per subspace (k dots of
    * the query's subvector against the literal book — the query side
    * stays EXACT, only the corpus is quantized), then score each coded
    * row in the probed clusters as
    *
    *   approx⟨q,v⟩ = ⟨q, centroid⟩ + Σ_s LUT_s[code_s]
    *
    * (v = centroid + residual̂, so the dot decomposes; the sum is a
    * fixed left-to-right chain, engine-identical). The probed cluster
    * set is collected driver-side (≤ kc ints) and applied as a literal
    * `isin`, so the codes scan partition-prunes to nprobe/kc of the
    * index — the serving shape; corpus-scale query sets belong on
    * [[IvfIndex.knnGraph]]'s shuffle path. Output:
    * (query_id, neighbor_id, rank, approx_score). */
  def topK(index: Index, queries: DataFrame, vecCol: String, k: Int,
      nprobe: Int, queryIdCol: String = "query_id"): DataFrame = {
    val spark = index.codes.sparkSession
    graft.functions.VectorFunctions.register(spark)
    val model = index.model
    val m = model.m
    val sub = model.sub
    val idCol = index.idCol

    val q0 = queries
      .select(col(idCol).as(queryIdCol),
        col(vecCol).cast("array<double>").as("__qv"))
      .withColumn("__rsc",
        ProductQuant.scoreArray(col("__qv"), model.centroids))
    val routeW = Window.partitionBy(col(queryIdCol))
      .orderBy(col("__s"), col("cluster"))
    val routed = q0
      .select(col(queryIdCol) :: col("__qv") ::
        posexplode(col("__rsc")).as(Seq("cluster", "__s")) :: Nil: _*)
      .withColumn("__r", row_number().over(routeW))
      .filter(col("__r") <= nprobe)
      // exact part of the decomposed dot: ⟨q, centroid[cluster]⟩
      .withColumn("__qc", Similarity.dot(col("__qv"),
        element_at(centroidsLit(model.centroids), col("cluster") + 1)))
      .select(col(queryIdCol) :: col("cluster") :: col("__qc") ::
        (0 until m).map(s =>
          array(model.books(s).map(cw => Similarity.dot(
            slice(col("__qv"), s * sub + 1, sub),
            ProductQuant.litArray(cw))): _*).as(s"__lut$s")).toList: _*)

    val probeClusters = routed.select(col("cluster")).distinct()
      .collect().map(_.getInt(0))
    val c = index.codes
      .filter(col("cluster").isin(probeClusters.toIndexedSeq: _*))
    val w = Window.partitionBy(col(queryIdCol))
      .orderBy(col("approx_score").desc, col(idCol))
    c.join(broadcast(routed), Seq("cluster"))
      .filter(col(queryIdCol) =!= col(idCol))
      .withColumn("approx_score",
        Similarity.round6((col("__qc") +: (0 until m).map(s =>
          element_at(col(s"__lut$s"), col(s"__c$s") + 1))).reduce(_ + _)))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryIdCol), col(idCol).as("neighbor_id"),
        col("rank"), col("approx_score"))
  }

  /** ADC shortlist → EXACT re-rank — the "+R" of IVFADC+R, and where
    * serving recall actually comes from: ADC ties/errors are bounded
    * by the quantization CELL, so the true top-k is recoverable once
    * the shortlist covers the query's cellmates — size `k·refine` to
    * ≳ n/(k_code-cells actually occupied), i.e. the expected cell
    * population, not a constant (ivfpqscale measured the failure:
    * with ~4000 cellmates at 1M, refine=10 recovered nothing and
    * refine=400 recovers the neighborhood — still a 0.4%-of-corpus
    * exact rescore, ~250× cheaper than brute force). The shortlist
    * (k·refine rows per query — bounded) broadcasts into ONE
    * candidate-pruned scan of the raw corpus; exact 6-dp cosines
    * re-rank it. Output shape = [[Similarity.bruteForceTopK]]
    * (query_id, neighbor_id, rank, similarity), so refined results
    * drop into every recall harness unchanged. */
  /** Auto-sizing rule for the refine factor: shortlist k·refine must
    * reach the index's mean cell population. */
  def autoRefine(stats: CellStats, k: Int): Int =
    math.max(1, math.ceil(stats.meanCellPop / k).toInt)

  /** @param refine exact-rerank shortlist factor (shortlist =
    *   k·refine). `<= 0` (the DEFAULT) auto-sizes from the index's
    *   persisted cell stats via [[autoRefine]] — a 10× corpus under a
    *   frozen model densifies its cells 10× and the shortlist grows
    *   with it (spec-pinned); pass an explicit factor only for pinned
    *   external replays. Auto requires an index built/appended by this
    *   version (stats present). */
  def topKRefined(index: Index, corpus: DataFrame, queries: DataFrame,
      vecCol: String, k: Int, nprobe: Int, refine: Int = -1,
      queryIdCol: String = "query_id"): DataFrame = {
    val refineEff =
      if (refine >= 1) refine
      else index.stats match {
        case Some(st) => autoRefine(st, k)
        case None => throw new IllegalArgumentException(
          "topKRefined: refine <= 0 requests auto-sizing, but the index " +
            "has no model/stats table — rebuild (or append once) with " +
            "this version, or pass an explicit refine factor")
      }
    topKRefinedExplicit(index, corpus, queries, vecCol, k, nprobe,
      refineEff, queryIdCol)
  }

  private def topKRefinedExplicit(index: Index, corpus: DataFrame,
      queries: DataFrame, vecCol: String, k: Int, nprobe: Int,
      refine: Int, queryIdCol: String): DataFrame = {
    require(refine >= 1, s"refine $refine")
    val idCol = index.idCol
    graft.functions.VectorFunctions.register(corpus.sparkSession)
    val shortlist = topK(index, queries, vecCol, k * refine, nprobe,
        queryIdCol)
      .select(col(queryIdCol), col("neighbor_id"))
    val qv = broadcast(queries.select(col(idCol).as(queryIdCol),
      col(vecCol).cast("array<double>").as("__qv")))
    val cand = corpus
      .select(col(idCol), col(vecCol).cast("array<double>").as("__cv"))
      .join(broadcast(shortlist), col(idCol) === col("neighbor_id"))
    val w = Window.partitionBy(col(queryIdCol))
      .orderBy(col("similarity").desc, col("neighbor_id"))
    cand.join(qv, Seq(queryIdCol))
      .withColumn("similarity",
        Similarity.round6(Similarity.cosine(col("__qv"), col("__cv"))))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryIdCol), col("neighbor_id"), col("rank"),
        col("similarity"))
  }
}
