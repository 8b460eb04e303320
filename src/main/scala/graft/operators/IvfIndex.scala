package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted IVF index: the production ANN lifecycle — build once,
  * query many times. `build` writes the corpus PARTITIONED BY CLUSTER
  * on disk with norms precomputed, plus a small medoid routing table;
  * `topK` routes each query to its `nprobe` nearest medoids and then
  * scans ONLY those clusters' files — the cluster filter is applied as
  * a literal predicate, so it prunes at the parquet-partition level
  * (the scan never opens unprobed clusters, which at 100 TB is the
  * difference between reading nprobe/nclusters of the corpus and all
  * of it). [[Similarity.ivfTopKProbed]] computes the same answer from
  * an unindexed frame; this module trades a one-off write for
  * scan-fraction queries.
  */
object IvfIndex {

  /** Write the index: `path/vectors/ingest_batch=0` (partitioned by
    * cluster, norms precomputed at build time so queries never
    * recompute them) and `path/medoids` (deterministic medoid-by-min-id
    * per cluster). The `ingest_batch=` level exists for [[append]]:
    * each increment is its own partition directory, so a replayed
    * increment overwrites itself instead of duplicating (the same
    * idempotency contract as StreamingDedup's on-disk index), and the
    * cluster stays a discovered partition column underneath it, so
    * probe-time pruning is untouched. A rebuild deletes the whole
    * vectors tree first — stale increments of a previous index must not
    * survive into the new one. */
  def build(corpus: DataFrame, idCol: String, vecCol: String,
      clusterCol: String, path: String): Unit = {
    // norm builds on the registered vector-dot expression — register
    // here so build works as the first vector operation in a session
    graft.functions.VectorFunctions.register(corpus.sparkSession)
    val spark = corpus.sparkSession
    val vecRoot = new org.apache.hadoop.fs.Path(s"$path/vectors")
    val fs = vecRoot.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(vecRoot)) fs.delete(vecRoot, true)
    // stale folds and retention marks of a previous index must die too
    GenFold.resetTrees(spark, path, s"$path/gen")
    writeIncrement(corpus, idCol, vecCol, clusterCol, path, batchId = 0L)
    Similarity.clusterMedoids(corpus, idCol, vecCol, clusterCol)
      .write.mode("overwrite").parquet(s"$path/medoids")
  }

  /** √n default cluster count: within-cluster scan work is quadratic
    * in cell population, so a FIXED cluster count is a scale cliff —
    * 10× vectors at fixed k = 10× denser cells = ~100× within-cell
    * pairs (measured 15.3× wall at 10× data in r9's sf1.0 audit). At
    * k = ⌈√n⌉ both the routing table and the mean cell population grow
    * as √n — the classic IVF balance — and a 10× corpus gets ~3.16×
    * clusters (spec-pinned). */
  def adaptiveClusterCount(n: Long): Int =
    math.max(1, math.ceil(math.sqrt(math.max(0L, n).toDouble)).toInt)

  /** [[build]] without a label column: coarse clusters come from
    * [[Similarity.kmeansAssign]] (deterministic Lloyd over the corpus
    * itself), completing the unsupervised IVF lifecycle —
    * train → assign → partition-by-cluster → medoid routing. Appends
    * route new vectors through the persisted medoids as before.
    *
    * `k <= 0` (the DEFAULT) sizes the cluster count adaptively via
    * [[adaptiveClusterCount]] from one corpus count; pass an explicit
    * k only for pinned external replays (the q83/q127 oracles). The
    * chosen shape is recorded in `path/meta` (n_vectors, n_clusters,
    * adaptive flag) so an operator reading the index can audit how it
    * was sized. */
  def buildUnsupervised(corpus: DataFrame, idCol: String, vecCol: String,
      iters: Int, path: String, k: Int = -1): Unit = {
    val spark = corpus.sparkSession
    val (kEff, adaptive) =
      if (k > 0) (k, false)
      else (adaptiveClusterCount(corpus.count()), true)
    build(Similarity.kmeansAssign(corpus, idCol, vecCol, kEff, iters),
      idCol, vecCol, "cluster", path)
    import spark.implicits._
    Seq((corpus.count(), kEff.toLong, adaptive))
      .toDF("n_vectors", "n_clusters", "adaptive")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  private def writeIncrement(batch: DataFrame, idCol: String,
      vecCol: String, clusterCol: String, path: String,
      batchId: Long): Unit =
    batch.select(col(idCol), col(vecCol), col(clusterCol),
        Similarity.norm(col(vecCol)).as("__norm"))
      .write.mode("overwrite").partitionBy(clusterCol)
      .parquet(s"$path/vectors/ingest_batch=$batchId")

  /** Append an increment into the existing index WITHOUT rebuilding:
    * the daily-embedding-drop shape (the ANN analog of what
    * StreamingDedup does for text). The batch must carry the same
    * cluster assignment column the index was built with — route
    * unassigned vectors through [[routeToMedoids]] first. Medoids are
    * deliberately NOT touched (fixed-medoid append keeps
    * `build(A); append(B)` ≡ `build(A ∪ B)` exactly, for the same
    * assignments); run [[refreshMedoids]] on whatever cadence drift
    * warrants.
    *
    * Idempotent by construction: the increment lands in its own
    * `ingest_batch=<id>` partition directory with overwrite, so a
    * crashed-then-replayed append replaces its own torn output,
    * including partial cluster subdirectories of the failed attempt
    * (crash-replay case pinned in IvfIndexSpec). */
  def append(spark: SparkSession, path: String, batch: DataFrame,
      idCol: String, vecCol: String, clusterCol: String,
      batchId: Long): Unit = {
    require(batchId > 0,
      s"batchId must be > 0 (0 is the build's base increment), got $batchId")
    graft.functions.VectorFunctions.register(spark)
    writeIncrement(batch, idCol, vecCol, clusterCol, path, batchId)
  }

  /** Next free increment id: max existing `ingest_batch=` + 1 (1 right
    * after [[build]]), respecting the [[compactIncrements]] boundary —
    * covered ids are retention-reclaimed and must never be reissued.
    * Drives the resume-after-crash loop: a caller that persists nothing
    * can re-derive where to continue. */
  def nextBatchId(spark: SparkSession, path: String): Long =
    GenFold.nextBatchId(spark, s"$path/vectors", s"$path/gen")

  /** Served vectors: the newest committed fold + the increments it does
    * not cover ([[GenFold.readCovered]]); `cluster` stays a discovered
    * partition column on both legs, so probe pruning is unchanged. */
  private def readVectors(spark: SparkSession, path: String): DataFrame =
    GenFold.readCovered(spark, s"$path/vectors", s"$path/gen")
      .getOrElse(throw new IllegalStateException(
        s"IvfIndex at $path has no vectors (no increments, no fold)"))

  /** IN-PLACE compaction + retention for a forever-appended index
    * ([[GenFold.compact]]): fold everything strictly below `upTo` into
    * one committed `gen=upTo` unit (still partitioned by the cluster
    * column — probe pruning reads the fold exactly like an increment),
    * mark the covered directories, and let the NEXT pass sweep them —
    * one janitor cycle of reader grace. */
  def compactIncrements(spark: SparkSession, path: String, upTo: Long,
      clusterCol: String): Unit =
    GenFold.compact(spark, path, s"$path/vectors", s"$path/gen",
      n => s"vectors/ingest_batch=$n", g => s"gen/gen=$g",
      upTo, Seq(clusterCol))

  /** Sweep whatever an earlier [[compactIncrements]] marked — the
    * janitor tick for a quiescent index. */
  def vacuum(spark: SparkSession, path: String): Unit =
    GenFold.vacuum(spark, path)

  /** Cluster-assign an increment by routing each vector to its nearest
    * existing medoid — for increments that arrive without the corpus's
    * cluster assignment. Broadcast of the (tiny) medoid table; ties
    * break on the smaller cluster id, same as topK's routing. */
  def routeToMedoids(index: Index, batch: DataFrame): DataFrame = {
    val spark = index.vectors.sparkSession
    graft.functions.VectorFunctions.register(spark)
    val (idCol, vecCol, clusterCol) = (index.idCol, index.vecCol, index.clusterCol)
    val medoids = broadcast(index.medoids
      .select(col(clusterCol).as("__mc"), col("__medoid_vec"),
        Similarity.norm(col("__medoid_vec")).as("__mnorm")))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("__route_sim").desc, col("__mc"))
    batch.join(medoids)
      .withColumn("__route_sim",
        Similarity.round6(Similarity.dot(col(vecCol), col("__medoid_vec")) /
          (Similarity.norm(col(vecCol)) * col("__mnorm"))))
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") === 1)
      .drop("__medoid_vec", "__mnorm", "__route_sim", "__r")
      .withColumnRenamed("__mc", clusterCol)
  }

  /** Recompute the medoid table from the CURRENT vectors (deterministic
    * min-id medoid per cluster, same rule as build) — the refresh
    * policy for drift after a run of appends. Small-table overwrite;
    * in-flight readers of the old medoid table re-route on their next
    * query. */
  def refreshMedoids(spark: SparkSession, path: String, idCol: String,
      vecCol: String, clusterCol: String): Unit = {
    val vectors = readVectors(spark, path)
    Similarity.clusterMedoids(vectors, idCol, vecCol, clusterCol)
      .write.mode("overwrite").parquet(s"$path/medoids")
  }

  final case class Index(vectors: DataFrame, medoids: DataFrame,
      idCol: String, vecCol: String, clusterCol: String)

  def load(spark: SparkSession, path: String, idCol: String,
      vecCol: String, clusterCol: String): Index =
    Index(readVectors(spark, path),
      spark.read.parquet(s"$path/medoids"),
      idCol, vecCol, clusterCol)

  /** Multi-probe top-k against the persisted index. Routing runs on the
    * (tiny) medoid table. Two probe-join shapes, auto-selected from the
    * Catalyst size estimate of `queries` (× nprobe fan-out) against
    * `spark.sql.autoBroadcastJoinThreshold`, overridable via
    * `broadcastProbes`:
    *
    *  - BROADCAST (query batches — the common serving shape): the probed
    *    cluster set is collected and applied as a LITERAL `isin` filter
    *    so Catalyst prunes unprobed partitions from the vectors scan,
    *    and the routed queries broadcast to the scan.
    *  - SHUFFLE (large query sets — corpus×corpus k-NN, bulk re-scoring):
    *    broadcasting the routed query relation would OOM the driver, so
    *    both sides shuffle on the cluster key instead. The driver-side
    *    pruning collect is ALSO skipped here: a corpus-scale query set
    *    probes essentially every cluster, so the collect would pay a
    *    full second routing pass to prune approximately nothing (Spark's
    *    dynamic partition pruning still prunes the partitioned scan at
    *    runtime when the probe side IS selective, with no driver round
    *    trip).
    *
    * Results are identical to [[Similarity.ivfTopKProbed]] over the same
    * cluster assignment in both shapes (join strategy never changes
    * semantics). */
  def topK(index: Index, queries: DataFrame, k: Int, nprobe: Int,
      queryIdCol: String = "query_id",
      broadcastProbes: Option[Boolean] = None): DataFrame = {
    val spark = index.vectors.sparkSession
    graft.functions.VectorFunctions.register(spark)
    val (idCol, vecCol, clusterCol) = (index.idCol, index.vecCol, index.clusterCol)

    val medoids = broadcast(index.medoids
      .select(col(clusterCol).as("__mc"), col("__medoid_vec"),
        Similarity.norm(col("__medoid_vec")).as("__mnorm")))
    val q = queries.select(col(idCol).as(queryIdCol),
      col(vecCol).as("__qvec"), Similarity.norm(col(vecCol)).as("__qnorm"))
    val routeW = Window.partitionBy(col(queryIdCol))
      .orderBy(col("__route_sim").desc, col("__mc"))
    val probed = q.join(medoids)
      .withColumn("__route_sim",
        Similarity.round6(Similarity.dot(col("__qvec"), col("__medoid_vec")) /
          (col("__qnorm") * col("__mnorm"))))
      .withColumn("__r", row_number().over(routeW))
      .filter(col("__r") <= nprobe)
      .select(col(queryIdCol), col("__qvec"), col("__qnorm"), col("__mc"))

    val threshold = spark.sessionState.conf.autoBroadcastJoinThreshold
    val useBroadcast = broadcastProbes.getOrElse {
      val estimate =
        queries.queryExecution.optimizedPlan.stats.sizeInBytes * nprobe
      threshold > 0 && estimate <= threshold
    }

    val w = Window.partitionBy(col(queryIdCol))
      .orderBy(col("similarity").desc, col(idCol))
    val joined =
      if (useBroadcast) {
        // literal probe set -> parquet partition pruning on the vectors
        // scan. `probed` is deliberately NOT cached: routing is
        // |queries|×|medoids| broadcast work, so recomputing it once for
        // the collect() and once for the join is cheaper than leaking
        // one pinned frame per topK call in a long-lived session
        // (IvfIndexSpec asserts zero persistent RDDs remain).
        val probeClusters = probed.select(col("__mc")).distinct()
          .collect().map(_.get(0))
        val c = index.vectors
          .filter(col(clusterCol).isin(probeClusters.toIndexedSeq: _*))
        c.join(broadcast(probed),
          col("__mc") === col(clusterCol) && col(queryIdCol) =!= col(idCol))
      } else {
        index.vectors.join(probed,
          col("__mc") === col(clusterCol) && col(queryIdCol) =!= col(idCol))
      }
    joined
      .withColumn("similarity",
        Similarity.round6(Similarity.dot(col("__qvec"), col(vecCol)) /
          (col("__qnorm") * col("__norm"))))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryIdCol), col(idCol).as("neighbor_id"),
        col("rank"), col("similarity"))
  }

  /** k-NN graph THROUGH the persisted index: every indexed vector → its
    * k most similar neighbors within its own cluster partition — the
    * corpus×corpus shape (dedup graphs, diversity sampling) where the
    * "query set" is the whole index and broadcasting anything query-side
    * is structurally impossible. One shuffle of the vectors on the
    * cluster key feeds a partition-local self-join; precomputed `__norm`
    * means zero norm recomputation. Results are identical to
    * [[Similarity.knnGraphBlocked]] with the cluster as the blocking
    * key (same expression tree, same rounding, same tie-break). */
  def knnGraph(index: Index, k: Int,
      maxClusterBlock: Int = 2048): DataFrame = {
    val spark = index.vectors.sparkSession
    graft.functions.VectorFunctions.register(spark)
    val (idCol, vecCol, clusterCol) = (index.idCol, index.vecCol, index.clusterCol)
    // Skew guard: pair generation is quadratic within a cluster, so one
    // hot cluster (10× the median) makes one partition do ~100× the
    // work, and AQE's skew split cannot split a join whose key IS the
    // cluster. Sub-block the join instead: a cluster of size s gets
    // B = ceil(s / maxClusterBlock) deterministic hash-blocks, the x
    // side is replicated across column-blocks and y across row-blocks,
    // and the join key becomes (cluster, rowBlock, colBlock) — the SAME
    // s² pair set, spread over B² independent tasks of bounded size.
    // Exact by construction: each (x,y) pair meets exactly once (at
    // rowBlock = block(x), colBlock = block(y)), and the final top-k
    // window re-groups on x's id across its B tasks. Normal clusters
    // get B = 1 and a single (c,0,0) block — no replication, the r5
    // plan unchanged. Sizing pass is one groupBy producing nclusters
    // rows, broadcast back onto the corpus.
    val sizes = index.vectors.groupBy(col(clusterCol))
      .agg(ceil(count(lit(1)) / maxClusterBlock).cast("int").as("__nb"))
    // `merge` hint: the corpus is by definition above any broadcast
    // threshold at scale; pinning SortMergeJoin keeps the plan identical
    // (and testable) at every SF instead of flipping to a broadcast of
    // "the whole corpus" on toy data.
    val v = index.vectors.select(col(idCol), col(vecCol),
        col(clusterCol), col("__norm"))
      .join(broadcast(sizes), clusterCol)
      .withColumn("__blk", pmod(xxhash64(col(idCol)), col("__nb")).cast("int"))
      .withColumn("__other", explode(sequence(lit(0), col("__nb") - 1)))
      .hint("merge")
    // x is the row side (its own block is the row-block, __other spans
    // column-blocks); y is the column side (mirror image).
    val scored = v.alias("x").join(v.alias("y"),
        col(s"x.$clusterCol") === col(s"y.$clusterCol") &&
          col("x.__blk") === col("y.__other") &&
          col("x.__other") === col("y.__blk") &&
          col(s"x.$idCol") =!= col(s"y.$idCol"))
      .withColumn("similarity",
        Similarity.round6(Similarity.dot(col(s"x.$vecCol"), col(s"y.$vecCol")) /
          (col("x.__norm") * col("y.__norm"))))
      .select(col(s"x.$idCol").as("id"), col(s"y.$idCol").as("neighbor_id"),
        col("similarity"))
    // Top-k extraction: for integral ids, a bounded [[graft.functions
    // .TopKAgg]] aggregation (map-side-combined heap of k per vector —
    // the pair volume never gets SORTED; the r9 window form fed a full
    // sort of all within-cluster pairs into WindowGroupLimit, which at
    // sf1.0 was ~5s of the 21s wall on 40M pairs). The similarity
    // enters the agg as its exact ppm integer (the 6-dp round makes
    // floor(s·10⁶ + 0.5) lossless) and is reconstructed by the exact
    // division ppm/10⁶ — bit-equal round trip, probe-verified
    // exceptAll-empty against the window form at sf1.0. Null
    // similarities (zero-norm vectors) map to Long.MinValue = the
    // window's NULLS LAST, and back to null on output. Non-integral
    // ids keep the window form (same rows, same order contract).
    val integralId = index.vectors.schema(idCol).dataType match {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType => true
      case _ => false
    }
    if (integralId) {
      val ppm = when(col("similarity").isNull, lit(Long.MinValue))
        .otherwise(floor(col("similarity") * 1e6 + 0.5).cast("long"))
      scored.withColumn("__ppm", ppm)
        .groupBy(col("id"))
        .agg(graft.functions.TopKAgg.topK(
          col("neighbor_id").cast("long"), col("__ppm"), k).as("__tk"))
        .select(col("id"), posexplode(col("__tk")))
        .select(col("id"),
          col("col._2").cast(index.vectors.schema(idCol).dataType)
            .as("neighbor_id"),
          (col("pos") + 1).cast("int").as("rank"),
          when(col("col._1") === Long.MinValue, lit(null))
            .otherwise(col("col._1") / 1e6).as("similarity"))
    } else {
      val w = Window.partitionBy(col("id"))
        .orderBy(col("similarity").desc, col("neighbor_id"))
      scored
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select(col("id"), col("neighbor_id"), col("rank"), col("similarity"))
    }
  }
}
