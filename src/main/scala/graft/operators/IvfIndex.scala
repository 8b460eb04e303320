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

  /** Write the index: `path/vectors` (partitioned by cluster, norms
    * precomputed at build time so queries never recompute them) and
    * `path/medoids` (deterministic medoid-by-min-id per cluster). */
  def build(corpus: DataFrame, idCol: String, vecCol: String,
      clusterCol: String, path: String): Unit = {
    // norm builds on the registered vector-dot expression — register
    // here so build works as the first vector operation in a session
    graft.functions.VectorFunctions.register(corpus.sparkSession)
    corpus.select(col(idCol), col(vecCol), col(clusterCol),
        Similarity.norm(col(vecCol)).as("__norm"))
      .write.mode("overwrite").partitionBy(clusterCol)
      .parquet(s"$path/vectors")
    Similarity.clusterMedoids(corpus, idCol, vecCol, clusterCol)
      .write.mode("overwrite").parquet(s"$path/medoids")
  }

  final case class Index(vectors: DataFrame, medoids: DataFrame,
      idCol: String, vecCol: String, clusterCol: String)

  def load(spark: SparkSession, path: String, idCol: String,
      vecCol: String, clusterCol: String): Index =
    Index(spark.read.parquet(s"$path/vectors"),
      spark.read.parquet(s"$path/medoids"),
      idCol, vecCol, clusterCol)

  /** Multi-probe top-k against the persisted index. Routing runs on the
    * (tiny) medoid table; the probed cluster set is collected and
    * applied as a LITERAL `isin` filter so Catalyst prunes unprobed
    * partitions from the vectors scan. Results are identical to
    * [[Similarity.ivfTopKProbed]] over the same cluster assignment. */
  def topK(index: Index, queries: DataFrame, k: Int, nprobe: Int,
      queryIdCol: String = "query_id"): DataFrame = {
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
        round(Similarity.dot(col("__qvec"), col("__medoid_vec")) /
          (col("__qnorm") * col("__mnorm")), 6))
      .withColumn("__r", row_number().over(routeW))
      .filter(col("__r") <= nprobe)
      .select(col(queryIdCol), col("__qvec"), col("__qnorm"), col("__mc"))

    // literal probe set -> parquet partition pruning on the vectors scan
    val probeClusters = probed.select(col("__mc")).distinct()
      .collect().map(_.get(0))
    val c = index.vectors
      .filter(col(clusterCol).isin(probeClusters.toIndexedSeq: _*))

    val w = Window.partitionBy(col(queryIdCol))
      .orderBy(col("similarity").desc, col(idCol))
    val out = c.join(broadcast(probed),
        col("__mc") === col(clusterCol) && col(queryIdCol) =!= col(idCol))
      .withColumn("similarity",
        round(Similarity.dot(col("__qvec"), col(vecCol)) /
          (col("__qnorm") * col("__norm")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryIdCol), col(idCol).as("neighbor_id"),
        col("rank"), col("similarity"))
    // `probed` is deliberately NOT cached: routing is |queries|×|medoids|
    // broadcast work, so recomputing it once for the collect() and once
    // for the join is cheaper than leaking one pinned frame per topK
    // call in a long-lived session (IvfIndexSpec asserts zero persistent
    // RDDs remain after queries complete).
    out
  }
}
