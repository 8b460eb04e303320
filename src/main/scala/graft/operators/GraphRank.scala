package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-point PageRank over an edge relation — the centrality score a
  * data-selection pass runs on the k-NN similarity graph
  * ([[Similarity.knnGraphBlocked]] / [[IvfIndex.knnGraph]]): high-rank
  * documents sit in dense semantic neighborhoods (representative —
  * keep for coverage-weighted sampling), low-rank ones are outliers
  * (candidate noise, or candidate diversity gold — either way the
  * score is the triage key).
  *
  * All arithmetic is scaled-integer: ranks live in units of
  * `1/scale`, each iteration is
  *
  *   r'(v) = scale·(den−num) div den  +  num · Σ_{u→v} (r(u) div out(u)) div den
  *
  * with `div` the floor division of non-negative longs — deterministic
  * and engine-portable, unlike float PageRank whose Σ is
  * partition-order-dependent. Floor-div truncation leaks < 1 rank unit
  * per edge per iteration (bounded, one-sided, identical in every
  * engine) — fixed-point determinism is the point; this is a ranking
  * signal, not a probability simplex. Overflow: num·Σ < 2^63 holds to
  * ~10⁸ in-edges per node at the default scale — beyond that lower
  * `scale`.
  *
  * Scale shape: the iteration is (join rank on src) → (sum by dst) →
  * (left join back to nodes) — two shuffles per iteration, both on the
  * node id; pre-partition edges and nodes by id and every iteration
  * reuses the layout shuffle-free. Iterations are UNROLLED into one
  * plan (fine for the ≤5 a ranking signal needs; a convergence loop
  * would checkpoint per iteration to cut lineage instead). Nodes are
  * the union of both endpoint sets, so sinks (out-degree 0) hold the
  * teleport floor and dangling mass is dropped rather than
  * redistributed — the common simplification, stated not hidden.
  */
object GraphRank {

  def pageRankScaled(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, scale: Long = 1000000L, dampNum: Long = 85L,
      dampDen: Long = 100L): DataFrame = {
    require(iters >= 1 && iters <= 16, s"unroll depth $iters out of range")
    val nodes = edges.select(col(srcCol).as("id"))
      .union(edges.select(col(dstCol).as("id"))).distinct()
    val outDeg = edges.groupBy(col(srcCol).as("id"))
      .agg(count(lit(1)).as("__out"))
    val e = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
      .join(outDeg.withColumnRenamed("id", "__src"), "__src")
    val teleport = (scale * (dampDen - dampNum)) / dampDen
    var r = nodes.withColumn("pr", lit(scale))
    for (_ <- 1 to iters) {
      val inSum = e.join(r.withColumnRenamed("id", "__src"), "__src")
        .select(col("__dst").as("id"), expr("pr div __out").as("__c"))
        .groupBy(col("id")).agg(sum(col("__c")).as("__in"))
      r = nodes.join(inSum, Seq("id"), "left")
        .select(col("id"),
          (lit(teleport) +
            expr(s"($dampNum * coalesce(__in, 0)) div $dampDen"))
            .as("pr"))
    }
    r
  }
}
