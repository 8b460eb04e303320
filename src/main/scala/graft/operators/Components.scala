package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the step that
  * turns near-duplicate PAIRS (from [[Dedup.minHashPairs]] /
  * [[Dedup.ngramJaccardPairs]] / [[Dedup.simHashPairs]]) into duplicate
  * CLUSTERS, so a curation pipeline can keep one canonical document per
  * cluster instead of reasoning about an unresolved pair soup.
  *
  * Algorithm: iterative min-label propagation. Every node starts
  * labelled with itself; each round, a node's label becomes the min of
  * its own and its neighbors' labels; at fixpoint all nodes in a
  * component share the component's smallest node id. Rounds needed =
  * graph diameter. Near-dup graphs are overwhelmingly tiny star/clique
  * clusters (diameter ≤ 2-3), so this converges in a handful of rounds;
  * for adversarial long-chain graphs the alternating large-star /
  * small-star algorithm (Kiveris et al., "Connected Components in
  * MapReduce and Beyond") bounds rounds at O(log² n) — not needed here.
  *
  * Scale: each round is one equi-join of the (symmetrized) edge list
  * against the label frame plus one min-aggregation, both shuffled on
  * the node key — the same key every round, so AQE/partitioning reuse
  * keeps data co-located. Labels only ever decrease, so the global label
  * sum is a monotone convergence witness (one cheap action per round,
  * no row-wise diff join). Each round's frame is localCheckpoint-ed:
  * like [[Hierarchy.ancestorClosure]], lineage would otherwise grow
  * O(rounds²) in plan size.
  */
object Components {

  /** @param edges undirected edge list; self-loops and duplicate /
    *              reversed edges are tolerated.
    * @return (node, component) — one row per distinct node, component =
    *         smallest node id reachable from it (nodes absent from
    *         `edges` are absent from the output; a caller wanting
    *         singleton components left-joins and coalesces to self).
    */
  def connectedComponents(
      edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 50): DataFrame = {
    // materialize the edge list BEFORE symmetrizing: the union's two
    // branches otherwise each evaluate `edges` — twice the full
    // upstream pipeline when edges come from a near-dup pair generator
    // (measured: the whole capped-Jaccard chain ran 2×)
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    e.count()
    // symmetrize once; min-propagation is insensitive to duplicates so
    // no distinct() (a full shuffle) is needed
    val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = sym.select(col("src").as("node"))
      .distinct()
      .select(col("node"), col("node").as("component"))
      .localCheckpoint()
    var prevSum = labels.agg(sum(col("component"))).first().getLong(0)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val msgs = sym.join(labels, sym("src") === labels("node"))
        .select(col("dst").as("node"), col("component"))
      val next = labels.union(msgs)
        .groupBy(col("node")).agg(min(col("component")).as("component"))
        .localCheckpoint()
      val nextSum = next.agg(sum(col("component"))).first().getLong(0)
      converged = nextSum == prevSum // labels are non-increasing, so an
      // unchanged sum means no label moved anywhere
      prevSum = nextSum
      labels = next
      iter += 1
    }
    sym.unpersist()
    e.unpersist()
    labels
  }

  /** Canonical-document selection: drop every row whose id belongs to a
    * near-dup component but is not that component's representative (the
    * smallest id). Rows never seen in `pairs` are kept — singletons are
    * their own representative. One broadcast-able anti-join when the
    * duplicate set is small relative to the corpus (the usual case). */
  def dropNearDuplicates(
      df: DataFrame, idCol: String,
      pairs: DataFrame, pairSrcCol: String = "id_a",
      pairDstCol: String = "id_b"): DataFrame = {
    val losers = connectedComponents(pairs, pairSrcCol, pairDstCol)
      .filter(col("node") =!= col("component"))
      .select(col("node").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }
}
