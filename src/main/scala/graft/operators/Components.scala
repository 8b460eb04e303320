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
    var prevSig = labelSignature(labels)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val msgs = sym.join(labels, sym("src") === labels("node"))
        .select(col("dst").as("node"), col("component"))
      val next = labels.union(msgs)
        .groupBy(col("node")).agg(min(col("component")).as("component"))
        .localCheckpoint()
      val nextSig = labelSignature(next)
      // labels only decrease, so an unchanged (node, label) digest
      // means no label moved anywhere
      converged = nextSig == prevSig
      prevSig = nextSig
      // next is materialized (eager checkpoint): the previous round's
      // blocks are dead — free them now (GC-driven cleanup never fires
      // in practice, see Lifecycle), bounding peak storage at 2 frames
      Lifecycle.releaseLocalCheckpoint(labels)
      labels = next
      iter += 1
    }
    // final labels leave as a scratch table; every interim block frees
    val out = Lifecycle.materializeToScratch(labels)
    Lifecycle.releaseLocalCheckpoint(labels)
    sym.unpersist()
    e.unpersist()
    out
  }

  /** [[connectedComponents]] for ADVERSARIAL diameters: alternating
    * large-star / small-star contraction (Kiveris et al., "Connected
    * Components in MapReduce and Beyond", SoCC'14). Min-label
    * propagation needs diameter-many rounds — a chain of 10⁴ gradually
    * mutated documents means 10⁴ shuffles; star contraction halves
    * component height every alternation, converging in O(log² n)
    * rounds regardless of shape.
    *
    * Per round: large-star hangs every neighbor larger than the node
    * off the neighborhood minimum; small-star re-hangs the smaller
    * neighbors (and the node) off it. Both are one groupBy + one
    * join-back over the current edge set — the same two-shuffle cost
    * shape as a propagation round, but the edge set contracts toward
    * stars instead of labels creeping one hop. At fixpoint every
    * component is a star centered at its minimum; components read off
    * as each node's neighborhood minimum. Same output contract as
    * [[connectedComponents]].
    */
  def connectedComponentsStar(
      edges: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 30): DataFrame = {
    val raw = edges.select(col(srcCol).as("u"), col(dstCol).as("v"))
    // preserve the original node set: contraction may detach a node
    // from all edges once it hangs directly off its component minimum,
    // and self-loop-only nodes never enter the edge set at all
    val nodes = raw.select(col("u").as("node"))
      .union(raw.select(col("v").as("node")))
      .distinct().localCheckpoint()
    val e0 = raw.filter(col("u") =!= col("v"))
    var e = e0.union(e0.select(col("v").as("u"), col("u").as("v")))
      .distinct().localCheckpoint()

    def sym(df: DataFrame): DataFrame =
      df.filter(col("u") =!= col("v"))
        .union(df.filter(col("u") =!= col("v"))
          .select(col("v").as("u"), col("u").as("v")))
        .distinct()

    def star(cur: DataFrame, large: Boolean): DataFrame = {
      val m = cur.groupBy(col("u"))
        .agg(least(min(col("v")), first(col("u"))).as("m"))
      val joined = cur.join(m, "u")
      val hung =
        if (large) joined.filter(col("v") > col("u"))
          .select(col("v").as("u"), col("m").as("v"))
        else joined.filter(col("v") <= col("u"))
          .select(col("v").as("u"), col("m").as("v"))
          .union(m.select(col("u"), col("m").as("v")))
      sym(hung)
    }

    var iter = 0
    var stable = false
    var sig = signature(e)
    while (!stable && iter < maxIter) {
      val next = star(star(e, large = true), large = false).localCheckpoint()
      val s = signature(next)
      stable = s == sig
      sig = s
      // next is materialized — the previous round's blocks are dead
      Lifecycle.releaseLocalCheckpoint(e)
      e = next
      iter += 1
    }
    val labels = e.groupBy(col("u"))
      .agg(least(min(col("v")), first(col("u"))).as("component"))
      .select(col("u").as("node"), col("component"))
    // detached nodes (already the center or absorbed) label as themselves
    val out = Lifecycle.materializeToScratch(
      nodes.join(labels, Seq("node"), "left")
        .select(col("node"),
          coalesce(col("component"), col("node")).as("component")))
    Lifecycle.releaseLocalCheckpoint(e)
    Lifecycle.releaseLocalCheckpoint(nodes)
    out
  }

  /** Order-insensitive edge-set digest for fixpoint detection (one
    * cheap action per round, no row-wise diff join). XOR of per-edge
    * hashes: insensitive to order, no ANSI overflow (a SUM of full
    * range xxhash64 values overflows under ANSI mode). */
  private def signature(e: DataFrame): (Long, Long) = {
    val row = e.agg(count(lit(1)),
      bit_xor(xxhash64(col("u"), col("v")))).first()
    (row.getLong(0), if (row.isNullAt(1)) 0L else row.getLong(1))
  }

  private def labelSignature(labels: DataFrame): (Long, Long) = {
    val row = labels.agg(count(lit(1)),
      bit_xor(xxhash64(col("node"), col("component")))).first()
    (row.getLong(0), if (row.isNullAt(1)) 0L else row.getLong(1))
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
