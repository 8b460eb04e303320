package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ancestor-closure over an adjacency (id, parent_id) relation — the
  * reference's per-row `while` parent-chase (`usnvc.py:508-515`)
  * re-expressed as a depth-bound iterative self-join: O(depth) joins
  * *total* instead of O(depth) scans *per row*.
  *
  * Scale: each iteration joins the current frontier against the (usually
  * small) edge relation; when the edge table fits in memory the join is a
  * broadcast, so the closure costs depth× map-side joins and no shuffle of
  * the frontier. Depth is bounded (16 in the reference taxonomy,
  * `d_classification_level.txt:1-17`), so plan growth stays linear; each
  * frontier is persisted to stop Catalyst re-deriving the whole lineage.
  */
object Hierarchy {

  /** @param nodes DataFrame with `idCol` (unique) and `parentCol`
    *              (nullable; null = root).
    * @return (id, ancestor, depth) — one row per (node, ancestor) pair,
    *         depth 1 = immediate parent, increasing toward the root.
    */
  def ancestorClosure(
      nodes: DataFrame,
      idCol: String,
      parentCol: String,
      maxDepth: Int = 32,
      broadcastEdges: Boolean = true): DataFrame = {
    val edges0 = nodes.select(col(idCol).as("id"), col(parentCol).as("parent"))
    val edges = if (broadcastEdges) broadcast(edges0) else edges0

    // localCheckpoint truncates each frontier's lineage: without it the
    // accumulated union-of-joins plan grows O(depth²) and the driver
    // chokes on plan analysis long before data size matters. (On a real
    // cluster with a checkpoint dir, `checkpoint()` gives the same
    // truncation with executor-failure tolerance.) The closure leaves
    // as a scratch table and every frontier's blocks free on exit —
    // checkpoint blocks are never GC-reclaimed in practice (Lifecycle).
    var frontier = edges0.filter(col("parent").isNotNull)
      .select(col("id"), col("parent").as("ancestor"), lit(1).as("depth"))
      .localCheckpoint()
    var acc = frontier
    val rounds = scala.collection.mutable.ListBuffer(frontier)
    var depth = 1
    var continue = frontier.limit(1).count() > 0
    while (continue && depth < maxDepth) {
      val next = frontier.alias("f")
        .join(edges.alias("e"), col("f.ancestor") === col("e.id"))
        .filter(col("e.parent").isNotNull)
        .select(col("f.id"), col("e.parent").as("ancestor"),
          (col("f.depth") + 1).as("depth"))
        .localCheckpoint()
      rounds += next
      continue = next.limit(1).count() > 0
      if (continue) { acc = acc.union(next); frontier = next; depth += 1 }
    }
    val out = Lifecycle.materializeToScratch(acc)
    rounds.foreach(Lifecycle.releaseLocalCheckpoint)
    out
  }

  /** Engine-native alternative: Spark 4 recursive CTE. Same output as
    * [[ancestorClosure]]; recursion runs inside the engine (no driver
    * loop, no per-level job), at the cost of less control over
    * per-level persistence. Prefer this when depth is unknown/large;
    * the iterative loop when you want level-by-level checkpoints. */
  def ancestorClosureSql(
      nodes: DataFrame,
      idCol: String,
      parentCol: String,
      maxDepth: Int = 32): DataFrame = {
    val view = s"__hier_nodes_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    nodes.select(col(idCol).as("id"), col(parentCol).as("parent"))
      .createOrReplaceTempView(view)
    // sql() analyzes EAGERLY, inlining the view's plan into the returned
    // frame — so the view can be dropped before returning (forcing
    // `analyzed` first makes that explicit) and the result stays lazy
    // and fully usable. Without the drop, every call leaked one
    // UUID-named view into the session catalog for the session's life.
    try {
      val out = nodes.sparkSession.sql(
        s"""WITH RECURSIVE anc AS (
           |  SELECT id, parent AS ancestor, 1 AS depth FROM $view
           |  WHERE parent IS NOT NULL
           |  UNION ALL
           |  SELECT a.id, n.parent, a.depth + 1
           |  FROM anc a JOIN $view n ON a.ancestor = n.id
           |  WHERE n.parent IS NOT NULL AND a.depth < $maxDepth)
           |SELECT id, ancestor, depth FROM anc""".stripMargin)
      out.queryExecution.analyzed // force view inlining before the drop
      out
    } finally nodes.sparkSession.catalog.dropTempView(view)
  }

  /** Closure folded to one row per node: nearest-first ancestor array +
    * node depth — the shape the reference nests into each document
    * (`usnvc.py:444-449`). */
  def ancestorPaths(
      nodes: DataFrame,
      idCol: String,
      parentCol: String,
      maxDepth: Int = 32): DataFrame =
    ancestorClosure(nodes, idCol, parentCol, maxDepth)
      .groupBy(col("id"))
      .agg(
        transform(array_sort(collect_list(struct(col("depth"), col("ancestor")))),
          x => x.getField("ancestor")).as("ancestors"),
        max(col("depth")).as("depth"))
}
