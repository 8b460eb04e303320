package graft.queries

import graft.Tables
import graft.operators.Hierarchy
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hierarchy/recursion coverage (SURVEY.md §2.6 H1–H4) exercised on the
  * driver testdata: region ← nation ← customer forms a 3-level forest
  * (keys offset into disjoint id ranges), deep enough to require ≥2
  * closure iterations. Oracle: DuckDB WITH RECURSIVE.
  */
object HierarchyQueries {

  /** region(id=r), nation(id=100+n, parent=r), customer(id=10000+c,
    * parent=100+nationkey). */
  def forest(s: SparkSession, d: String): DataFrame = {
    val r = Tables.region(s, d)
      .select(col("r_regionkey").cast("long").as("id"),
        lit(null).cast("long").as("parent"))
    val n = Tables.nation(s, d)
      .select((col("n_nationkey") + 100).cast("long").as("id"),
        col("n_regionkey").cast("long").as("parent"))
    val c = Tables.customer(s, d)
      .select((col("c_custkey") + 10000).cast("long").as("id"),
        (col("c_nationkey") + 100).cast("long").as("parent"))
    r.unionByName(n).unionByName(c)
  }

  val forestSql: String =
    """SELECT r_regionkey::BIGINT AS id, NULL::BIGINT AS parent FROM region
      |UNION ALL
      |SELECT (n_nationkey + 100)::BIGINT, n_regionkey::BIGINT FROM nation
      |UNION ALL
      |SELECT (c_custkey + 10000)::BIGINT, (c_nationkey + 100)::BIGINT FROM customer""".stripMargin

  /** H1: full ancestor closure, nearest-first path per node. */
  def ancestorPath(s: SparkSession, d: String): DataFrame =
    Hierarchy.ancestorPaths(forest(s, d), "id", "parent")
      .select(col("id").as("node_id"),
        array_join(col("ancestors"), ",").as("ancestor_path"),
        col("depth").cast("long").as("depth"))

  val ancestorPathSql: String =
    s"""WITH RECURSIVE nodes AS ($forestSql),
       |anc AS (
       |  SELECT id, parent AS ancestor, 1 AS depth FROM nodes
       |  WHERE parent IS NOT NULL
       |  UNION ALL
       |  SELECT a.id, n.parent, a.depth + 1
       |  FROM anc a JOIN nodes n ON a.ancestor = n.id
       |  WHERE n.parent IS NOT NULL)
       |SELECT id AS node_id,
       |  string_agg(ancestor::VARCHAR, ',' ORDER BY depth) AS ancestor_path,
       |  max(depth)::BIGINT AS depth
       |FROM anc GROUP BY id""".stripMargin

  /** H2/A1: children collected per parent (group-to-list on the edge
    * relation), roots included with the synthetic parent 0 (H4/F5). */
  def childrenOf(s: SparkSession, d: String): DataFrame =
    forest(s, d)
      .groupBy(coalesce(col("parent"), lit(0L)).as("parent_id"))
      .agg(array_join(sort_array(collect_list(col("id"))), ",").as("children"),
        count(lit(1)).as("n_children"))

  val childrenOfSql: String =
    s"""WITH nodes AS ($forestSql)
       |SELECT coalesce(parent, 0) AS parent_id,
       |  string_agg(id::VARCHAR, ',' ORDER BY id) AS children,
       |  count(*) AS n_children
       |FROM nodes GROUP BY 1""".stripMargin

  /** Subtree aggregates: per node, the count of proper descendants and
    * the exact-cents account balance rolled up from descendant
    * customers — closure (ancestor, node) pairs joined to per-node
    * measures and grouped by ancestor. The classic "total under each
    * org-tree node" shape: one closure (depth-bounded self-joins) +
    * one keyed aggregation, instead of a per-node recursive walk. */
  def subtreeAggregates(s: SparkSession, d: String): DataFrame = {
    val measures = Tables.customer(s, d)
      .select((col("c_custkey") + 10000).cast("long").as("id"),
        cents(col("c_acctbal")).as("bal_cents"))
    val closure = Hierarchy.ancestorClosure(forest(s, d), "id", "parent")
    closure
      .join(measures, Seq("id"), "left")
      .groupBy(col("ancestor").as("node_id"))
      .agg(count(lit(1)).as("n_descendants"),
        coalesce(sum(col("bal_cents")), lit(0L)).as("subtree_bal_cents"))
  }

  val subtreeAggregatesSql: String =
    s"""WITH RECURSIVE nodes AS ($forestSql),
       |anc AS (
       |  SELECT id, parent AS ancestor, 1 AS depth FROM nodes
       |  WHERE parent IS NOT NULL
       |  UNION ALL
       |  SELECT a.id, n.parent, a.depth + 1
       |  FROM anc a JOIN nodes n ON a.ancestor = n.id
       |  WHERE n.parent IS NOT NULL),
       |m AS (SELECT (c_custkey + 10000)::BIGINT AS id,
       |        ${sqlCents("c_acctbal")} AS bal_cents
       |      FROM customer)
       |SELECT anc.ancestor AS node_id, count(*) AS n_descendants,
       |  (coalesce(sum(m.bal_cents), 0))::BIGINT AS subtree_bal_cents
       |FROM anc LEFT JOIN m ON anc.id = m.id
       |GROUP BY 1""".stripMargin

  def all: Seq[Q] = Seq(
    Q("q13_hierarchy_ancestors", ancestorPath, Some(ancestorPathSql)),
    Q("q14_hierarchy_children", childrenOf, Some(childrenOfSql)),
    Q("q74_subtree_aggregates", subtreeAggregates, Some(subtreeAggregatesSql)))
}
