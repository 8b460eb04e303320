package graft.queries

import graft.Tables
import graft.operators.{DataMix, Diff, Ivm, Upsert}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MERGE / CDC-apply coverage: a deterministic change feed — derived
  * from `orders` via the portable id-hash bucket, so DuckDB can
  * reproduce it — applied to the orders table with
  * [[graft.operators.Upsert.applyChanges]]: 10% deletes, 10% status
  * updates, 10% new-key inserts. The oracle rebuilds the merged state
  * relationally, checking delete/update/insert semantics end-to-end.
  */
object UpsertQueries {

  private val Seed = 7L

  def mergeOrders(s: SparkSession, d: String): DataFrame = {
    val base = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val bkt = DataMix.hashBucket(col("o_orderkey"), Seed)
    val deletes = base.filter(bkt < 100000)
      .select(lit("delete").as("op"), col("o_orderkey"),
        col("o_orderstatus"), col("o_totalprice"))
    val updates = base.filter(bkt >= 100000 && bkt < 200000)
      .select(lit("update").as("op"), col("o_orderkey"),
        lit("U").as("o_orderstatus"), col("o_totalprice"))
    val inserts = base.filter(bkt >= 200000 && bkt < 300000)
      .select(lit("insert").as("op"),
        (col("o_orderkey") + 1000000000L).as("o_orderkey"),
        lit("N").as("o_orderstatus"), col("o_totalprice"))
    val changes = deletes.unionByName(updates).unionByName(inserts)
    Upsert.applyChanges(base, changes, "o_orderkey")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        sum(cents(col("o_totalprice"))).as("price_cents"))
  }

  val mergeOrdersSql: String =
    s"""WITH b AS (
       |  SELECT o_orderkey, o_orderstatus, o_totalprice,
       |    ('0x'||substr(md5(o_orderkey::VARCHAR || '#$Seed'),1,15))::BIGINT
       |      % 1000000 AS bkt
       |  FROM orders),
       |merged AS (
       |  SELECT o_orderkey, o_orderstatus, o_totalprice
       |  FROM b WHERE bkt >= 200000
       |  UNION ALL
       |  SELECT o_orderkey, 'U', o_totalprice
       |  FROM b WHERE bkt >= 100000 AND bkt < 200000
       |  UNION ALL
       |  SELECT o_orderkey + 1000000000, 'N', o_totalprice
       |  FROM b WHERE bkt >= 200000 AND bkt < 300000)
       |SELECT o_orderstatus, count(*) AS n_orders,
       |  (sum(${sqlCents("o_totalprice")}))::BIGINT AS price_cents
       |FROM merged GROUP BY 1""".stripMargin

  /** Incremental view maintenance: q63's per-status aggregate, but
    * maintained by folding ONLY the change feed into the pre-built
    * aggregate ([[graft.operators.Ivm]]) — the base table is scanned
    * once to build the starting aggregate and once (keys-joined) to
    * recover old images; never rescanned for the refresh. The oracle
    * is deliberately q63's full-recompute SQL: incremental ≡ recompute
    * is the IVM contract, checked to the last cent. */
  def incrementalAgg(s: SparkSession, d: String): DataFrame = {
    val base = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"),
        cents(col("o_totalprice")).as("price_cents"))
    val bkt = DataMix.hashBucket(col("o_orderkey"), Seed)
    val deletes = base.filter(bkt < 100000)
      .select(lit("delete").as("op"), col("o_orderkey"),
        col("o_orderstatus"), col("price_cents"))
    val updates = base.filter(bkt >= 100000 && bkt < 200000)
      .select(lit("update").as("op"), col("o_orderkey"),
        lit("U").as("o_orderstatus"), col("price_cents"))
    val inserts = base.filter(bkt >= 200000 && bkt < 300000)
      .select(lit("insert").as("op"),
        (col("o_orderkey") + 1000000000L).as("o_orderkey"),
        lit("N").as("o_orderstatus"), col("price_cents"))
    val changes = deletes.unionByName(updates).unionByName(inserts)
    val agg0 = base.groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"), sum(col("price_cents")).as("price_cents"))
    Ivm.maintainSumCountAgg(agg0, base, changes, "o_orderkey", "op",
      "o_orderstatus", "n_orders", Seq("price_cents"))
  }

  /** Snapshot diff between two generations of the orders table — the
    * "new" generation is derived deterministically from the old one
    * (every 97th key removed, every 89th surviving key's price bumped
    * by exactly 1.0 — IEEE-exact on 2-decimal money — every 101st key
    * re-inserted negated as an add), so DuckDB rebuilds the identical
    * pair of snapshots and replays the classification. The result is
    * [[graft.operators.Diff.diffSummary]]: per-status counts + exact
    * key checksums. */
  def snapshotDiffOrders(s: SparkSession, d: String): DataFrame = {
    val old = Tables.orders(s, d)
    val newDf = old.filter(col("o_orderkey") % 97 =!= 0)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 89 === 0, col("o_totalprice") + lit(1.0))
          .otherwise(col("o_totalprice")))
      .unionByName(old.filter(col("o_orderkey") % 101 === 0)
        .withColumn("o_orderkey", -col("o_orderkey")))
    Diff.diffSummary(old, newDf, "o_orderkey")
  }

  val snapshotDiffOrdersSql: String =
    """WITH n AS (
      |  SELECT o_orderkey, o_custkey, o_orderstatus,
      |    CASE WHEN o_orderkey % 89 = 0 THEN o_totalprice + 1.0
      |         ELSE o_totalprice END AS o_totalprice,
      |    o_orderdate, o_orderpriority
      |  FROM orders WHERE o_orderkey % 97 <> 0
      |  UNION ALL
      |  SELECT -o_orderkey, o_custkey, o_orderstatus, o_totalprice,
      |    o_orderdate, o_orderpriority
      |  FROM orders WHERE o_orderkey % 101 = 0),
      |d AS (
      |  SELECT coalesce(o.o_orderkey, n.o_orderkey) AS k,
      |    CASE WHEN o.o_orderkey IS NULL THEN 'added'
      |         WHEN n.o_orderkey IS NULL THEN 'removed'
      |         WHEN o.o_custkey IS DISTINCT FROM n.o_custkey
      |           OR o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
      |           OR o.o_totalprice IS DISTINCT FROM n.o_totalprice
      |           OR o.o_orderdate IS DISTINCT FROM n.o_orderdate
      |           OR o.o_orderpriority IS DISTINCT FROM n.o_orderpriority
      |         THEN 'changed' ELSE 'unchanged' END AS status
      |  FROM orders o FULL OUTER JOIN n ON o.o_orderkey = n.o_orderkey)
      |SELECT status, count(*) AS n, (sum(k))::BIGINT AS key_sum
      |FROM d GROUP BY 1""".stripMargin

  def all: Seq[Q] = Seq(
    Q("q63_merge_upsert", mergeOrders, Some(mergeOrdersSql)),
    Q("q107_snapshot_diff", snapshotDiffOrders, Some(snapshotDiffOrdersSql)),
    Q("q111_incremental_agg", incrementalAgg, Some(mergeOrdersSql)))
}
