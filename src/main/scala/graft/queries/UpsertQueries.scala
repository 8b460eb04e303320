package graft.queries

import graft.Tables
import graft.operators.{DataMix, Upsert}
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

  def all: Seq[Q] = Seq(
    Q("q63_merge_upsert", mergeOrders, Some(mergeOrdersSql)))
}
