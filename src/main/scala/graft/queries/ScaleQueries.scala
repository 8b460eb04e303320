package graft.queries

import graft.Tables
import graft.operators.{Layout, RangeJoin, Skew}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-technique coverage: operators whose point is the SHAPE of the
  * plan at 100 TB — bucketed range join (vs nested-loop) and salted
  * join (vs skewed reducers). Oracles assert the results are exactly
  * the naive formulations'.
  */
object ScaleQueries {

  /** Point-in-interval via bucketed equi-join: event values matched to
    * 25 price bands derived from nation keys (synthetic but forces a
    * genuine interval containment), aggregated per band. */
  def rangeJoinBands(s: SparkSession, d: String): DataFrame = {
    val bands = Tables.nation(s, d).select(
      col("n_nationkey").cast("long").as("band"),
      (col("n_nationkey") * 20.0).as("lo"),
      (col("n_nationkey") * 20.0 + 19.99).as("hi"))
    val joined = RangeJoin.pointInInterval(
      Tables.events(s, d), bands, "value", "lo", "hi",
      bucketWidth = 20L)
    joined.groupBy(col("band"))
      .agg(count(lit(1)).as("n_events"),
        sum(cents(col("value"))).as("value_cents"))
  }

  // NB: literals forced to DOUBLE — DuckDB parses 19.99 as DECIMAL and
  // would compute an exact bound where Spark computes the IEEE one.
  val rangeJoinBandsSql: String =
    s"""SELECT n_nationkey::BIGINT AS band, count(*) AS n_events,
       |  (sum(${sqlCents("value")}))::BIGINT AS value_cents
       |FROM events JOIN nation
       |  ON value >= n_nationkey * 20.0::DOUBLE
       | AND value <= n_nationkey * 20.0::DOUBLE + 19.99::DOUBLE
       |GROUP BY 1""".stripMargin

  /** q183: bucketed co-located join ([[Layout.bucketedWrite]]):
    * lineitem and orders written bucketed by order key into the same
    * bucket count, then joined THROUGH THE CATALOG — the join itself
    * plans with ZERO exchanges (BucketedJoinSpec pins it; only the
    * final tiny groupBy shuffles). At 100 TB the shuffle both tables
    * would otherwise pay on EVERY join is paid once at layout time —
    * the standard fact-table layout for a repeatedly-joined key. The
    * oracle is the plain join. */
  def bucketedJoinPriority(s: SparkSession, d: String): DataFrame = {
    val dir = tempWorkDir("graft_q183_")
    Layout.bucketedWrite(
      Tables.lineitem(s, d).select(col("l_orderkey"), col("l_extendedprice")),
      "graft_q183_lineitem", "l_orderkey", nBuckets = 8, path = s"$dir/l")
    Layout.bucketedWrite(
      Tables.orders(s, d).select(col("o_orderkey"), col("o_orderpriority")),
      "graft_q183_orders", "o_orderkey", nBuckets = 8, path = s"$dir/o")
    s.table("graft_q183_lineitem")
      .join(s.table("graft_q183_orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_lines"),
        sum(cents(col("l_extendedprice"))).as("price_cents"))
  }

  /** Salted fact⋈dim join: lineitem spread over (key, salt) against an
    * 8×-replicated orders dim — byte-identical results to the plain
    * join (the oracle IS the plain join). */
  def saltedJoinPriority(s: SparkSession, d: String): DataFrame = {
    val dims = Tables.orders(s, d)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    Skew.saltedJoin(Tables.lineitem(s, d), dims, "l_orderkey", n = 8)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_lines"),
        sum(cents(col("l_extendedprice"))).as("price_cents"))
  }

  val saltedJoinPrioritySql: String =
    s"""SELECT o_orderpriority, count(*) AS n_lines,
       |  (sum(${sqlCents("l_extendedprice")}))::BIGINT AS price_cents
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |GROUP BY 1""".stripMargin

  /** Adaptive variant: only keys with >3 lineitems (most orders at this
    * sf have up to 7, so both hot and cold paths carry real rows) get
    * salted/replicated; cold dim rows are never inflated. Oracle is the
    * plain join — the salting must be invisible in the result. */
  def adaptiveSaltedQty(s: SparkSession, d: String): DataFrame = {
    val dims = Tables.orders(s, d)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    Skew.adaptiveSaltedJoin(Tables.lineitem(s, d), dims, "l_orderkey",
        n = 8, hotThreshold = 3L)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_lines"),
        sum(col("l_quantity").cast("long")).as("sum_qty"))
  }

  val adaptiveSaltedQtySql: String =
    s"""SELECT o_orderpriority, count(*) AS n_lines,
       |  (sum(l_quantity::BIGINT))::BIGINT AS sum_qty
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |GROUP BY 1""".stripMargin

  /** Z-order layout audit: lineitem keyed by (l_partkey mod 512,
    * l_suppkey mod 512), Morton-interleaved into an 18-bit z key whose
    * top 5 bits name 32 quadtree blocks (`z div 2^13` — a pure
    * projection, no sort anywhere). Per-block min/max of both dims
    * demonstrates the layout guarantee file statistics pruning relies
    * on: every block is a ≤128×64 rectangle of the 512×512 key space,
    * so a predicate on EITHER dimension prunes ~7/8 of the blocks —
    * sort by one key alone and the other dimension's spans cover the
    * whole domain. The oracle replays the bit-interleave arithmetic
    * term-for-term. */
  def zorderLayout(s: SparkSession, d: String): DataFrame = {
    // ×37 (coprime to 512) spreads the small suppkey domain across the
    // full y range, so every block is populated at every sf
    val li = Tables.lineitem(s, d).select(
      pmod(col("l_partkey"), lit(512L)).as("x"),
      pmod(col("l_suppkey") * 37L, lit(512L)).as("y"))
    li.withColumn("zfile",
        shiftright(Layout.morton2(col("x"), col("y"), 9), 13))
      .groupBy(col("zfile"))
      .agg(count(lit(1)).as("n"),
        min(col("x")).as("x_min"), max(col("x")).as("x_max"),
        min(col("y")).as("y_min"), max(col("y")).as("y_max"))
  }

  val zorderLayoutSql: String = {
    val z = Layout.morton2Sql("x", "y", 9)
    s"""WITH k AS (SELECT l_partkey % 512 AS x, (l_suppkey * 37) % 512 AS y
       |  FROM lineitem),
       |z AS (SELECT x, y, ($z) >> 13 AS zfile FROM k)
       |SELECT zfile, count(*) AS n,
       |  min(x) AS x_min, max(x) AS x_max,
       |  min(y) AS y_min, max(y) AS y_max
       |FROM z GROUP BY 1""".stripMargin
  }

  /** Interval×interval overlap self-join, bucketed
    * ([[graft.operators.RangeJoin.intervalOverlap]]): per-customer
    * order "processing windows" (start = order epoch-day, span =
    * key mod 14 days) that overlap. The oracle is the NAIVE theta
    * self-join — the bucketed plan must reproduce it exactly,
    * including the emit-once-at-max(lo) dedup discipline (no
    * distinct). Same oracle pattern as the salted joins: equality
    * against the formulation Spark would otherwise nested-loop. */
  def intervalOverlapOrders(s: SparkSession, d: String): DataFrame = {
    val base = Tables.orders(s, d).select(col("o_custkey"),
        col("o_orderkey"),
        // NTZ→LTZ cast first: UTC sessions make it a reinterpretation,
        // and LTZ→long (epoch seconds) is defined — same convention as
        // Tables.events
        expr("cast(cast(o_orderdate as timestamp) as long) div 86400")
          .as("lo"))
      .withColumn("hi", col("lo") + col("o_orderkey") % 14)
    val a = base.select(col("o_custkey"), col("o_orderkey").as("key_a"),
      col("lo").as("lo_a"), col("hi").as("hi_a"))
    val b = base.select(col("o_custkey"), col("o_orderkey").as("key_b"),
      col("lo").as("lo_b"), col("hi").as("hi_b"))
    RangeJoin.intervalOverlap(a, b, "lo_a", "hi_a", "lo_b", "hi_b",
        partitionKeys = Seq("o_custkey"), bucketWidth = 16L)
      .filter(col("key_a") < col("key_b"))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_overlaps"),
        sum(least(col("hi_a"), col("hi_b")) -
          greatest(col("lo_a"), col("lo_b")) + 1L).as("overlap_days"))
  }

  val intervalOverlapOrdersSql: String =
    """WITH i AS (
      |  SELECT o_custkey, o_orderkey,
      |    CAST(epoch(o_orderdate) AS BIGINT) // 86400 AS lo,
      |    CAST(epoch(o_orderdate) AS BIGINT) // 86400 + o_orderkey % 14
      |      AS hi
      |  FROM orders)
      |SELECT a.o_custkey, count(*) AS n_overlaps,
      |  (sum(least(a.hi, b.hi) - greatest(a.lo, b.lo) + 1))::BIGINT
      |    AS overlap_days
      |FROM i a JOIN i b
      |  ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
      |  AND a.lo <= b.hi AND b.lo <= a.hi
      |GROUP BY 1""".stripMargin

  def all: Seq[Q] = Seq(
    Q("q112_zorder_layout", zorderLayout, Some(zorderLayoutSql)),
    Q("q116_interval_overlap", intervalOverlapOrders,
      Some(intervalOverlapOrdersSql)),
    Q("q35_range_join", rangeJoinBands, Some(rangeJoinBandsSql)),
    Q("q36_salted_join", saltedJoinPriority, Some(saltedJoinPrioritySql)),
    Q("q183_bucketed_join", bucketedJoinPriority,
      Some(saltedJoinPrioritySql)),
    Q("q61_adaptive_salted_join", adaptiveSaltedQty, Some(adaptiveSaltedQtySql)))
}
