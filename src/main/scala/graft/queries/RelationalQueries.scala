package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational operator coverage (SURVEY.md §2.2–§2.4, §2.7 generalized):
  * scan+filter+project, inner/left/semi/anti joins, broadcast dim joins,
  * group-by aggregation, window functions, global top-k, set ops,
  * group-to-list nesting, CASE logic. Each query has a DuckDB oracle.
  *
  * Scale notes (100 TB): every filter is a plain parquet-pushable predicate;
  * dims (region/nation/supplier/part) are broadcast so the only shuffles are
  * the keyed aggregations and the orders⋈lineitem / customer⋈orders joins,
  * which AQE plans as shuffled hash joins on the natural keys.
  */
object RelationalQueries {

  /** TPC-H Q1 analog: one wide scan, map-side partial aggregation, 6 groups.
    * At scale this is scan-bound; no join, single shuffle of 6 rows/partition. */
  def pricingSummary(s: SparkSession, d: String): DataFrame = {
    val l = Tables.lineitem(s, d)
    l.filter(col("l_shipdate") <= to_timestamp(lit("2001-09-01 00:00:00")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        asDollars(sum(cents(col("l_quantity")))).as("sum_qty"),
        asDollars(sum(cents(col("l_extendedprice")))).as("sum_base_price"),
        (sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))).cast("double") / 10000.0)
          .as("sum_disc_price"),
        (sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))) * (lit(100L) + cents(col("l_tax"))))
          .cast("double") / 1000000.0).as("sum_charge"),
        (sum(cents(col("l_quantity"))).cast("double") / count(lit(1)) / 100.0).as("avg_qty"),
        (sum(cents(col("l_extendedprice"))).cast("double") / count(lit(1)) / 100.0).as("avg_price"),
        (sum(cents(col("l_discount"))).cast("double") / count(lit(1)) / 100.0).as("avg_disc"),
        count(lit(1)).as("count_order"))
  }

  val pricingSummarySql: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  sum(${sqlCents("l_quantity")})/100.0 AS sum_qty,
       |  sum(${sqlCents("l_extendedprice")})/100.0 AS sum_base_price,
       |  sum(${sqlCents("l_extendedprice")} * (100 - ${sqlCents("l_discount")}))/10000.0 AS sum_disc_price,
       |  sum(${sqlCents("l_extendedprice")} * (100 - ${sqlCents("l_discount")}) * (100 + ${sqlCents("l_tax")}))/1000000.0 AS sum_charge,
       |  CAST(sum(${sqlCents("l_quantity")}) AS DOUBLE)/count(*)/100.0 AS avg_qty,
       |  CAST(sum(${sqlCents("l_extendedprice")}) AS DOUBLE)/count(*)/100.0 AS avg_price,
       |  CAST(sum(${sqlCents("l_discount")}) AS DOUBLE)/count(*)/100.0 AS avg_disc,
       |  count(*) AS count_order
       |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-01'
       |GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** Projection + pushed predicate: ReadSchema should show only the 5
    * referenced columns and PushedFilters the shipdate/quantity bounds. */
  def filterProject(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= to_timestamp(lit("2000-01-01 00:00:00")) &&
        col("l_quantity") >= 48.0)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_returnflag"),
        concat_ws("-", col("l_returnflag"), col("l_linestatus")).as("flag_status"))

  val filterProjectSql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag,
      |  concat_ws('-', l_returnflag, l_linestatus) AS flag_status
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '2000-01-01' AND l_quantity >= 48.0""".stripMargin

  /** TPC-H Q3 analog: selective dim filter → two shuffled joins → agg →
    * deterministic top-k (exact cents revenue breaks ties before orderkey). */
  def shippingPriority(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") < to_timestamp(lit("1998-01-01 00:00:00")))
    val l = Tables.lineitem(s, d)
      .filter(col("l_shipdate") > to_timestamp(lit("1998-01-01 00:00:00")))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))))
        .as("revenue_c4"))
      .orderBy(col("revenue_c4").desc, col("l_orderkey"))
      .limit(10)
  }

  val shippingPrioritySql: String =
    s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
       |  (sum(${sqlCents("l_extendedprice")} * (100 - ${sqlCents("l_discount")})))::BIGINT AS revenue_c4
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |WHERE c_mktsegment = 'BUILDING'
       |  AND o_orderdate < TIMESTAMP '1998-01-01'
       |  AND l_shipdate > TIMESTAMP '1998-01-01'
       |GROUP BY l_orderkey, o_orderdate, o_orderpriority
       |ORDER BY revenue_c4 DESC, l_orderkey LIMIT 10""".stripMargin

  /** EXISTS → left-semi join (SURVEY §2.3 "semi/anti variants"). */
  def semiJoinPriority(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val big = Tables.lineitem(s, d).filter(col("l_quantity") > 45.0)
      .select(col("l_orderkey"))
    o.join(big, o("o_orderkey") === big("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
  }

  val semiJoinPrioritySql: String =
    """SELECT o_orderpriority, count(*) AS order_count FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_quantity > 45.0)
      |GROUP BY o_orderpriority""".stripMargin

  /** NOT EXISTS → left-anti join (customers with no urgent orders). */
  def antiJoinCustomers(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"),
        sum(cents(col("c_acctbal"))).as("acctbal_cents"))
  }

  val antiJoinCustomersSql: String =
    s"""SELECT c_mktsegment, count(*) AS n_customers,
       |  (sum(${sqlCents("c_acctbal")}))::BIGINT AS acctbal_cents
       |FROM customer
       |WHERE NOT EXISTS (SELECT 1 FROM orders
       |                  WHERE o_custkey = c_custkey
       |                    AND o_orderpriority = '1-URGENT')
       |GROUP BY c_mktsegment""".stripMargin

  /** TPC-H Q5 analog: 5-way join; region/nation/supplier are broadcast so
    * only customer⋈orders⋈lineitem shuffle. Local-supplier predicate
    * (c_nationkey = s_nationkey) applied post-join. */
  def localSupplierVolume(s: SparkSession, d: String): DataFrame = {
    val r = Tables.region(s, d).filter(col("r_name") === "ASIA")
    val n = Tables.nation(s, d)
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
        col("o_orderdate") < to_timestamp(lit("1998-01-01 00:00:00")))
    val l = Tables.lineitem(s, d)
    val sup = Tables.supplier(s, d)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))))
        .as("revenue_c4"))
  }

  val localSupplierVolumeSql: String =
    s"""SELECT n_name,
       |  (sum(${sqlCents("l_extendedprice")} * (100 - ${sqlCents("l_discount")})))::BIGINT AS revenue_c4
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
       |JOIN nation ON s_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |WHERE r_name = 'ASIA'
       |  AND o_orderdate >= TIMESTAMP '1996-01-01'
       |  AND o_orderdate < TIMESTAMP '1998-01-01'
       |GROUP BY n_name""".stripMargin

  /** TPC-H Q6 analog: pure scan-side predicate + single global aggregate.
    * Note: double comparisons against literals are engine-portable (both
    * compare the identical stored IEEE value); only double *summation* is
    * not, hence the cents lift. */
  def forecastRevenue(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= to_timestamp(lit("1997-01-01 00:00:00")) &&
        col("l_shipdate") < to_timestamp(lit("1998-01-01 00:00:00")) &&
        col("l_discount") >= 0.02 && col("l_discount") <= 0.04 &&
        col("l_quantity") < 24.0)
      .agg((sum(cents(col("l_extendedprice")) * cents(col("l_discount"))).cast("double") / 10000.0)
        .as("revenue"),
        count(lit(1)).as("n_lines"))

  val forecastRevenueSql: String =
    s"""SELECT sum(${sqlCents("l_extendedprice")} * ${sqlCents("l_discount")})/10000.0 AS revenue,
       |  count(*) AS n_lines
       |FROM lineitem
       |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
       |  AND l_shipdate < TIMESTAMP '1998-01-01'
       |  AND l_discount BETWEEN 0.02 AND 0.04 AND l_quantity < 24.0""".stripMargin

  /** Left outer join preserving unmatched left rows (SURVEY J1/J11). */
  def leftJoinOrders(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        sum(cents(col("o_totalprice"))).as("spend_cents"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left")
      .select(col("c_custkey"), col("c_mktsegment"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("spend_cents"), lit(0L)).as("spend_cents"))
  }

  val leftJoinOrdersSql: String =
    s"""SELECT c_custkey, c_mktsegment,
       |  coalesce(n_orders, 0) AS n_orders, coalesce(spend_cents, 0) AS spend_cents
       |FROM customer LEFT JOIN (
       |  SELECT o_custkey, count(*) AS n_orders,
       |    (sum(${sqlCents("o_totalprice")}))::BIGINT AS spend_cents
       |  FROM orders GROUP BY o_custkey) o ON c_custkey = o_custkey""".stripMargin

  /** Window function: top-3 orders per customer by price (row_number with a
    * total deterministic sort). */
  def windowTopOrders(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
  }

  val windowTopOrdersSql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_custkey
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) t WHERE rn <= 3""".stripMargin

  /** Global top-k with total order (sort + limit → TakeOrderedAndProject,
    * which is O(k) per partition — no global sort at scale). */
  def globalTopK(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(15)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))

  val globalTopKSql: String =
    """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
      |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 15""".stripMargin

  /** Set operations: union-distinct / intersect / except over nation keys. */
  def setOps(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d).select(col("c_nationkey").cast("int").as("nationkey"))
    val sup = Tables.supplier(s, d).select(col("s_nationkey").cast("int").as("nationkey"))
    val u = c.union(sup).distinct().withColumn("op", lit("union"))
    val i = c.intersect(sup).withColumn("op", lit("intersect"))
    val e = c.distinct().except(sup).withColumn("op", lit("except"))
    u.unionByName(i).unionByName(e)
  }

  val setOpsSql: String =
    """SELECT nationkey, 'union' AS op FROM
      |  (SELECT c_nationkey AS nationkey FROM customer
      |   UNION SELECT s_nationkey FROM supplier)
      |UNION ALL
      |SELECT nationkey, 'intersect' AS op FROM
      |  (SELECT c_nationkey AS nationkey FROM customer
      |   INTERSECT SELECT s_nationkey FROM supplier)
      |UNION ALL
      |SELECT nationkey, 'except' AS op FROM
      |  (SELECT DISTINCT c_nationkey AS nationkey FROM customer
      |   EXCEPT SELECT s_nationkey FROM supplier)""".stripMargin

  /** Group-to-list nesting (SURVEY A1–A3): per order, the sorted line
    * numbers — rendered as a canonical string so the oracle compare is
    * representation-independent. */
  def nestLineitems(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(
        array_join(sort_array(collect_list(col("l_linenumber"))), ",").as("line_numbers"),
        count(lit(1)).as("n_lines"),
        sum(cents(col("l_quantity"))).as("qty_cents"))

  val nestLineitemsSql: String =
    s"""SELECT l_orderkey,
       |  string_agg(l_linenumber::VARCHAR, ',' ORDER BY l_linenumber) AS line_numbers,
       |  count(*) AS n_lines,
       |  (sum(${sqlCents("l_quantity")}))::BIGINT AS qty_cents
       |FROM lineitem GROUP BY l_orderkey""".stripMargin

  /** Multi-branch CASE (SURVEY F2 display-title pattern, generalized). */
  def caseTiering(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .withColumn("tier",
        when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), lit("hot"))
          .when(col("o_orderpriority") === "3-MEDIUM", lit("warm"))
          .otherwise(lit("cold")))
      .groupBy(col("tier"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        sum(cents(col("o_totalprice"))).as("total_cents"))

  val caseTieringSql: String =
    s"""SELECT CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 'hot'
       |            WHEN o_orderpriority = '3-MEDIUM' THEN 'warm'
       |            ELSE 'cold' END AS tier,
       |  o_orderstatus, count(*) AS n,
       |  (sum(${sqlCents("o_totalprice")}))::BIGINT AS total_cents
       |FROM orders GROUP BY 1, 2""".stripMargin

  /** Pure-SQL surface: the same engine driven through temp views +
    * spark.sql (TPC-H Q10-like top returning-customers). Shows the SQL
    * path produces identical results to the DataFrame path. */
  def sqlSurface(s: SparkSession, d: String): DataFrame = {
    Tables.registerViews(s, d)
    s.sql(
      s"""SELECT c_custkey, c_mktsegment,
         |  sum(${sqlCentsSpark("l_extendedprice")} * (100 - ${sqlCentsSpark("l_discount")})) AS revenue_c4,
         |  count(*) AS n_lines
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |WHERE l_returnflag = 'R'
         |GROUP BY c_custkey, c_mktsegment
         |ORDER BY revenue_c4 DESC, c_custkey
         |LIMIT 20""".stripMargin)
  }

  /** Spark-side SQL needs the same cents lift; CAST syntax is shared
    * with DuckDB so the oracle is near-verbatim. */
  private def sqlCentsSpark(c: String): String =
    s"CAST(round($c*100,0) AS BIGINT)"

  val sqlSurfaceSql: String =
    s"""SELECT c_custkey, c_mktsegment,
       |  (sum(${sqlCents("l_extendedprice")} * (100 - ${sqlCents("l_discount")})))::BIGINT AS revenue_c4,
       |  count(*) AS n_lines
       |FROM customer
       |JOIN orders ON c_custkey = o_custkey
       |JOIN lineitem ON l_orderkey = o_orderkey
       |WHERE l_returnflag = 'R'
       |GROUP BY c_custkey, c_mktsegment
       |ORDER BY revenue_c4 DESC, c_custkey
       |LIMIT 20""".stripMargin

  /** Correlated-scalar-subquery shape (TPC-H Q17-like): lineitems under
    * 30% of their part's average quantity. Catalyst decorrelates into
    * an aggregate + join — no per-row re-scan. */
  def belowAvgQuantity(s: SparkSession, d: String): DataFrame = {
    val l = Tables.lineitem(s, d)
    val avgQ = l.groupBy(col("l_partkey").as("p_key"))
      .agg((sum(cents(col("l_quantity"))).cast("double") / count(lit(1)) / 100.0 * 0.3)
        .as("threshold"))
    l.join(avgQ, col("l_partkey") === col("p_key"))
      .filter(col("l_quantity") < col("threshold"))
      .agg((sum(cents(col("l_extendedprice"))).cast("double") / 700.0).as("avg_yearly"),
        count(lit(1)).as("n_lines"))
  }

  val belowAvgQuantitySql: String =
    s"""SELECT sum(${sqlCents("l_extendedprice")})::DOUBLE / 700.0 AS avg_yearly,
       |  count(*) AS n_lines
       |FROM lineitem l
       |JOIN (SELECT l_partkey AS p_key,
       |        sum(${sqlCents("l_quantity")})::DOUBLE / count(*) / 100.0 * 0.3 AS threshold
       |      FROM lineitem GROUP BY 1) a ON l.l_partkey = a.p_key
       |WHERE l.l_quantity < a.threshold""".stripMargin

  /** Distinct-count grouping (TPC-H Q16-like): supplier variety per
    * part attribute bucket. */
  def partSupplierVariety(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d)),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"),
        count(lit(1)).as("n_lines"))

  val partSupplierVarietySql: String =
    """SELECT p_brand, p_size,
      |  count(DISTINCT l_suppkey) AS supplier_cnt,
      |  count(*) AS n_lines
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY 1, 2""".stripMargin

  /** FULL OUTER join (both unmatched sides preserved): per-nation
    * customer presence vs supplier presence. */
  def fullOuterNations(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
      .groupBy(col("c_nationkey").cast("long").as("ck"))
      .agg(count(lit(1)).as("n_cust"))
    val sup = Tables.supplier(s, d)
      .groupBy(col("s_nationkey").cast("long").as("sk"))
      .agg(count(lit(1)).as("n_supp"))
    c.join(sup, col("ck") === col("sk"), "full")
      .select(coalesce(col("ck"), col("sk")).as("nationkey"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"))
  }

  val fullOuterNationsSql: String =
    """SELECT coalesce(ck, sk) AS nationkey,
      |  coalesce(n_cust, 0)::BIGINT AS n_cust,
      |  coalesce(n_supp, 0)::BIGINT AS n_supp
      |FROM (SELECT c_nationkey::BIGINT AS ck, count(*) AS n_cust
      |      FROM customer GROUP BY 1) c
      |FULL OUTER JOIN (SELECT s_nationkey::BIGINT AS sk, count(*) AS n_supp
      |      FROM supplier GROUP BY 1) s ON ck = sk""".stripMargin

  /** Scalar string functions over `part`: regex extraction, case
    * mapping, length/substring — grouped to keep output small. */
  def stringFunctions(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(
        regexp_extract(col("p_name"), "^(\\w+)", 1).as("first_word"),
        upper(col("p_brand")).as("brand_uc"),
        length(col("p_name")).cast("long").as("name_len"),
        substring(col("p_type"), 1, 5).as("type_prefix"))
      .groupBy(col("first_word"), col("brand_uc"))
      .agg(count(lit(1)).as("n_parts"),
        sum(col("name_len")).cast("long").as("total_name_len"),
        min(col("type_prefix")).as("min_type_prefix"),
        max(col("type_prefix")).as("max_type_prefix"))

  val stringFunctionsSql: String =
    """SELECT regexp_extract(p_name, '^(\w+)', 1) AS first_word,
      |  upper(p_brand) AS brand_uc,
      |  count(*) AS n_parts,
      |  (sum(length(p_name)))::BIGINT AS total_name_len,
      |  min(substring(p_type, 1, 5)) AS min_type_prefix,
      |  max(substring(p_type, 1, 5)) AS max_type_prefix
      |FROM part GROUP BY 1, 2""".stripMargin

  /** Multiset set-ops (INTERSECT ALL / EXCEPT ALL): duplicate-preserving
    * semantics verified through the per-key multiplicities. */
  def multisetOps(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d).select(col("c_nationkey").cast("int").as("nationkey"))
    val sup = Tables.supplier(s, d).select(col("s_nationkey").cast("int").as("nationkey"))
    val ia = c.intersectAll(sup).withColumn("op", lit("intersect_all"))
    val ea = c.exceptAll(sup).withColumn("op", lit("except_all"))
    ia.unionByName(ea)
      .groupBy(col("op"), col("nationkey"))
      .agg(count(lit(1)).as("n"))
  }

  val multisetOpsSql: String =
    """SELECT op, nationkey, count(*) AS n FROM (
      |  SELECT nationkey, 'intersect_all' AS op FROM (
      |    SELECT c_nationkey::INT AS nationkey FROM customer
      |    INTERSECT ALL SELECT s_nationkey::INT FROM supplier)
      |  UNION ALL
      |  SELECT nationkey, 'except_all' AS op FROM (
      |    SELECT c_nationkey::INT AS nationkey FROM customer
      |    EXCEPT ALL SELECT s_nationkey::INT FROM supplier)
      |) t GROUP BY 1, 2""".stripMargin

  /** Explicit CROSS JOIN (both sides tiny — the one legitimate use):
    * full nation × region grid with a home-region flag. */
  def crossJoinGrid(s: SparkSession, d: String): DataFrame =
    Tables.nation(s, d)
      .select(col("n_nationkey").cast("long").as("nationkey"),
        col("n_regionkey").cast("long").as("n_regionkey"))
      .crossJoin(Tables.region(s, d)
        .select(col("r_regionkey").cast("long").as("regionkey")))
      .select(col("nationkey"), col("regionkey"),
        (col("n_regionkey") === col("regionkey")).as("is_home"))

  val crossJoinGridSql: String =
    """SELECT n_nationkey::BIGINT AS nationkey, r_regionkey::BIGINT AS regionkey,
      |  n_regionkey = r_regionkey AS is_home
      |FROM nation CROSS JOIN region""".stripMargin

  /** Window-analytics breadth: rank / dense_rank / percent_rank /
    * cume_dist / lag / ntile over a total per-customer order (price
    * desc, orderkey tiebreak — row-dependent functions need the total
    * order for determinism). */
  def windowAnalytics(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, d).select(
      col("o_custkey"), col("o_orderkey"),
      rank().over(w).cast("long").as("rnk"),
      dense_rank().over(w).cast("long").as("drnk"),
      percent_rank().over(w).as("prnk"),
      cume_dist().over(w).as("cdist"),
      lag(col("o_orderkey"), 1).over(w).as("prev_orderkey"),
      ntile(4).over(w).cast("long").as("quartile"))
  }

  val windowAnalyticsSql: String =
    """SELECT o_custkey, o_orderkey,
      |  rank() OVER w AS rnk,
      |  dense_rank() OVER w AS drnk,
      |  percent_rank() OVER w AS prnk,
      |  cume_dist() OVER w AS cdist,
      |  lag(o_orderkey, 1) OVER w AS prev_orderkey,
      |  ntile(4) OVER w AS quartile
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey
      |             ORDER BY o_totalprice DESC, o_orderkey)""".stripMargin

  /** Grouped exact quantiles: interpolated p25/p50/p75 over exact cent
    * values (integral inputs make the interpolation arithmetic exact in
    * IEEE, so Spark `percentile` and DuckDB `quantile_cont` agree
    * bit-for-bit regardless of each engine's interpolation formula).
    * Exact percentile sorts each group — the right tool up to groups of
    * ~10⁸ rows; beyond that use approx_percentile (t-digest, map-side
    * combined, no sort) and accept the error bound. */
  def groupQuantiles(s: SparkSession, d: String): DataFrame =
    // widen before the partial aggregate: `percentile`'s partial state
    // is the whole per-group value multiset (nothing reduces map-side),
    // so on an under-split scan the expensive buffer build runs on one
    // core while the shuffle ships the same bytes either way. Hash on
    // (flag, value) — deterministic, near-unique (guide §2.5); no-op on
    // a real many-split scan (r15: 2.38 s → 1.75 s at sf0.1).
    graft.operators.Dedup.widen(
      Tables.lineitem(s, d)
        .select(col("l_returnflag"), cents(col("l_extendedprice")).as("c")),
      xxhash64(col("l_returnflag"), col("c")))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        percentile(col("c"), lit(0.25)).as("p25_cents"),
        percentile(col("c"), lit(0.5)).as("p50_cents"),
        percentile(col("c"), lit(0.75)).as("p75_cents"))

  /** [[groupQuantiles]] over a (value, frequency) pre-aggregation: the
    * per-group sort shrinks from O(rows) to O(distinct values) — the
    * win on high-duplication columns (status codes, bucketed amounts),
    * where distinct ≪ rows; on near-unique values (this lineitem
    * price column) the extra keyed aggregation is pure overhead, which
    * is why the REGISTERED q62 stays in the plain form (measured both:
    * ProfileScratch "quantiles"). Bit-identical results: Spark's
    * `percentile` takes an exact frequency argument. */
  def groupQuantilesFreq(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(col("l_returnflag"), cents(col("l_extendedprice")).as("c"))
      .groupBy(col("l_returnflag"), col("c"))
      .agg(count(lit(1)).as("f"))
      .groupBy(col("l_returnflag"))
      .agg(sum(col("f")).as("n"),
        percentile(col("c"), lit(0.25), col("f")).as("p25_cents"),
        percentile(col("c"), lit(0.5), col("f")).as("p50_cents"),
        percentile(col("c"), lit(0.75), col("f")).as("p75_cents"))

  val groupQuantilesSql: String =
    s"""SELECT l_returnflag, count(*) AS n,
       |  quantile_cont(${sqlCents("l_extendedprice")}, 0.25) AS p25_cents,
       |  quantile_cont(${sqlCents("l_extendedprice")}, 0.5) AS p50_cents,
       |  quantile_cont(${sqlCents("l_extendedprice")}, 0.75) AS p75_cents
       |FROM lineitem GROUP BY 1""".stripMargin

  /** Exact per-group covariance/correlation building blocks — the
    * feature-correlation audit without a single float accumulation:
    * cov numerator `n·Σxy − Σx·Σy` and the two variance numerators
    * are pure 64-bit sums over integral inputs (quantity is a whole
    * number; discount lifts through cents), so they replay exactly
    * where `covar_samp`/`corr` would drift by summation order. The
    * caller divides once at the end (corr² = cov²/(vx·vy)) — here the
    * raw integer numerators ARE the result, so the gate checks every
    * bit. Column choice is an overflow decision, made with numbers:
    * price-cents squared overflows 2^63 at ~6k rows/group (measured
    * 1.5e22 at sf0.01 — caught before registration); discount-cents
    * (≤10) keep n·Σxy under 2^50 past 10⁹ rows. Wider inputs → lift
    * the sums to DECIMAL(38,0). */
  def exactCovariance(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(col("l_returnflag"),
        col("l_quantity").cast("long").as("q"),
        cents(col("l_discount")).as("p"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("q")).as("sum_q"), sum(col("p")).as("sum_p"),
        sum(col("q") * col("p")).as("sum_qp"),
        sum(col("q") * col("q")).as("sum_qq"),
        sum(col("p") * col("p")).as("sum_pp"))
      .select(col("l_returnflag"), col("n"),
        (col("n") * col("sum_qp") - col("sum_q") * col("sum_p"))
          .as("cov_num"),
        (col("n") * col("sum_qq") - col("sum_q") * col("sum_q"))
          .as("var_q_num"),
        (col("n") * col("sum_pp") - col("sum_p") * col("sum_p"))
          .as("var_p_num"))

  val exactCovarianceSql: String =
    s"""WITH e AS (SELECT l_returnflag,
       |    CAST(l_quantity AS BIGINT) AS q,
       |    ${sqlCents("l_discount")} AS p
       |  FROM lineitem),
       |s AS (SELECT l_returnflag, count(*) AS n,
       |    (sum(q))::BIGINT AS sum_q, (sum(p))::BIGINT AS sum_p,
       |    (sum(q*p))::BIGINT AS sum_qp, (sum(q*q))::BIGINT AS sum_qq,
       |    (sum(p*p))::BIGINT AS sum_pp
       |  FROM e GROUP BY 1)
       |SELECT l_returnflag, n,
       |  n*sum_qp - sum_q*sum_p AS cov_num,
       |  n*sum_qq - sum_q*sum_q AS var_q_num,
       |  n*sum_pp - sum_p*sum_p AS var_p_num
       |FROM s""".stripMargin

  /** Global equi-depth deciles of lineitem price — EXACT order
    * statistics through the distributed rank scan
    * ([[graft.operators.PrefixSum.equiDepthBoundaries]]): boundary i =
    * the cents value at rank ⌈i·n/10⌉ under the (cents, orderkey,
    * linenumber) total order. q62's window quantiles shuffle every
    * value to its key's reducer; this is the GLOBAL form that would
    * otherwise need a one-task sort — the two-phase scan caps any task
    * at one range partition. The oracle is a plain global row_number. */
  def equiDepthDeciles(s: SparkSession, d: String): DataFrame =
    graft.operators.PrefixSum.equiDepthBoundaries(
      Tables.lineitem(s, d).select(
        cents(col("l_extendedprice")).as("c"),
        col("l_orderkey"), col("l_linenumber")),
      Seq(col("c"), col("l_orderkey"), col("l_linenumber")),
      col("c"), b = 10, nParts = 16)
      .withColumnRenamed("boundary", "boundary_cents")

  val equiDepthDecilesSql: String =
    s"""WITH v AS (
       |  SELECT ${sqlCents("l_extendedprice")} AS c,
       |    l_orderkey, l_linenumber
       |  FROM lineitem),
       |r AS (
       |  SELECT c, row_number() OVER (ORDER BY c, l_orderkey,
       |    l_linenumber) AS rk
       |  FROM v),
       |n AS (SELECT count(*) AS n FROM v)
       |SELECT i::BIGINT AS bucket_idx, c AS boundary_cents
       |FROM unnest([1,2,3,4,5,6,7,8,9,10]) t(i), n
       |JOIN r ON rk = (i * n.n + 9) // 10""".stripMargin

  /** q192: the SAME global deciles as q136 through sortless selection
    * ([[graft.operators.Frequency.exactRanks]], all ten ranks narrowed
    * in shared histogram passes — the range-dedupe makes pass 1 ONE
    * histogram, not ten). q136's two-phase rank scan still globally
    * range-partitions and sorts the data once; selection never
    * exchanges data rows at all — at 100 TB that is the difference
    * between a full-shuffle job and ~3 scan-only passes. Gated by
    * q136's own sort-based oracle: a boundary VALUE at rank k is the
    * k-th smallest value under any tiebreak, so the two formulations
    * must agree exactly. */
  def equiDepthDecilesSelect(s: SparkSession, d: String): DataFrame =
    graft.operators.Frequency.exactRanks(
      Tables.lineitem(s, d).select(lit(0L).as("g"),
        cents(col("l_extendedprice")).as("c")),
      "g", "c",
      (1 to 10).map(i => i.toString -> ((n: Long) => (i * n + 9) / 10)))
      .select(col("tag").cast("long").as("bucket_idx"),
        col("kth").as("boundary_cents"))

  /** q159: ROLLUP — the hierarchical-subtotal shape (§2.7 had sorts /
    * sets / windows; this closes grouping sets). One pass produces
    * (flag, status), (flag, ALL), (ALL, ALL) aggregate rows; Spark
    * plans a single Expand + aggregate, so the cost is one extra
    * duplication factor over the plain groupBy, not one pass per
    * level. Subtotal keys surface as 'ALL' via coalesce — keeping
    * NULL-vs-value semantics OUT of the hash contract (grouping-id
    * bit orders differ across engines; coalesced labels don't). */
  def rollupRevenue(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_items"),
        sum(cents(col("l_extendedprice"))).as("price_cents"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("status"),
        col("n_items"), col("price_cents"))

  val rollupRevenueSql: String =
    s"""SELECT coalesce(l_returnflag, 'ALL') AS flag,
       |  coalesce(l_linestatus, 'ALL') AS status,
       |  count(*)::BIGINT AS n_items,
       |  (sum(${sqlCents("l_extendedprice")}))::BIGINT AS price_cents
       |FROM lineitem
       |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin

  /** q163: [[graft.operators.JoinPrune.bloomFilteredJoin]] — the
    * runtime-filter join: urgent orders (a ~20% selective dim) bloom-
    * prune the lineitem scan BEFORE the join, then monthly revenue.
    * Exact by construction (no false negatives), so the oracle is the
    * PLAIN join — the pruning must be invisible in the result. At
    * sf0.01 Spark broadcasts the dim anyway; the shape this operator
    * buys — big-dim/bigger-fact where SMJ would shuffle the whole
    * fact — is measured in ProfileScratch `bloomjoin`. */
  def bloomJoinRevenue(s: SparkSession, d: String): DataFrame = {
    import graft.operators.JoinPrune
    val dim = Tables.orders(s, d)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderdate"))
    val fact = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_extendedprice"))
    JoinPrune.bloomFilteredJoin(fact, dim, "l_orderkey")
      .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
      .agg(count(lit(1)).as("n_items"),
        sum(cents(col("l_extendedprice"))).as("price_cents"))
      .select(unix_micros(col("month")).as("month_us"),
        col("n_items"), col("price_cents"))
  }

  val bloomJoinRevenueSql: String =
    s"""SELECT epoch_us(date_trunc('month', o_orderdate)) AS month_us,
       |  count(*)::BIGINT AS n_items,
       |  (sum(${sqlCents("l_extendedprice")}))::BIGINT AS price_cents
       |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |WHERE o_orderpriority = '1-URGENT'
       |GROUP BY 1""".stripMargin

  def all: Seq[Q] = Seq(
    Q("q163_bloom_join", bloomJoinRevenue, Some(bloomJoinRevenueSql)),
    Q("q159_rollup_revenue", rollupRevenue, Some(rollupRevenueSql)),
    Q("q136_equidepth_deciles", equiDepthDeciles, Some(equiDepthDecilesSql)),
    Q("q192_equidepth_selection", equiDepthDecilesSelect,
      Some(equiDepthDecilesSql)),
    Q("q122_exact_covariance", exactCovariance, Some(exactCovarianceSql)),
    Q("q62_group_quantiles", groupQuantiles, Some(groupQuantilesSql)),
    Q("q39_sql_surface", sqlSurface, Some(sqlSurfaceSql)),
    Q("q40_below_avg_qty", belowAvgQuantity, Some(belowAvgQuantitySql)),
    Q("q41_part_supplier_variety", partSupplierVariety, Some(partSupplierVarietySql)),
    Q("q01_pricing_summary", pricingSummary, Some(pricingSummarySql)),
    Q("q02_filter_project", filterProject, Some(filterProjectSql)),
    Q("q03_shipping_priority", shippingPriority, Some(shippingPrioritySql)),
    Q("q04_semi_join", semiJoinPriority, Some(semiJoinPrioritySql)),
    Q("q05_local_supplier_volume", localSupplierVolume, Some(localSupplierVolumeSql)),
    Q("q06_forecast_revenue", forecastRevenue, Some(forecastRevenueSql)),
    Q("q07_anti_join", antiJoinCustomers, Some(antiJoinCustomersSql)),
    Q("q08_window_top_orders", windowTopOrders, Some(windowTopOrdersSql)),
    Q("q09_global_topk", globalTopK, Some(globalTopKSql)),
    Q("q10_set_ops", setOps, Some(setOpsSql)),
    Q("q11_nest_lineitems", nestLineitems, Some(nestLineitemsSql)),
    Q("q12_case_tiering", caseTiering, Some(caseTieringSql)),
    Q("q48_left_join_orders", leftJoinOrders, Some(leftJoinOrdersSql)),
    Q("q49_full_outer_join", fullOuterNations, Some(fullOuterNationsSql)),
    Q("q52_string_functions", stringFunctions, Some(stringFunctionsSql)),
    Q("q53_multiset_ops", multisetOps, Some(multisetOpsSql)),
    Q("q57_cross_join_grid", crossJoinGrid, Some(crossJoinGridSql)),
    Q("q58_window_analytics", windowAnalytics, Some(windowAnalyticsSql)))
}
