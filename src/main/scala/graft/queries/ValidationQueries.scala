package graft.queries

import graft.Tables
import graft.operators.{Upsert, Validation}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality gate + SCD2 history coverage. The quality report runs
  * one single-pass aggregation per constraint; the SCD2 query applies a
  * deterministic change feed history-preservingly and summarizes open
  * vs closed versions — both fully replayed by the DuckDB oracles.
  */
object ValidationQueries {

  def qualityReport(s: SparkSession, d: String): DataFrame =
    Validation.report(Seq(
      Validation.unique("orders_pk_unique", Tables.orders(s, d),
        col("o_orderkey")),
      Validation.referential("lineitem_fk_orders", Tables.lineitem(s, d),
        "l_orderkey", Tables.orders(s, d), "o_orderkey"),
      Validation.referential("customer_fk_nation", Tables.customer(s, d),
        "c_nationkey", Tables.nation(s, d), "n_nationkey"),
      Validation.check("orders_price_nonneg", Tables.orders(s, d),
        col("o_totalprice") < 0),
      Validation.check("documents_nonempty", Tables.documents(s, d),
        length(trim(col("text"))) === 0)))

  val qualityReportSql: String =
    """SELECT 'orders_pk_unique' AS check_name, count(*) AS checked,
      |  (count(*) - count(DISTINCT o_orderkey))::BIGINT AS violations
      |FROM orders
      |UNION ALL
      |SELECT 'lineitem_fk_orders', count(*),
      |  (sum(CASE WHEN o.o_orderkey IS NULL AND l.l_orderkey IS NOT NULL
      |            THEN 1 ELSE 0 END))::BIGINT
      |FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
      |  ON l.l_orderkey = o.o_orderkey
      |UNION ALL
      |SELECT 'customer_fk_nation', count(*),
      |  (sum(CASE WHEN n.n_nationkey IS NULL AND c.c_nationkey IS NOT NULL
      |            THEN 1 ELSE 0 END))::BIGINT
      |FROM customer c LEFT JOIN (SELECT DISTINCT n_nationkey FROM nation) n
      |  ON c.c_nationkey = n.n_nationkey
      |UNION ALL
      |SELECT 'orders_price_nonneg', count(*),
      |  (sum(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END))::BIGINT
      |FROM orders
      |UNION ALL
      |SELECT 'documents_nonempty', count(*),
      |  (sum(CASE WHEN length(trim(text)) = 0 THEN 1 ELSE 0 END))::BIGINT
      |FROM documents""".stripMargin

  /** SCD2 apply of the q63 change feed (same deterministic buckets,
    * timestamp 1) over orders initialized at version 0: updates and
    * deletes close the current row, non-deletes open a new version.
    * Summary counts open/closed versions per status with a
    * membership-sensitive price sum. */
  def scd2Orders(s: SparkSession, d: String): DataFrame = {
    val base = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .withColumn("valid_from", lit(0L))
      .withColumn("valid_to", lit(null).cast("long"))
    val bkt = graft.operators.DataMix.hashBucket(col("o_orderkey"), 7L)
    val src = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val deletes = src.filter(bkt < 100000)
      .select(lit("delete").as("op"), col("o_orderkey"),
        col("o_orderstatus"), col("o_totalprice"), lit(1L).as("ts"))
    val updates = src.filter(bkt >= 100000 && bkt < 200000)
      .select(lit("update").as("op"), col("o_orderkey"),
        lit("U").as("o_orderstatus"), col("o_totalprice"), lit(1L).as("ts"))
    val changes = deletes.unionByName(updates)
    Upsert.applyChangesScd2(base, changes, "o_orderkey")
      .groupBy(col("o_orderstatus"), col("valid_to").isNull.as("is_current"))
      .agg(count(lit(1)).as("n_versions"),
        sum(cents(col("o_totalprice"))).as("price_cents"))
  }

  val scd2OrdersSql: String =
    s"""WITH b AS (
       |  SELECT o_orderkey, o_orderstatus, o_totalprice,
       |    ('0x'||substr(md5(o_orderkey::VARCHAR || '#7'),1,15))::BIGINT
       |      % 1000000 AS bkt
       |  FROM orders),
       |versions AS (
       |  -- untouched current rows stay open
       |  SELECT o_orderstatus, o_totalprice, TRUE AS is_current
       |  FROM b WHERE bkt >= 200000
       |  UNION ALL
       |  -- touched rows: the original version is closed at ts 1
       |  SELECT o_orderstatus, o_totalprice, FALSE
       |  FROM b WHERE bkt < 200000
       |  UNION ALL
       |  -- updates additionally open a new 'U' version
       |  SELECT 'U', o_totalprice, TRUE
       |  FROM b WHERE bkt >= 100000 AND bkt < 200000)
       |SELECT o_orderstatus, is_current, count(*) AS n_versions,
       |  (sum(${sqlCents("o_totalprice")}))::BIGINT AS price_cents
       |FROM versions GROUP BY 1, 2""".stripMargin

  /** Single-scan column profile of lineitem (ANALYZE-style stats):
    * per-column row/null/exact-distinct counts and typed min/max,
    * all from ONE scan (multi-distinct plans as scan + Expand; the
    * plan spec pins the single-scan property). Min/max are rendered
    * to deterministic cross-engine strings AFTER the typed aggregate:
    * quantities as integral longs, money as cents, timestamps as
    * ISO dates. */
  def columnProfile(s: SparkSession, d: String): DataFrame =
    Validation.profile(Tables.lineitem(s, d), Seq(
      Validation.ProfileCol("l_orderkey"),
      Validation.ProfileCol("l_quantity", _.cast("long")),
      Validation.ProfileCol("l_extendedprice", cents),
      Validation.ProfileCol("l_returnflag"),
      Validation.ProfileCol("l_shipdate", _.cast("date"))))

  val columnProfileSql: String = {
    def row(name: String, minmax: String => String): String = {
      s"""SELECT '$name' AS col_name, count(*)::BIGINT AS n_rows,
         |  (count(*) - count($name))::BIGINT AS n_nulls,
         |  count(DISTINCT $name)::BIGINT AS n_distinct,
         |  ${minmax(s"min($name)")} AS min_val,
         |  ${minmax(s"max($name)")} AS max_val
         |FROM lineitem""".stripMargin
    }
    Seq(
      row("l_orderkey", m => s"$m::VARCHAR"),
      row("l_quantity", m => s"$m::BIGINT::VARCHAR"),
      row("l_extendedprice", m => s"CAST(round($m*100,0) AS BIGINT)::VARCHAR"),
      row("l_returnflag", m => s"$m::VARCHAR"),
      row("l_shipdate", m => s"$m::DATE::VARCHAR")
    ).mkString("\nUNION ALL\n")
  }

  /** q182: scan-level metrics observed FOR FREE on the consuming job
    * ([[graft.operators.Observe.profiled]] → Dataset.observe /
    * CollectMetrics): the "real" work is a per-lang aggregate over
    * docs passing a length gate; the scan metrics (rows, short docs,
    * total chars) ride along in the same job — no second scan.
    * CollectMetrics is a pushdown barrier, so they describe the FULL
    * scan even though the aggregate keeps only gated rows. The metrics
    * re-enter the result as literal columns after the materializing
    * action; the oracle recomputes both the aggregate and the scan
    * stats from the table. */
  def observedMetrics(s: SparkSession, d: String): DataFrame = {
    import graft.operators.{Lifecycle, Observe}
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val (observed, obs) = Observe.profiled(docs,
      "scan_rows" -> count(lit(1)),
      "scan_short_docs" -> count(when(col("n_chars") < 100, 1)),
      "scan_sum_chars" -> sum(col("n_chars")))
    val perLang = observed.filter(col("n_chars") >= 100)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("kept_docs"), sum(col("n_chars")).as("kept_chars"))
    val out = Lifecycle.materializeToScratch(perLang) // action → metrics set
    val m = obs.get
    out
      .withColumn("scan_rows", lit(m("scan_rows").asInstanceOf[Long]))
      .withColumn("scan_short_docs", lit(m("scan_short_docs").asInstanceOf[Long]))
      .withColumn("scan_sum_chars", lit(m("scan_sum_chars").asInstanceOf[Long]))
  }

  val observedMetricsSql: String =
    """WITH agg AS (
      |  SELECT lang, count(*)::BIGINT AS kept_docs,
      |    sum(n_chars)::BIGINT AS kept_chars
      |  FROM documents WHERE n_chars >= 100 GROUP BY 1),
      |scan AS (
      |  SELECT count(*)::BIGINT AS scan_rows,
      |    count(CASE WHEN n_chars < 100 THEN 1 END)::BIGINT AS scan_short_docs,
      |    sum(n_chars)::BIGINT AS scan_sum_chars
      |  FROM documents)
      |SELECT lang, kept_docs, kept_chars, scan_rows, scan_short_docs,
      |  scan_sum_chars
      |FROM agg, scan""".stripMargin

  def all: Seq[Q] = Seq(
    Q("q68_quality_report", qualityReport, Some(qualityReportSql)),
    Q("q69_scd2_history", scd2Orders, Some(scd2OrdersSql)),
    Q("q182_observed_metrics", observedMetrics, Some(observedMetricsSql)),
    Q("q99_column_profile", columnProfile, Some(columnProfileSql)))
}
