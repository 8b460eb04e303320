package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cross-engine semantic edges: NULL propagation/grouping/null-safe
  * equality, and calendar functions — the places engines disagree by
  * convention rather than by bug (DuckDB sorts NULLS LAST by default
  * where Spark sorts NULLS FIRST; DuckDB dayofweek is 0=Sunday where
  * Spark weekday is 0=Monday). The oracles encode the explicit
  * mappings, so a silent convention change in either engine fails the
  * gate.
  */
object SemanticsQueries {

  /** NULL semantics: a derived nullable bucket exercises null grouping
    * (one group for NULL), count(col) vs count(*), null-skipping sums,
    * and a null-safe self-join (<=> matches NULL to NULL). */
  def nullSemantics(s: SparkSession, d: String): DataFrame = {
    val base = Tables.lineitem(s, d).select(
      when(col("l_quantity") < 10, lit(null))
        .otherwise(floor(col("l_quantity") / 10)).cast("long").as("x_bucket"),
      col("l_returnflag"), cents(col("l_quantity")).as("qty_cents"))
    val g = base.groupBy(col("x_bucket"))
      .agg(count(lit(1)).as("n_rows"),
        count(col("x_bucket")).as("n_nonnull"),
        sum(col("qty_cents")).as("qty_cents_sum"))
    val flags = base.groupBy(col("x_bucket"))
      .agg(countDistinct(col("l_returnflag")).as("n_flags"))
    g.join(flags, g("x_bucket") <=> flags("x_bucket"))
      .select(g("x_bucket"), col("n_rows"), col("n_nonnull"),
        col("qty_cents_sum"), col("n_flags"))
  }

  val nullSemanticsSql: String =
    s"""WITH base AS (
       |  SELECT CASE WHEN l_quantity < 10 THEN NULL
       |              ELSE floor(l_quantity / 10) END::BIGINT AS x_bucket,
       |    l_returnflag, ${sqlCents("l_quantity")} AS qty_cents
       |  FROM lineitem),
       |g AS (SELECT x_bucket, count(*) AS n_rows, count(x_bucket) AS n_nonnull,
       |        (sum(qty_cents))::BIGINT AS qty_cents_sum
       |      FROM base GROUP BY 1),
       |f AS (SELECT x_bucket, count(DISTINCT l_returnflag) AS n_flags
       |      FROM base GROUP BY 1)
       |SELECT g.x_bucket, n_rows, n_nonnull, qty_cents_sum, n_flags
       |FROM g JOIN f ON g.x_bucket IS NOT DISTINCT FROM f.x_bucket""".stripMargin

  /** Calendar functions over event timestamps: extraction, explicit
    * weekday convention (Spark weekday 0=Mon → ISO dow 1=Mon), day
    * arithmetic. */
  def dateFunctions(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(
        year(col("ts")).as("y"),
        month(col("ts")).as("m"),
        (weekday(col("ts")) + 1).as("iso_dow"),
        datediff(col("ts").cast("date"), to_date(lit("2024-01-01"))).as("day_offset"),
        hour(col("ts")).as("h"))
      .groupBy(col("y"), col("m"), col("iso_dow"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("day_offset")).as("n_days"),
        min(col("h")).as("min_hour"), max(col("h")).as("max_hour"),
        sum(col("day_offset")).as("sum_day_offset"))

  val dateFunctionsSql: String =
    """SELECT extract(year FROM ts) AS y, extract(month FROM ts) AS m,
      |  isodow(ts) AS iso_dow,
      |  count(*) AS n,
      |  count(DISTINCT date_diff('day', DATE '2024-01-01', ts::DATE)) AS n_days,
      |  min(extract(hour FROM ts)) AS min_hour,
      |  max(extract(hour FROM ts)) AS max_hour,
      |  (sum(date_diff('day', DATE '2024-01-01', ts::DATE)))::BIGINT AS sum_day_offset
      |FROM events GROUP BY 1, 2, 3""".stripMargin

  def all: Seq[Q] = Seq(
    Q("q42_null_semantics", nullSemantics, Some(nullSemanticsSql)),
    Q("q43_date_functions", dateFunctions, Some(dateFunctionsSql)))
}
