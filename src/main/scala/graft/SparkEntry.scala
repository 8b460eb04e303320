package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries are registered per operator group; every SQL-expressible one
  * carries a DuckDB oracle (same parquet tables, identical column names).
  */
object SparkEntry {

  /** All registered queries in declaration order (exposed so the
    * contract spec can detect duplicate names, which the maps below
    * would silently collapse). */
  def registered: Seq[Q] =
    RelationalQueries.all ++ HierarchyQueries.all ++
      TextQueries.all ++ DedupQueries.all ++
      SimilarityQueries.all ++ IvfPqQueries.all ++ EventQueries.all ++
      MultimodalQueries.all ++ ScaleQueries.all ++ SketchQueries.all ++
      SemanticsQueries.all ++ DataMixQueries.all ++ CurationQueries.all ++
      UpsertQueries.all ++ ValidationQueries.all ++ StreamingQueries.all ++
      PcaQueries.all ++ SourceQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.pricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registered.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registered.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
