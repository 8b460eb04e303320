package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraints (deequ-style, scoped to what a
  * pipeline gate needs): each check is one aggregation producing a
  * (check_name, checked, violations) row; a report unions them. All
  * checks are single-pass aggregations — a full report over N tables
  * costs one scan per table (Spark runs the union's branches as
  * independent jobs), and every check partial-aggregates map-side.
  *
  * The reference pipeline's only gate is its JSON-schema validation
  * (`README.md:35-46`); this generalizes that idea to relational
  * invariants (keys, foreign keys, row predicates) so a 100 TB load
  * can fail fast before publishing.
  */
object Validation {

  /** Row-predicate check: `violation` flags bad rows. */
  def check(name: String, df: DataFrame, violation: Column): DataFrame =
    df.agg(count(lit(1)).as("checked"),
        coalesce(sum(when(violation, 1L).otherwise(0L)), lit(0L))
          .as("violations"))
      .select(lit(name).as("check_name"), col("checked"), col("violations"))

  /** Key-uniqueness check: violations = rows beyond the first per key
    * (NULL keys are not counted distinct — pair with a not-null check). */
  def unique(name: String, df: DataFrame, keys: Column*): DataFrame =
    df.agg(count(lit(1)).as("checked"),
        (count(lit(1)) - countDistinct(keys.head, keys.tail: _*))
          .as("violations"))
      .select(lit(name).as("check_name"), col("checked"), col("violations"))

  /** Referential-integrity check: child rows whose non-null key has no
    * match in the parent. The parent key set is distinct-projected
    * first (broadcast when small — dimension FKs check without
    * shuffling the child). */
  def referential(name: String, child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame = {
    val p = parent.select(col(parentKey).as("__pk")).distinct()
    child.join(p, col(childKey) === col("__pk"), "left")
      .agg(count(lit(1)).as("checked"),
        coalesce(sum(when(col("__pk").isNull && col(childKey).isNotNull, 1L)
          .otherwise(0L)), lit(0L)).as("violations"))
      .select(lit(name).as("check_name"), col("checked"), col("violations"))
  }

  /** Union of check rows → the quality report. */
  def report(checks: Seq[DataFrame]): DataFrame =
    checks.reduce(_ unionByName _)
}
