package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Bridge into `private[sql]` Spark internals that custom logical plans
  * need. Every DataFrame-producing extension library ships exactly this
  * shim (Delta, Iceberg, Sedona, …): `Dataset.ofRows` — the only way to
  * wrap a hand-built [[LogicalPlan]] into a user-facing [[DataFrame]] —
  * is package-private, so the bridge lives in a subpackage of
  * `org.apache.spark.sql`. Nothing here is reflective or
  * version-fragile: it compiles against the public-in-bytecode
  * signature and breaks loudly at compile time on a Spark upgrade.
  */
object GraftSqlShim {

  /** Wrap an (analyzed or analyzable) logical plan as a DataFrame on
    * `spark`. The plan goes through the full analyzer/optimizer like
    * any other query — custom nodes must be resolved or resolvable. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
