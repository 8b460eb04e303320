package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** MERGE INTO / CDC-apply semantics as a batch operator: reconcile a
  * base table with a change feed of (op, payload) rows — the shape a
  * `foreachBatch` streaming sink or a nightly CDC load applies to a
  * warehouse table. The reference pipeline's change ledger
  * (`usnvc.py:55-57,74-77`) records exactly such a feed; this operator
  * is its apply side, generalized.
  *
  * Semantics (per key, after optional latest-wins collapse):
  *   - `delete`  → the base row disappears;
  *   - `update`/`insert` (any non-delete op) → the change payload wins,
  *     whether or not the key existed (upsert — MERGE's WHEN MATCHED
  *     UPDATE + WHEN NOT MATCHED INSERT with identical payloads);
  *   - keys without a change row pass through untouched.
  *
  * Scale: one anti-join of base against the (usually tiny) touched-key
  * set — broadcast when the batch is small, so the base table is
  * NEVER shuffled — plus a union. The latest-wins collapse windows
  * only the change feed, partitioned by key. Formats with file-level
  * transactions (Delta/Iceberg MERGE) add min/max-pruned file rewrite
  * on top; the dataflow is this one.
  */
object Upsert {

  /** @param base    current table state; columns = payload columns.
    * @param changes change feed: `opCol` + the same payload columns
    *                (+ optionally `seqCol`).
    * @param keyCol  unique key within `base`.
    * @param seqCol  change-sequence column; when set, only the
    *                highest-sequence change per key applies (ties
    *                broken by op descending, so a same-sequence
    *                delete+upsert pair resolves deterministically).
    */
  def applyChanges(
      base: DataFrame, changes: DataFrame, keyCol: String,
      opCol: String = "op", seqCol: Option[String] = None): DataFrame = {
    val latest = seqCol match {
      case Some(sc) =>
        changes.withColumn("__rn", row_number().over(
            Window.partitionBy(col(keyCol))
              .orderBy(col(sc).desc, col(opCol).desc)))
          .filter(col("__rn") === 1).drop("__rn")
      case None => changes
    }
    val payloadCols = base.columns.toIndexedSeq
    val upserts = latest.filter(col(opCol) =!= "delete")
      .select(payloadCols.map(col): _*)
    val touched = latest.select(col(keyCol)).distinct()
    base.join(touched, Seq(keyCol), "left_anti").unionByName(upserts)
  }

  /** History-preserving (SCD type-2) apply: instead of overwriting,
    * every change CLOSES the key's current version (stamps `validTo`
    * with the change timestamp) and — unless it is a delete — appends
    * a new open version. `base` carries `validFrom`/`validTo` columns
    * with `validTo IS NULL` marking current rows; closed history is
    * untouched, so the result supports as-of reconstruction (pair with
    * [[AsOfJoin]] to query any past state).
    *
    * Scale shape matches [[applyChanges]]: history and untouched
    * current rows pass through without a shuffle; only the (small)
    * change batch joins against current rows, broadcast when small. */
  def applyChangesScd2(
      base: DataFrame, changes: DataFrame, keyCol: String,
      opCol: String = "op", tsCol: String = "ts",
      validFrom: String = "valid_from", validTo: String = "valid_to"): DataFrame = {
    val latest = changes.withColumn("__rn", row_number().over(
        Window.partitionBy(col(keyCol))
          .orderBy(col(tsCol).desc, col(opCol).desc)))
      .filter(col("__rn") === 1).drop("__rn")
    val payloadCols = base.columns.toIndexedSeq
      .filterNot(c => c == validFrom || c == validTo)
    val history = base.filter(col(validTo).isNotNull)
    val current = base.filter(col(validTo).isNull)
    val touched = latest.select(col(keyCol), col(tsCol).as("__close_ts"))
    val closed = current.join(touched, Seq(keyCol), "inner")
      .withColumn(validTo, col("__close_ts")).drop("__close_ts")
    val untouched = current.join(touched.select(col(keyCol)),
      Seq(keyCol), "left_anti")
    val opened = latest.filter(col(opCol) =!= "delete")
      .select((payloadCols.map(col) :+ col(tsCol).as(validFrom)): _*)
      .withColumn(validTo, lit(null).cast(
        base.schema(validTo).dataType))
    history.unionByName(untouched).unionByName(closed).unionByName(opened)
  }
}
