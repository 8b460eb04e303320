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

  /** One WHEN clause of a multi-clause [[merge]]. `cond` is a SQL
    * boolean over the aliases `t` (target/base) and `s` (source) —
    * e.g. `"t.status = 'O' AND s.price > t.price"`; None ⇒
    * unconditional. Actions are SET-star / VALUES-star: `update` and
    * `insert` take the source row's payload verbatim (the MERGE form
    * CDC pipelines use; computed SET lists compose by projecting the
    * source first). */
  final case class MergeClause(cond: Option[String], action: String)
  object MergeClause {
    def update(cond: String = null): MergeClause =
      MergeClause(Option(cond), "update")
    def delete(cond: String = null): MergeClause =
      MergeClause(Option(cond), "delete")
    def insert(cond: String = null): MergeClause =
      MergeClause(Option(cond), "insert")
  }

  /** Multi-clause MERGE: SQL MERGE's full clause surface over the same
    * one-join dataflow as [[applyChanges]].
    *
    *   - `whenMatched` (update/delete): evaluated IN ORDER on rows
    *     present in both sides; first true condition wins; no match ⇒
    *     the base row is kept unchanged.
    *   - `whenNotMatched` (insert): source-only rows; no match ⇒ row
    *     not inserted.
    *   - `whenNotMatchedBySource` (delete): base-only rows — the
    *     "prune stale rows" form; no match ⇒ kept.
    *
    * Contract: `source` carries `keyCol` plus every base column
    * (SET-star), and is UNIQUE per key (collapse upstream with the
    * [[applyChanges]] latest-wins window; SQL MERGE makes multiple
    * matches an error for the same reason — the result would depend on
    * join order).
    *
    * Scale: ONE full-outer join on the key — broadcast when the source
    * is dimension-sized, shuffle otherwise — then a single projected
    * CASE; the base is never scanned twice and nothing driver-side
    * touches data. Clause conditions compile into the same projection,
    * so adding clauses costs zero extra passes. */
  def merge(base: DataFrame, source: DataFrame, keyCol: String,
      whenMatched: Seq[MergeClause] = Nil,
      whenNotMatched: Seq[MergeClause] = Nil,
      whenNotMatchedBySource: Seq[MergeClause] = Nil): DataFrame = {
    val payload = base.columns.toIndexedSeq
    require(payload.forall(source.columns.contains),
      s"SET-star merge: source must carry every base column; missing " +
        s"${payload.filterNot(source.columns.contains).mkString(", ")}")
    def validate(cs: Seq[MergeClause], allowed: Set[String], fam: String) =
      cs.foreach(c => require(allowed(c.action),
        s"$fam clause cannot ${c.action} (allowed: ${allowed.mkString("/")})"))
    validate(whenMatched, Set("update", "delete"), "WHEN MATCHED")
    validate(whenNotMatched, Set("insert"), "WHEN NOT MATCHED")
    validate(whenNotMatchedBySource, Set("delete"),
      "WHEN NOT MATCHED BY SOURCE")
    val tK = col(s"t.`$keyCol`"); val sK = col(s"s.`$keyCol`")
    val j = base.alias("t").join(source.alias("s"), tK === sK, "full_outer")
    // first-match-wins fold; the default is the SQL MERGE no-clause
    // behavior for each family (keep / don't insert / keep)
    def chain(cs: Seq[MergeClause], dflt: String) =
      cs.foldRight(lit(dflt)) { (c, els) =>
        when(c.cond.map(expr).getOrElse(lit(true)), lit(c.action))
          .otherwise(els)
      }
    val act = when(tK.isNotNull && sK.isNotNull, chain(whenMatched, "keep"))
      .when(tK.isNull, chain(whenNotMatched, "skip"))
      .otherwise(chain(whenNotMatchedBySource, "keep"))
    j.withColumn("__act", act)
      .filter(col("__act") === "keep" || col("__act") === "update" ||
        col("__act") === "insert")
      .select(payload.map(c =>
        when(col("__act") === "keep", col(s"t.`$c`"))
          .otherwise(col(s"s.`$c`")).as(c)): _*)
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
