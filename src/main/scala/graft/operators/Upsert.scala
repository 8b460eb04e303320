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
    * unconditional.
    *
    * `set` is the clause's SET / VALUES list: column → SQL expression
    * over the same `t`/`s` aliases. Empty ⇒ star semantics (`update`
    * and `insert` take the source row's payload verbatim — the MERGE
    * form CDC pipelines use). Non-empty follows SQL MERGE: an update
    * leaves unlisted columns at their TARGET value (`SET c = expr`
    * touches only `c`); an insert leaves unlisted columns NULL (an
    * explicit insert column list). With explicit sets the source need
    * not carry the base schema at all — only the join key. */
  final case class MergeClause(cond: Option[String], action: String,
      set: Map[String, String] = Map.empty)
  object MergeClause {
    def update(cond: String = null,
        set: Map[String, String] = Map.empty): MergeClause =
      MergeClause(Option(cond), "update", set)
    def delete(cond: String = null): MergeClause =
      MergeClause(Option(cond), "delete")
    def insert(cond: String = null,
        set: Map[String, String] = Map.empty): MergeClause =
      MergeClause(Option(cond), "insert", set)
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
    * Contract: `source` carries `keyCol`; clauses with star semantics
    * (empty `set`) additionally require every base column on the
    * source (SET-star / VALUES-star), while explicit `set` lists lift
    * that — source and base schemas may differ arbitrarily. Source is
    * UNIQUE per key (collapse upstream with the [[applyChanges]]
    * latest-wins window; SQL MERGE makes multiple matches an error for
    * the same reason — the result would depend on join order).
    *
    * Matched-ness is discriminated by presence MARKER columns, not key
    * nullness: a base row whose key is NULL never equi-joins, and
    * classifying it by `t.key IS NULL` would misroute it to the
    * NOT-MATCHED family and silently drop it. With markers it lands in
    * WHEN NOT MATCHED BY SOURCE exactly as SQL MERGE routes it (and a
    * null-key source row is NOT MATCHED — insertable, never matched).
    *
    * Scale: ONE full-outer join on the key — broadcast when the source
    * is dimension-sized, shuffle otherwise — then a single projected
    * CASE; the base is never scanned twice and nothing driver-side
    * touches data. Clause conditions and SET lists compile into the
    * same projection, so adding clauses costs zero extra passes. */
  def merge(base: DataFrame, source: DataFrame, keyCol: String,
      whenMatched: Seq[MergeClause] = Nil,
      whenNotMatched: Seq[MergeClause] = Nil,
      whenNotMatchedBySource: Seq[MergeClause] = Nil): DataFrame = {
    val payload = base.columns.toIndexedSeq
    require(source.columns.contains(keyCol),
      s"merge: source must carry the join key $keyCol")
    val starClauses = (whenMatched ++ whenNotMatched)
      .filter(c => c.action != "delete" && c.set.isEmpty)
    if (starClauses.nonEmpty)
      require(payload.forall(source.columns.contains),
        s"SET-star merge clause: source must carry every base column; " +
          s"missing ${payload.filterNot(source.columns.contains).mkString(", ")}")
    (whenMatched ++ whenNotMatched).foreach(c => c.set.keys.foreach(k =>
      require(payload.contains(k),
        s"merge SET list names $k, not a base column")))
    def validate(cs: Seq[MergeClause], allowed: Set[String], fam: String) =
      cs.foreach(c => require(allowed(c.action),
        s"$fam clause cannot ${c.action} (allowed: ${allowed.mkString("/")})"))
    validate(whenMatched, Set("update", "delete"), "WHEN MATCHED")
    validate(whenNotMatched, Set("insert"), "WHEN NOT MATCHED")
    validate(whenNotMatchedBySource, Set("delete"),
      "WHEN NOT MATCHED BY SOURCE")
    // presence markers (see scaladoc): non-null iff that side has a row
    val t = base.withColumn("__t", lit(true)).alias("t")
    val s = source.withColumn("__s", lit(true)).alias("s")
    val j = t.join(s,
      col(s"t.`$keyCol`") === col(s"s.`$keyCol`"), "full_outer")
    // clause ids: KEEP/DROP sentinels + a global index per update/insert
    // clause (each may carry its own SET list, so the projection must
    // know WHICH clause fired, not just the action family)
    val Keep = -1; val Drop = -2
    val matchedIdx = whenMatched.zipWithIndex
    val notMatchedIdx =
      whenNotMatched.zipWithIndex.map { case (c, i) => (c, i + whenMatched.length) }
    // first-match-wins fold; the default is the SQL MERGE no-clause
    // behavior for each family (keep / don't insert / keep)
    def chain(cs: Seq[(MergeClause, Int)], dflt: Int) =
      cs.foldRight(lit(dflt)) { case ((c, id), els) =>
        when(c.cond.map(expr).getOrElse(lit(true)),
          lit(if (c.action == "delete") Drop else id)).otherwise(els)
      }
    val tP = col("t.`__t`"); val sP = col("s.`__s`")
    val act = when(tP.isNotNull && sP.isNotNull, chain(matchedIdx, Keep))
      .when(tP.isNull, chain(notMatchedIdx, Drop))
      .otherwise(chain(whenNotMatchedBySource.map((_, Keep)), Keep))
    val applying = (matchedIdx ++ notMatchedIdx).filter(_._1.action != "delete")
    val projected = payload.map { c =>
      val dt = base.schema(c).dataType
      val tC = col(s"t.`$c`")
      val sC = if (source.columns.contains(c)) col(s"s.`$c`")
               else lit(null).cast(dt)
      applying.foldRight(tC) { case ((cl, id), els) =>
        val v =
          if (cl.set.isEmpty) sC
          else cl.set.get(c).map(e => expr(e).cast(dt)).getOrElse(
            if (cl.action == "update") tC else lit(null).cast(dt))
        when(col("__act") === id, v).otherwise(els)
      }.as(c)
    }
    j.withColumn("__act", act)
      .filter(col("__act") =!= Drop)
      .select(projected: _*)
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
