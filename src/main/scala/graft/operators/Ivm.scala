package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental view maintenance for keyed count/sum aggregates — the
  * 100 TB answer to "the dashboard aggregate must reflect today's CDC
  * feed": fold ONLY the change batch into the materialized aggregate,
  * never rescan the base table. A day's feed touching 0.1% of keys
  * costs one join of the feed against the base (to recover old images)
  * plus one aggregate-sized merge — the full recompute it replaces
  * costs a complete scan of the fact table.
  *
  * Delta algebra (count and sum are the self-maintainable aggregates;
  * min/max are NOT — a deleted minimum needs a rescan of its group,
  * which is why they're excluded by design, not omission):
  *
  *   delete d : (-1, -measures(old d))      to old group
  *   update u : (-1, -measures(old u)) to old group, (+1, +measures(new u)) to new group
  *   insert i : (+1, +measures(i))          to new group
  *
  * The feed carries NEW images only (the common CDC shape); old images
  * are recovered by an inner join of the touched keys against the
  * PRE-CHANGE base snapshot. Groups whose count reaches 0 drop out —
  * maintained state never accretes empty groups. Equivalence
  * `maintain(agg(base), feed) ≡ agg(applyChanges(base, feed))` is the
  * whole contract; IvmSpec pins it on randomized feeds and q111 pins
  * it against the SQL oracle that recomputes from scratch.
  */
object Ivm {

  /** Maintain `agg` (schema: groupCol, countCol, sumCols…) under one
    * change batch. `base` is the pre-change snapshot (keyCol, groupCol,
    * sumCols…); `changes` is (opCol ∈ insert|update|delete, keyCol,
    * groupCol, sumCols…) carrying new images (ignored for deletes),
    * at most ONE op per key per batch — collapse multi-op feeds to the
    * latest op first (the same seqCol discipline as
    * [[Upsert.applyChanges]]). Sum columns must be exact (long) —
    * lift money through cents upstream. */
  def maintainSumCountAgg(agg: DataFrame, base: DataFrame,
      changes: DataFrame, keyCol: String, opCol: String, groupCol: String,
      countCol: String, sumCols: Seq[String]): DataFrame = {
    val measures = groupCol +: sumCols
    val oldImages = changes
      .filter(col(opCol).isin("delete", "update"))
      .select(col(keyCol))
      .join(base.select((keyCol +: measures).map(col): _*), keyCol)
      .select(measures.map(col) :+ lit(-1L).as("__w"): _*)
    val newImages = changes
      .filter(col(opCol).isin("insert", "update"))
      .select(measures.map(col) :+ lit(1L).as("__w"): _*)
    val deltas = oldImages.unionByName(newImages)
      .groupBy(col(groupCol))
      .agg(sum(col("__w")).as("__dn"),
        sumCols.map(c => sum(col(c) * col("__w")).as(s"__d_$c")): _*)
    agg.join(deltas, Seq(groupCol), "full_outer")
      .select(col(groupCol) +:
        (coalesce(col(countCol), lit(0L)) + coalesce(col("__dn"), lit(0L)))
          .as(countCol) +:
        sumCols.map(c =>
          (coalesce(col(c), lit(0L)) + coalesce(col(s"__d_$c"), lit(0L)))
            .as(c)): _*)
      .filter(col(countCol) > 0L)
  }
}
