package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed snapshot diff — the refresh audit between two generations of
  * a corpus/table (yesterday's crawl vs today's, pre- vs
  * post-migration): classify every key as added / removed / changed /
  * unchanged before the new generation is allowed to replace the old.
  * This is the read-side complement of [[Upsert.applyChanges]] (which
  * FOLDS a change stream in; diff RECOVERS the change stream between
  * two full snapshots when no CDC feed exists).
  *
  * Shape: one full-outer join on the key plus a null-safe struct
  * comparison of the non-key columns — no per-column UDFs, no
  * driver-side anything; at scale the join shuffles both snapshots
  * once on the key (bucket both snapshots by the key and it is
  * shuffle-free). The struct comparison `<=>` is null-safe per field,
  * so a NULL→value transition registers as `changed`, not as a silent
  * equality. Keys themselves must be non-null (SQL join semantics
  * would orphan null keys into one `added` + one `removed` row — the
  * standard contract for keyed tables; assert upstream).
  */
object Diff {

  /** Per-key diff of two same-schema snapshots: (key columns, status)
    * with status ∈ added | removed | changed | unchanged (relative to
    * `oldDf` → `newDf`). Column set and types must match; the key is
    * `keyCols`, everything else is compared. */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    require(oldDf.columns.sorted.sameElements(newDf.columns.sorted),
      s"snapshot schemas differ: ${oldDf.columns.mkString(",")} vs " +
        newDf.columns.mkString(","))
    val dataCols = oldDf.columns.toSeq.filterNot(keyCols.contains)
    val o = oldDf.select(
      keyCols.map(col) :+ struct(dataCols.map(col): _*).as("__old"): _*)
    val n = newDf.select(
      keyCols.map(col) :+ struct(dataCols.map(col): _*).as("__new"): _*)
    o.join(n, keyCols, "full_outer")
      .select(keyCols.map(col) :+
        when(col("__old").isNull, lit("added"))
          .when(col("__new").isNull, lit("removed"))
          .when(!(col("__old") <=> col("__new")), lit("changed"))
          .otherwise(lit("unchanged")).as("status"): _*)
  }

  /** The one-line audit summary over [[snapshotDiff]]: per-status row
    * count plus an exact key checksum (order-free long sum), enough to
    * compare two independently-computed diffs without moving rows. */
  def diffSummary(oldDf: DataFrame, newDf: DataFrame, keyCol: String)
      : DataFrame =
    snapshotDiff(oldDf, newDf, Seq(keyCol))
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n"), sum(col(keyCol)).as("key_sum"))
}
