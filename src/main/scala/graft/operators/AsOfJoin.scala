package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of (most-recent-prior) join: for every left row, attach the
  * latest right row with the same key whose timestamp is ≤ the left
  * timestamp. Spark has no native as-of operator; the classic scalable
  * formulation is union → single sort per key → running last-non-null,
  * which costs ONE shuffle of (left ∪ right) instead of a range-join's
  * per-key quadratic probe:
  *
  *   1. tag both sides, union on (key, ts) with right rows sorting
  *      before left rows at equal ts (ties resolve to the right row —
  *      standard backward as-of `>=` semantics);
  *   2. running `last(right_payload, ignoreNulls=true)` over
  *      (key ORDER BY ts, side ROWS UNBOUNDED PRECEDING) hands each
  *      left row its predecessor;
  *   3. keep left rows, optionally null out matches older than
  *      `tolerance`.
  *
  * At 100 TB both sides shuffle-partition on the key; the window keeps
  * one running struct per partition — no buffering, no skew beyond the
  * key distribution itself (salt hot keys upstream if needed).
  */
object AsOfJoin {

  /** @param left     probe side
    * @param right    build side (its non-key columns come back prefixed)
    * @param keyCols  equi-key shared by both sides
    * @param leftTs   event-time column on `left`
    * @param rightTs  event-time column on `right`
    * @param prefix   prefix for attached right columns
    * @param toleranceSeconds max lookback; None = unbounded
    */
  def backward(
      left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTs: String, rightTs: String,
      prefix: String = "asof_",
      toleranceSeconds: Option[Long] = None): DataFrame = {
    val rightPayloadCols =
      right.columns.filterNot(c => keyCols.contains(c) || c == rightTs).toSeq
    val payloadType = StructType(
      right.schema.fields.filter(f => rightPayloadCols.contains(f.name)))
    val leftType = StructType(left.schema.fields)

    val rTagged = right.select(
      keyCols.map(col) ++ Seq(
        col(rightTs).as("__ts"),
        lit(0).as("__side"),
        struct(rightPayloadCols.map(col): _*).as("__payload"),
        lit(null).cast(leftType).as("__left")): _*)
    val lTagged = left.select(
      keyCols.map(col) ++ Seq(
        col(leftTs).as("__ts"),
        lit(1).as("__side"),
        lit(null).cast(payloadType).as("__payload"),
        struct(left.columns.toIndexedSeq.map(col): _*).as("__left")): _*)

    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withPrev = lTagged.unionByName(rTagged)
      .withColumn("__prev",
        last(when(col("__side") === 0,
          struct(col("__ts").as("t"), col("__payload").as("p"))),
          ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val withinTol = toleranceSeconds match {
      case Some(tol) => col("__prev").isNotNull &&
        unix_micros(col("__ts")) - unix_micros(col("__prev.t")) <= tol * 1000000L
      case None => col("__prev").isNotNull
    }
    val matched = when(withinTol, col("__prev"))

    val leftCols = left.columns.map(n => col(s"__left.$n").as(n)).toSeq
    val asofTs = matched.getField("t").as(s"$prefix$rightTs")
    val rightCols = rightPayloadCols.map(n =>
      matched.getField("p").getField(n).as(s"$prefix$n"))
    withPrev.select(leftCols ++ (asofTs +: rightCols): _*)
  }
}
