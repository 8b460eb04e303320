package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeSet, Descending, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics

/** Physical backward as-of join: a single synchronized merge pass over
  * two co-partitioned, (key, ts)-sorted children.
  *
  * Why a custom [[SparkPlan]] instead of the composed union+window
  * ([[graft.operators.AsOfJoin]]): both cost exactly one shuffle per
  * side, but the window formulation materializes every row of BOTH
  * sides as a null-padded superset struct (left payload ∪ right
  * payload), sorts that union, and drags a running `last(...)` struct
  * through the window machinery. The merge needs none of it — each
  * side shuffles only its own columns, the sorts are per-side, and the
  * probe is a two-pointer scan holding ONE copied right row
  * (`O(1)` state per partition, zero buffering, no
  * WindowGroupLimit/WindowExec in the plan).
  *
  * Scale behavior: distribution = `ClusteredDistribution(keys)` per
  * child, so EnsureRequirements co-partitions the sides (and AQE may
  * coalesce both exchanges consistently, as for any shuffled join);
  * ordering = keys ++ ts per side, so the sorts spill through
  * UnsafeExternalSorter like any sort-merge join. Skew = key skew, the
  * same as the window formulation; salt upstream if a single key is
  * pathological.
  *
  * Matching: among right rows with ordering-equal key, the greatest
  * `rightTs ≤ leftTs` wins; equal-`rightTs` duplicates resolve to the
  * last in sort order (nondeterministic unless (key, rightTs) is
  * unique — same contract as the composed operator and DuckDB ASOF).
  * Null ordering follows the sort (nulls first), so a null `rightTs`
  * sorts before — and therefore matches — any left timestamp, again
  * matching the composed window's ordering semantics.
  */
case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    rightVals: Seq[Expression],
    rightOut: Seq[Attribute],
    forward: Boolean,
    left: SparkPlan,
    right: SparkPlan)
  extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ rightOut

  override def producedAttributes: AttributeSet = AttributeSet(rightOut)

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext, "number of matched left rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  /** Forward direction = the SAME merge over time-REVERSED streams:
    * sort ts descending and flip the match comparison; "greatest
    * rightTs ≤ leftTs" becomes "smallest rightTs ≥ leftTs" because the
    * last retained match in a descending stream is the smallest
    * still-qualifying one. (Descending sorts put null ts LAST, so a
    * null rightTs never matches in forward mode — backward keeps the
    * window formulation's nulls-first behavior.) */
  private def tsDir = if (forward) Descending else Ascending

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, tsDir),
      rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTs, tsDir))

  /** Left rows stream through in input order, so the left child's
    * partitioning and ordering survive verbatim (the attached right
    * columns are new attributes and cannot invalidate either). */
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    val keyTypes = leftKeys.map(_.dataType)
    val tsType = leftTs.dataType
    val lOut = left.output
    val rOut = right.output
    val lKeysB = leftKeys
    val rKeysB = rightKeys
    val lTsB = leftTs
    val rTsB = rightTs
    val rValsB = rightVals
    val outAttrs = output
    val nRightOut = rightOut.length
    val fwd = forward

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // Projections are codegen'd and hold reusable row buffers — one
      // instance per use site so compared values never share a buffer.
      val lKeyProj = UnsafeProjection.create(lKeysB, lOut)
      val rKeyProj = UnsafeProjection.create(rKeysB, rOut)
      val lTsProj = UnsafeProjection.create(Seq(lTsB), lOut)
      val rTsProj = UnsafeProjection.create(Seq(rTsB), rOut)
      val rValProj = UnsafeProjection.create(rValsB, rOut)
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val tsOrd = RowOrdering.createNaturalAscendingOrdering(Seq(tsType))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(nRightOut)

      // Lookahead right row. Sorted-iterator rows are only overwritten
      // by the NEXT next() call, so holding the head without advancing
      // is safe; anything retained across advances is copied.
      var rHead: InternalRow = if (rIter.hasNext) rIter.next() else null
      var lastVal: InternalRow = null // copied projected right values
      var lastKey: UnsafeRow = null   // copied key of lastVal

      lIter.map { lrow =>
        val lk = lKeyProj(lrow)
        if (lastVal != null && keyOrd.compare(lastKey, lk) != 0) {
          lastVal = null
          lastKey = null
        }
        var scan = true
        while (scan && rHead != null) {
          val rk = rKeyProj(rHead)
          val c = keyOrd.compare(rk, lk)
          if (c < 0) {
            // Keys on this side only grow — rows below the current left
            // key can never match a later left row. Drop, don't retain.
            rHead = if (rIter.hasNext) rIter.next() else null
          } else if (c == 0 && {
            val cmp = tsOrd.compare(rTsProj(rHead), lTsProj(lrow))
            if (fwd) cmp >= 0 else cmp <= 0
          }) {
            lastVal = rValProj(rHead).copy()
            lastKey = rk.copy()
            rHead = if (rIter.hasNext) rIter.next() else null
          } else {
            scan = false
          }
        }
        numOutputRows += 1
        if (lastVal != null) {
          numMatched += 1
          resultProj(joined(lrow, lastVal))
        } else {
          resultProj(joined(lrow, nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy mapping [[AsOfJoinPlan]] → [[AsOfJoinExec]].
  * Injected per-session ([[AsOfJoinNative.register]] via
  * `experimental.extraStrategies`) or globally via
  * `spark.sql.extensions=graft.GraftExtensions`. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsOfJoinPlan =>
      AsOfJoinExec(p.leftKeys, p.rightKeys, p.leftTs, p.rightTs,
        p.rightVals, p.rightOut, p.forward,
        planLater(p.left), planLater(p.right)) :: Nil
    case _ => Nil
  }
}
