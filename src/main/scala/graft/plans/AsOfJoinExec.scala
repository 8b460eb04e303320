package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeSet, Descending, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, ClusteredDistribution, Distribution, IdentityBroadcastMode, Partitioning, UnspecifiedDistribution}
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

/** Broadcast-right physical as-of join: the answer to the shape where
  * [[AsOfJoinExec]] overpays — a 100 TB fact stream asof-joined to a
  * dimension-sized timeline (price marks, config changes, deploys).
  * The merge exec demands `ClusteredDistribution` on BOTH children, so
  * the huge left side eats a full shuffle AND a per-partition sort it
  * doesn't need. Here the right side ships once per executor through a
  * `BroadcastExchange` (`IdentityBroadcastMode`, the same machinery as
  * a broadcast nested-loop build side) and each left row probes a
  * per-key ts-sorted array by BINARY SEARCH, in place: zero Exchange,
  * zero Sort, left partitioning/ordering preserved verbatim — the plan
  * above the join keeps whatever structure the scan gave it.
  *
  * The probe index (key → ts-sorted value rows) is grouped and sorted
  * ONCE PER EXECUTOR, memoized by broadcast id in a small LRU (a
  * 100k-task stage must not re-sort the dimension 100k times — the
  * HashedRelation-style amortization, done at the consumer since
  * IdentityBroadcastMode ships raw rows). Match semantics are
  * IDENTICAL to [[AsOfJoinExec]] by spec pin (AsOfJoinNativeSpec runs
  * both paths over the adversarial shapes): backward = greatest
  * `rightTs ≤ leftTs` (equal-ts duplicates resolve to the last in ts
  * order), forward = smallest `rightTs ≥ leftTs`, null timestamps
  * ordering-compared exactly as the merge's sort placed them.
  * One caveat inherited from hash lookup: keys match by binary
  * representation (like every broadcast hash join); normalize ±0.0 /
  * NaN float keys upstream — integral/string keys (the universal
  * case) are unaffected.
  */
case class BroadcastAsOfJoinExec(
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
    UnspecifiedDistribution ::
      BroadcastDistribution(IdentityBroadcastMode) :: Nil

  // the left side streams through untouched: no exchange, no sort
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
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

    val bcast = right.executeBroadcast[Array[InternalRow]]()
    // ReuseExchange can hand the SAME IdentityBroadcastMode exchange to
    // two different as-of joins over one right-side plan; the cache key
    // must therefore carry the index-shaping projections, not just the
    // broadcast id, or join #2 would probe join #1's index. Expression
    // toString (name#exprId) is deterministic and identical across the
    // joins exactly when the built index would be identical.
    val indexKey = s"${bcast.id}:" +
      (rKeysB ++ (rTsB +: rValsB)).map(_.toString).mkString("|")
    left.execute().mapPartitions { lIter =>
      val tsOrd = RowOrdering.createNaturalAscendingOrdering(Seq(tsType))
      val index = BroadcastAsOfJoinExec.indexFor(indexKey, {
        val rKeyProj = UnsafeProjection.create(rKeysB, rOut)
        val rTsProj = UnsafeProjection.create(Seq(rTsB), rOut)
        val rValProj = UnsafeProjection.create(rValsB, rOut)
        val groups = new java.util.HashMap[UnsafeRow,
          scala.collection.mutable.ArrayBuffer[(UnsafeRow, UnsafeRow)]]()
        bcast.value.foreach { row =>
          val k = rKeyProj(row).copy()
          var buf = groups.get(k)
          if (buf == null) {
            buf = new scala.collection.mutable.ArrayBuffer[(UnsafeRow, UnsafeRow)]()
            groups.put(k, buf)
          }
          buf += ((rTsProj(row).copy(), rValProj(row).copy()))
        }
        val built = new java.util.HashMap[UnsafeRow,
          (Array[UnsafeRow], Array[UnsafeRow])](groups.size())
        groups.forEach { (k, buf) =>
          val sorted = buf.sortWith((a, b) => tsOrd.compare(a._1, b._1) < 0)
          built.put(k, (sorted.map(_._1).toArray, sorted.map(_._2).toArray))
        }
        built
      })

      val lKeyProj = UnsafeProjection.create(lKeysB, lOut)
      val lTsProj = UnsafeProjection.create(Seq(lTsB), lOut)
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(nRightOut)

      lIter.map { lrow =>
        val grp = index.get(lKeyProj(lrow))
        var matched: InternalRow = null
        if (grp != null) {
          val (ts, vals) = grp
          val lts = lTsProj(lrow)
          // backward: last index with ts[i] <= lts (upper bound - 1);
          // forward: first index with ts[i] >= lts (lower bound)
          var lo = 0
          var hi = ts.length
          while (lo < hi) {
            val mid = (lo + hi) >>> 1
            val c = tsOrd.compare(ts(mid), lts)
            if (if (fwd) c < 0 else c <= 0) lo = mid + 1 else hi = mid
          }
          if (fwd) { if (lo < ts.length) matched = vals(lo) }
          else if (lo > 0) matched = vals(lo - 1)
        }
        numOutputRows += 1
        if (matched != null) {
          numMatched += 1
          resultProj(joined(lrow, matched))
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

object BroadcastAsOfJoinExec {
  // per-executor probe-index memoization, keyed by broadcast id PLUS
  // the key/ts/val projection signature (ReuseExchange shares one
  // exchange across distinct as-of joins — see doExecute). Small LRU
  // (not unbounded): a finished query's index must not pin executor
  // memory forever, and concurrent as-of stages rarely exceed a handful
  // of live dimension broadcasts. Built under the lock so exactly one
  // task per executor pays the group+sort.
  private val cache =
    new java.util.LinkedHashMap[String, AnyRef](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, AnyRef]): Boolean = size > 8
    }

  private def indexFor[T <: AnyRef](id: String, build: => T): T =
    cache.synchronized {
      val got = cache.get(id)
      if (got != null) got.asInstanceOf[T]
      else { val b = build; cache.put(id, b); b }
    }
}

/** Planner strategy mapping [[AsOfJoinPlan]] → [[AsOfJoinExec]] (both
  * sides shuffled+sorted, the symmetric-scale path) or
  * [[BroadcastAsOfJoinExec]] (dimension-sized right, zero exchange on
  * the left) per the plan's `broadcastRight` flag.
  * Injected per-session ([[AsOfJoinNative.register]] via
  * `experimental.extraStrategies`) or globally via
  * `spark.sql.extensions=graft.GraftExtensions`. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsOfJoinPlan if p.broadcastRight =>
      BroadcastAsOfJoinExec(p.leftKeys, p.rightKeys, p.leftTs, p.rightTs,
        p.rightVals, p.rightOut, p.forward,
        planLater(p.left), planLater(p.right)) :: Nil
    case p: AsOfJoinPlan =>
      AsOfJoinExec(p.leftKeys, p.rightKeys, p.leftTs, p.rightTs,
        p.rightVals, p.rightOut, p.forward,
        planLater(p.left), planLater(p.right)) :: Nil
    case _ => Nil
  }
}
