package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeSet}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}

/** Logical node for the native backward as-of join — the whole-operator
  * extension point ([[graft.operators.AsOfJoin]] is the composed
  * union+window formulation of the same semantics; this node exists so
  * the planner can pick a purpose-built physical operator,
  * [[AsOfJoinExec]], via [[AsOfJoinStrategy]]).
  *
  * Semantics: for every `left` row, attach the `right` row with an
  * ordering-equal key whose `rightTs` is the greatest value ≤ `leftTs`
  * (left outer — no match ⇒ nulls). Key equality is ORDERING equality
  * (null keys group together), matching the composed operator's
  * `Window.partitionBy`, not SQL equi-join null semantics.
  *
  * The node is built already-resolved: children are analyzed plans,
  * every expression is a bound [[Attribute]] of the respective child,
  * and `rightOut` are fresh nullable attributes (declared via
  * `producedAttributes` so CheckAnalysis does not read them as missing
  * inputs). Catalyst treats the node as an optimization barrier —
  * exactly right, since no relational rewrite is valid through an
  * order-sensitive match.
  *
  * @param rightVals right-side source attributes carried to the output
  *                  (`rightTs` first, then payload), in output order
  * @param rightOut  fresh prefixed output attributes, 1:1 with
  *                  `rightVals`, always nullable
  * @param forward   false = most-recent-prior (`rightTs ≤ leftTs`,
  *                  greatest wins); true = earliest-following
  *                  (`rightTs ≥ leftTs`, smallest wins)
  * @param broadcastRight plan the broadcast-right physical path
  *                  ([[BroadcastAsOfJoinExec]]): the right side ships
  *                  whole to every executor and the left side is
  *                  probed IN PLACE — zero exchange, zero sort on the
  *                  big side. Set when the right side is
  *                  dimension-sized (the same judgment as a broadcast
  *                  hash join's build side).
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTs: Attribute,
    rightTs: Attribute,
    rightVals: Seq[Attribute],
    rightOut: Seq[Attribute],
    forward: Boolean = false,
    broadcastRight: Boolean = false)
  extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ rightOut

  override def producedAttributes: AttributeSet = AttributeSet(rightOut)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}
