package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Order-preserving IEEE-754 bit lift: maps a double to a 64-bit word
  * whose UNSIGNED bit-string order equals the double's total order —
  * the standard sign-flip trick (positive doubles get the sign bit
  * set; negative doubles are bitwise-complemented, reversing their
  * descending raw-bits order). The lift is a bijection on bit
  * patterns (NaNs canonicalized by `doubleToLongBits`), so selection /
  * quantile machinery built for integral domains becomes EXACT over
  * doubles: refine on the lifted bits, un-lift the answer.
  *
  * Pinned total order (IeeeSortableSpec): -Inf < finite negatives <
  * -0.0 < +0.0 < finite positives < +Inf < NaN, with -0.0 and +0.0
  * DISTINCT lifted values (callers comparing against engines that
  * collapse the two should normalize upstream).
  */
case class DoubleSortableBits(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_ieee_sortable"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a double input, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    IeeeSortable.lift(input.asInstanceOf[Double])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.IeeeSortable.lift($c)")

  override protected def withNewChildInternal(
      newChild: Expression): DoubleSortableBits = copy(child = newChild)
}

object IeeeSortable {

  /** double → unsigned-ordered 64-bit word (stored in a signed long;
    * compare via unsigned ops / bit windows, not signed `<`). */
  def lift(d: Double): Long = {
    val raw = java.lang.Double.doubleToLongBits(d)
    if (raw < 0) ~raw else raw ^ Long.MinValue
  }

  /** Inverse of [[lift]] (bit-exact for every non-NaN input; NaNs
    * round-trip to the canonical quiet NaN). */
  def unlift(u: Long): Double =
    java.lang.Double.longBitsToDouble(
      if (u < 0) u ^ Long.MinValue else ~u)

  /** [[lift]] shifted into SIGNED long order (top bit flipped): use
    * when the lifted values flow through ordinary `<`/min/max rather
    * than bit windows — e.g. min/max file statistics. Same total
    * order, same bijection. */
  def liftSigned(d: Double): Long = lift(d) ^ Long.MinValue

  def unliftSigned(s: Long): Double = unlift(s ^ Long.MinValue)
}
