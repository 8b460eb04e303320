package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Exact-equivalent fast path for Spark's `round(double, scale)`.
  *
  * Spark's `Round` on DoubleType is `BigDecimal.valueOf(x)
  * .setScale(s, HALF_UP).toDouble` per row (verified against the 4.1.2
  * bytecode) — a `Double.toString` + two BigDecimal allocations in the
  * innermost scoring loop. Measured on the q84 k-NN shape (40M
  * cosines, sf1.0, local[32]): the `round(_, 6)` alone costs ~7s of an
  * 11s scoring pass — the single hottest instruction of every
  * similarity pipeline, since the 6-dp round is the engine's
  * cross-engine determinism contract and so wraps EVERY emitted
  * similarity.
  *
  * The fast path: n = round-half-away-from-zero(x·10^s) as a double
  * flop, result n/10^s. This equals the BigDecimal result EXCEPT
  * possibly when x·10^s lies within ~1e-7 of a half-integer boundary
  * (double multiply rounding could land the approximation on the wrong
  * side, and `BigDecimal.valueOf` judges by the SHORTEST decimal
  * representation, not the product). So: values within 1e-4 of a
  * boundary — plus non-finite inputs and |x·10^s| ≥ 1e9, where the
  * error bound of the product approaches the guard window — take the
  * exact BigDecimal path. The guard window is ~10^5 × wider than the
  * worst-case product error at 1e9 (ulp(1e9)/2 ≈ 6e-8), so fast and
  * slow paths can never disagree: near-boundary rows always go slow,
  * and far-from-boundary rows round identically under any
  * representation within the window. The slow path fires on a ~1e-4
  * measure-zero slice of real-valued inputs (exact decimal values like
  * literals and money land OFF the half-boundary after scaling, so
  * corpora of 6-dp-representable values stay 100% fast).
  *
  * Not an approximation: `FastRoundSpec` fuzzes millions of doubles
  * (uniform, adversarial near-boundary, shortest-repr half-ties)
  * asserting bit equality with Spark's `round`, and every oracle query
  * that switched to this expression re-verified hash-identical.
  */
case class FastRound(child: Expression, scale: Int)
    extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_round"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType && scale >= 0 && scale <= 15)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a double input and a scale in [0, 15], " +
        s"got ${child.dataType.sql} at scale $scale")

  override protected def nullSafeEval(input: Any): Any =
    FastRound.round(input.asInstanceOf[Double], scale)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.FastRound.round($c, $scale)")

  override protected def withNewChildInternal(newChild: Expression): FastRound =
    copy(child = newChild)
}

object FastRound {
  private val pow10: Array[Double] = (0 to 15).map(i => math.pow(10, i)).toArray

  /** Bit-equal to Spark's `round(x, scale)` for doubles; static so the
    * generated code is one JIT-inlined call. */
  def round(x: Double, scale: Int): Double = {
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) return x
    val p = pow10(scale)
    val f = x * p
    if (f >= 1e9 || f <= -1e9) return slow(x, scale)
    // half-away-from-zero in one flop each way
    val n = if (f >= 0) Math.floor(f + 0.5) else Math.ceil(f - 0.5)
    // distance of the scaled value from its rounding boundary; near the
    // boundary the product approximation (and the shortest-repr
    // subtlety of BigDecimal.valueOf) could pick the other side
    val b = if (f >= 0) f + 0.5 else f - 0.5
    val frac = b - Math.floor(b)
    if (frac < 1e-4 || frac > 0.9999) return slow(x, scale)
    if (n == 0d) 0d else n / p // normalize -0.0 like BigDecimal does
  }

  private def slow(x: Double, scale: Int): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(scale, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Column form; requires [[VectorFunctions.register]] on the owning
    * session (all graft operators register it themselves). */
  def round6(c: Column): Column =
    call_function(VectorFunctions.fastRoundName, c, org.apache.spark.sql.functions.lit(6))
}
