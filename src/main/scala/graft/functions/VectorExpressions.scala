package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Native dot product over two numeric arrays: the hot inner loop of
  * every similarity/near-dup operator, as a Catalyst `Expression` with
  * whole-stage codegen — a tight primitive `double` loop instead of the
  * interpreted per-element lambda dispatch of
  * `aggregate(zip_with(...))` (measured ~5× on pairwise scoring; the
  * HOF fold also allocates a zipped array per row).
  *
  * Semantics match the HOF formulation exactly: strict left-to-right
  * summation from 0.0 (bit-identical to the DuckDB oracle's
  * list_dot_product), null if lengths differ or any element is null.
  * Float inputs are widened to double per element (same as
  * `cast("array<double>")`, without materializing the cast array).
  */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_vector_dot"

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left).isDefined && elemType(right).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>/array<double> inputs, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val lf = elemType(left).contains(FloatType)
    val rf = elemType(right).contains(FloatType)
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemType(left).contains(FloatType)) "getFloat" else "getDouble"
    val rGet = if (elemType(right).contains(FloatType)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("sum")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += ((double) $a.$lGet($i)) * ((double) $b.$rGet($i));
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $s;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}

/** Integer twin of [[VectorDot]] for quantized vectors
  * (array<bigint>/array<int>): exact 64-bit accumulation, no FP at
  * all — the int8-quantized ANN scoring loop ([[graft.operators
  * .Similarity.quantizedTopK]]) runs ~dim multiply-adds per pair, so
  * the interpreted `aggregate(zip_with(...))` fold's per-element
  * lambda dispatch and zipped-array allocation dominate exactly like
  * they did for the float path. Null if lengths differ or any element
  * is null, same contract as VectorDot. */
case class VectorDotLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_vector_dot_long"

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (IntegerType | LongType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left).isDefined && elemType(right).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<int>/array<bigint> inputs, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val li = elemType(left).contains(IntegerType)
    val ri = elemType(right).contains(IntegerType)
    var s = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (li) x.getInt(i).toLong else x.getLong(i)
      val yv = if (ri) y.getInt(i).toLong else y.getLong(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemType(left).contains(IntegerType)) "getInt" else "getLong"
    val rGet = if (elemType(right).contains(IntegerType)) "getInt" else "getLong"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("sum")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $s = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += ((long) $a.$lGet($i)) * ((long) $b.$rGet($i));
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $s;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDotLong =
    copy(left = newLeft, right = newRight)
}

/** Nearest-codeword argmin for product quantization: code =
  * first index c minimizing ‖cw_c‖² − 2·⟨sv, cw_c⟩ over a codebook of
  * `k` codewords, passed FLATTENED (row-major, k·subdim doubles) as a
  * foldable array literal. The codebook rides into generated code as
  * ONE reference object with a runtime loop over it — constant code
  * size at any m·k — where the previous literal-inlined
  * `array(score…) + array_position(array_min)` form emitted O(k·subdim)
  * expression nodes per subspace and blew janino's 64 KB method limit
  * at the production m=8/k=256 budget (whole-stage codegen fell back
  * to interpreted for the entire encode stage, measured on the 1M-row
  * ivfpqscale run).
  *
  * Bit-parity with the expression form it replaces (and so with every
  * existing DuckDB oracle replay): the dot is the same strict
  * left-fold from 0.0 as [[VectorDot]], the score is the same
  * `norm − 2.0·dot`, the codeword norms are the same left-fold Σx²
  * precomputed driver-side, and strict `<` keeps the FIRST minimum —
  * exactly what `array_position(scores, array_min(scores))` selects.
  * Null when the subvector's length ≠ subdim or any element is null. */
case class PqNearestCode(vec: Expression, book: Expression, kExpr: Expression)
    extends TernaryExpression {

  override def first: Expression = vec
  override def second: Expression = book
  override def third: Expression = kExpr
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pq_nearest"

  private def vecFloat: Boolean = vec.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val vecOk = vec.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    val bookOk = book.foldable && (book.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    val kOk = kExpr.foldable && kExpr.dataType == IntegerType
    if (vecOk && bookOk && kOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float|double> vec, foldable " +
        s"array<double> book, foldable int k); got ${vec.dataType.sql}, " +
        s"${book.dataType.sql}, ${kExpr.dataType.sql}")
  }

  @transient private lazy val k: Int =
    kExpr.eval().asInstanceOf[Int]
  @transient private lazy val bk: Array[Double] =
    book.eval().asInstanceOf[ArrayData].toDoubleArray()
  /** Left-fold Σx² per codeword — same association order as
    * [[graft.operators.ProductQuant.norm2]]. */
  @transient private lazy val norms: Array[Double] = {
    val sub = bk.length / k
    Array.tabulate(k) { c =>
      var acc = 0.0
      var j = 0
      while (j < sub) { acc += bk(c * sub + j) * bk(c * sub + j); j += 1 }
      acc
    }
  }

  override def nullSafeEval(v: Any, bookV: Any, kV: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val sub = bk.length / k
    if (x.numElements() != sub) return null
    val vf = vecFloat
    var best = 0
    var bestScore = Double.PositiveInfinity
    var c = 0
    while (c < k) {
      var acc = 0.0
      var j = 0
      while (j < sub) {
        if (x.isNullAt(j)) return null
        acc += (if (vf) x.getFloat(j).toDouble else x.getDouble(j)) *
          bk(c * sub + j)
        j += 1
      }
      val score = norms(c) - 2.0 * acc
      if (score < bestScore) { bestScore = score; best = c }
      c += 1
    }
    best
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (vecFloat) "getFloat" else "getDouble"
    val bkRef = ctx.addReferenceObj("pqBook", bk, "double[]")
    val nmRef = ctx.addReferenceObj("pqNorms", norms, "double[]")
    nullSafeCodeGen(ctx, ev, (v, _, _) => {
      val (sub, c, j, acc, score, best, bestScore) =
        (ctx.freshName("sub"), ctx.freshName("c"), ctx.freshName("j"),
          ctx.freshName("acc"), ctx.freshName("score"),
          ctx.freshName("best"), ctx.freshName("bestScore"))
      s"""
         |final int $sub = $bkRef.length / $k;
         |if ($v.numElements() != $sub) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $best = 0;
         |  double $bestScore = Double.POSITIVE_INFINITY;
         |  for (int $c = 0; $c < $k && !${ev.isNull}; $c++) {
         |    double $acc = 0.0;
         |    for (int $j = 0; $j < $sub; $j++) {
         |      if ($v.isNullAt($j)) { ${ev.isNull} = true; break; }
         |      $acc += ((double) $v.$get($j)) * $bkRef[$c * $sub + $j];
         |    }
         |    double $score = $nmRef[$c] - 2.0 * $acc;
         |    if (!${ev.isNull} && $score < $bestScore) { $bestScore = $score; $best = $c; }
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $best;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): PqNearestCode =
    copy(vec = newFirst, book = newSecond, kExpr = newThird)
}

/** Runtime registration (works on any session, no
  * SparkSessionExtensions wiring required) + Column-API entry point. */
object VectorFunctions {
  val dotName = "graft_vector_dot"
  val dotLongName = "graft_vector_dot_long"
  val pqNearestName = "graft_pq_nearest"
  val fastRoundName = "graft_round"
  val ieeeSortableName = "graft_ieee_sortable"

  def register(spark: SparkSession): Unit = {
    if (!spark.sessionState.functionRegistry
        .functionExists(FunctionIdentifier(ieeeSortableName))) {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        ieeeSortableName,
        exprs => DoubleSortableBits(exprs.head), "built-in")
    }
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier(dotName))) {
      reg.createOrReplaceTempFunction(dotName,
        exprs => VectorDot(exprs.head, exprs(1)), "built-in")
    }
    if (!reg.functionExists(FunctionIdentifier(fastRoundName))) {
      reg.createOrReplaceTempFunction(fastRoundName,
        exprs => FastRound(exprs.head,
          exprs(1).eval().asInstanceOf[Number].intValue()), "built-in")
    }
    if (!reg.functionExists(FunctionIdentifier(dotLongName))) {
      reg.createOrReplaceTempFunction(dotLongName,
        exprs => VectorDotLong(exprs.head, exprs(1)), "built-in")
    }
    if (!reg.functionExists(FunctionIdentifier(pqNearestName))) {
      reg.createOrReplaceTempFunction(pqNearestName,
        exprs => PqNearestCode(exprs.head, exprs(1), exprs(2)), "built-in")
    }
    // runtime twin of GraftExtensions' injectOptimizerRule: HOF-form
    // dot products rewrite to the codegen'd expression
    if (!spark.experimental.extraOptimizations.contains(VectorDotRewrite)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ VectorDotRewrite
    }
  }

  /** Codegen'd dot product; caller must have [[register]]ed on the
    * session owning the plan (operators do this themselves). */
  def dot(a: Column, b: Column): Column = call_function(dotName, a, b)

  /** Codegen'd integer dot over quantized vectors; same registration
    * contract as [[dot]]. */
  def dotLong(a: Column, b: Column): Column = call_function(dotLongName, a, b)

  /** Codegen'd nearest-codeword argmin ([[PqNearestCode]]): the
    * codebook flattens row-major into ONE array literal (a reference
    * object in generated code, not inlined constants). Same
    * registration contract as [[dot]]. */
  def nearestCode(sv: Column, cws: Seq[Array[Double]]): Column =
    call_function(pqNearestName, sv,
      org.apache.spark.sql.functions.lit(cws.flatten.toArray),
      org.apache.spark.sql.functions.lit(cws.length))
}
