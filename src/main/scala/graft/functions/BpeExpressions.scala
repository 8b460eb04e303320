package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, typedlit}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** BPE word segmentation under a trained merge list, with CONSTANT-SIZE
  * generated code: the merge table rides into codegen as two reference
  * objects (String[] lhs / rhs — the [[PqNearestCode]] pattern) and the
  * per-word loop runs in [[graft.operators.Bpe.segmentWordPairs]], so a
  * production 32k-merge vocabulary emits the same few generated lines
  * as an 8-merge one. The replaced form — [[graft.operators.Bpe
  * .segmentExpr]]'s O(nMerges)-deep literal `replace` fold — is the
  * exact janino failure class PqNearestCode already met at k=256.
  *
  * Semantics are the fold's, byte for byte (BpeSpec property-pins
  * equality, including the non-overlap `replace` quirk where
  * `a a a a` + merge(a,a) → `[aa, a, a]`): merges apply IN TRAINING
  * ORDER, each with leftmost-first non-overlapping substitution that
  * resumes after the matched region. Null in → null out; the output
  * array never contains nulls. */
case class BpeSegmentWord(word: Expression, lhsExpr: Expression,
    rhsExpr: Expression) extends TernaryExpression {

  override def first: Expression = word
  override def second: Expression = lhsExpr
  override def third: Expression = rhsExpr
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = word.nullable
  override def prettyName: String = "graft_bpe_segment"

  override def checkInputDataTypes(): TypeCheckResult = {
    def strArr(e: Expression) = e.foldable && (e.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    })
    if (word.dataType == StringType && strArr(lhsExpr) && strArr(rhsExpr))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string word, foldable array<string> lhs, " +
        s"foldable array<string> rhs); got ${word.dataType.sql}, " +
        s"${lhsExpr.dataType.sql}, ${rhsExpr.dataType.sql}")
  }

  @transient private lazy val lhs: Array[String] =
    lhsExpr.eval().asInstanceOf[ArrayData].toArray[UTF8String](StringType)
      .map(_.toString)
  @transient private lazy val rhs: Array[String] =
    rhsExpr.eval().asInstanceOf[ArrayData].toArray[UTF8String](StringType)
      .map(_.toString)

  override def nullSafeEval(w: Any, l: Any, r: Any): Any =
    BpeSegmentWord.segment(lhs, rhs, w.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lhsRef = ctx.addReferenceObj("bpeLhs", lhs, "java.lang.String[]")
    val rhsRef = ctx.addReferenceObj("bpeRhs", rhs, "java.lang.String[]")
    nullSafeCodeGen(ctx, ev, (w, _, _) =>
      s"${ev.value} = graft.functions.BpeSegmentWord.segment(" +
        s"$lhsRef, $rhsRef, $w);")
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): BpeSegmentWord =
    copy(word = newFirst, lhsExpr = newSecond, rhsExpr = newThird)
}

object BpeSegmentWord {
  /** Static entry the generated code calls (JIT-inlined, one call per
    * row — constant generated-code size at any merge count). */
  def segment(lhs: Array[String], rhs: Array[String],
      word: UTF8String): ArrayData = {
    val syms = graft.operators.Bpe.segmentWordPairs(word.toString, lhs, rhs)
    val out = new Array[Any](syms.length)
    var i = 0
    while (i < syms.length) {
      out(i) = UTF8String.fromString(syms(i))
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Registration + Column entry point for [[BpeSegmentWord]]. */
object BpeFunctions {
  val segmentName = "graft_bpe_segment"

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier(segmentName))) {
      reg.createOrReplaceTempFunction(segmentName,
        exprs => BpeSegmentWord(exprs.head, exprs(1), exprs(2)), "built-in")
    }
  }

  /** Segment `word` under the ordered merge pair list. The pair lists
    * enter the plan as TWO single-node typed literals — no
    * O(nMerges) literal tree even before constant folding. */
  def segment(word: Column, pairs: Seq[(String, String)]): Column =
    call_function(segmentName, word,
      typedlit(pairs.map(_._1)), typedlit(pairs.map(_._2)))
}
