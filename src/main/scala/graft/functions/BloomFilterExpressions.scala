package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.{call_function, col, lit, xxhash64}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership as a codegen'd Catalyst `Expression` — the
  * explicit form of the runtime join filter Spark injects for shuffle
  * joins, available to any operator that wants to prune a huge scan by
  * membership in a small key set (see [[graft.operators.Dedup
  * .bloomPrunedAntiJoin]]: prune a corpus-sized dedup index down to
  * rows that might collide with a small ingest batch BEFORE the join
  * shuffle — at 100 TB the index scan is the cost, and a bloom of the
  * batch's keys eliminates ~(1-fpp) of it with zero recall loss,
  * because bloom filters have no false negatives).
  *
  * The serialized filter rides the plan as a `BinaryType` literal
  * (spark-sketch wire format), deserialized once per executor via the
  * expression's lazy field; generated code calls straight into
  * `BloomFilter.mightContainLong` on the referenced object — no UDF,
  * no boxing, inside whole-stage codegen.
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = right.nullable
  override def prettyName: String = BloomFunctions.mightContainName

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && left.foldable &&
        right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (foldable binary bloomBytes, bigint hash), " +
        s"got (${left.dataType.sql}, ${right.dataType.sql})")

  @transient private lazy val bloom: BloomFilter = {
    val bytes = left.eval(null).asInstanceOf[Array[Byte]]
    require(bytes != null, s"$prettyName: bloom filter literal is null")
    BloomFilter.readFrom(bytes)
  }

  override def eval(input: InternalRow): Any = {
    val v = right.eval(input)
    if (v == null) null else bloom.mightContainLong(v.asInstanceOf[Long])
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val bloomRef = ctx.addReferenceObj("bloom", bloom,
      classOf[BloomFilter].getName)
    val rightGen = right.genCode(ctx)
    ev.copy(code =
      code"""
            |${rightGen.code}
            |boolean ${ev.isNull} = ${rightGen.isNull};
            |boolean ${ev.value} = false;
            |if (!${ev.isNull}) {
            |  ${ev.value} = $bloomRef.mightContainLong(${rightGen.value});
            |}
          """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}

/** Registration + Column-API entry points (same runtime-registration
  * contract as [[VectorFunctions]] — works on any session, no
  * extensions wiring required). */
object BloomFunctions {
  val mightContainName = "graft_bloom_might_contain"

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(FunctionIdentifier(mightContainName))) {
      reg.createOrReplaceTempFunction(mightContainName,
        exprs => BloomMightContain(exprs.head, exprs(1)), "built-in")
    }
  }

  /** Build a bloom filter over `xxhash64(keyCol)` of `df` (driver-side
    * tree-aggregate — sized by `expectedItems`×`fpp`, e.g. 1e8 keys at
    * 1% fpp ≈ 120 MB; the build side should be the SMALL side of the
    * prune). Nulls never enter the filter — a null key matches nothing
    * in join semantics, so pruning it away is exact. */
  def buildHashedBloom(
      df: DataFrame, keyCol: String,
      expectedItems: Long, fpp: Double): Array[Byte] = {
    val bf = df.filter(col(keyCol).isNotNull)
      .stat.bloomFilter(xxhash64(col(keyCol)), math.max(expectedItems, 1L), fpp)
    serialize(bf)
  }

  def serialize(bf: BloomFilter): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  /** Membership test of `xxhash64(keyCol)` against a serialized filter
    * from [[buildHashedBloom]]; caller must have [[register]]ed on the
    * session owning the plan (operators do this themselves). */
  def mightContainHashed(bloomBytes: Array[Byte], key: Column): Column =
    call_function(mightContainName, lit(bloomBytes), xxhash64(key))
}
