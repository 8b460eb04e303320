package graft.functions

/** Fixed-point log2 both engines evaluate identically from integer
  * ops only — the shared primitive behind [[graft.operators.BigramLm]]
  * (perplexity scoring) and [[graft.operators.Selection]] (A-ES
  * weighted sampling): 1000·⌊log2 n⌋ from the `length(bin(n))`
  * bit-length idiom, plus a mantissa correction looked up by the top
  * 9 bits from a 256-entry table of PINNED integer literals (generated
  * once here, embedded verbatim in both dialects — never recomputed
  * via either engine's math library, so no transcendental enters any
  * oracle contract). Max error: log2(1+2⁻⁸) ≈ 5.6 milli-bits; monotone
  * non-decreasing by construction (bit length and mantissa index are,
  * and the table is). Domain: integral SQL expressions ≥ 1. */
object FixedPointLog {

  /** Results are in milli-bits (1000 · log2). */
  val LogScale = 1000L

  /** tbl(i−256) = round(1000·(log2 i − 8)) for i ∈ [256, 511]. */
  val MantissaTable: IndexedSeq[Long] = (256 until 512).map(i =>
    math.round(LogScale * (math.log(i) / math.log(2.0) - 8.0)))

  private val tblSpark = MantissaTable.mkString("array(", ",", ")")

  /** DuckDB list literal for oracles (expose as a CTE named `tbl`). */
  def tblDuck: String = MantissaTable.mkString("[", ",", "]") + "::BIGINT[]"

  /** Spark-dialect ilog2_milli(e). `e` must be ≥ 1 and side-effect
    * free (it is repeated). */
  def ilog2MilliSpark(e: String): String =
    s"""($LogScale * (length(bin($e)) - 1) + element_at($tblSpark,
       |  cast(CASE WHEN length(bin($e)) >= 9
       |    THEN shiftright($e, cast(length(bin($e)) - 9 AS INT))
       |    ELSE shiftleft($e, cast(9 - length(bin($e)) AS INT)) END
       |    AS INT) - 255))""".stripMargin

  /** Driver-side evaluator — the SAME function over Scala longs, for
    * deriving constants (e.g. an IDCG denominator) that enter both
    * engines as literals. */
  def ilog2Milli(n: Long): Long = {
    require(n >= 1, s"ilog2Milli domain is [1, ..): $n")
    val b = 64 - java.lang.Long.numberOfLeadingZeros(n)
    val ms = if (b >= 9) n >>> (b - 9) else n << (9 - b)
    LogScale * (b - 1) + MantissaTable((ms - 256).toInt)
  }

  /** DuckDB-dialect twin — requires a CTE exposing `tbl` (from
    * [[tblDuck]]) in scope. */
  def ilog2MilliDuck(e: String): String =
    s"""($LogScale * (length(bin($e)) - 1) + tbl[(CASE
       |  WHEN length(bin($e)) >= 9 THEN $e >> (length(bin($e)) - 9)
       |  ELSE $e << (9 - length(bin($e))) END) - 255])""".stripMargin
}
