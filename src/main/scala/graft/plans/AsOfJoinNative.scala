package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftSqlShim

/** Public API for the native as-of join ([[AsOfJoinPlan]] /
  * [[AsOfJoinExec]]). Drop-in signature- and output-compatible with the
  * composed [[graft.operators.AsOfJoin.backward]]; `AsOfJoinNativeSpec`
  * pins result equality between the two on adversarial shapes (ties,
  * unmatched keys, tolerance cutoffs, null keys).
  */
object AsOfJoinNative {

  /** Idempotently add [[AsOfJoinStrategy]] to the session's planner
    * (same self-registration pattern as
    * [[graft.functions.VectorFunctions.register]]). */
  def register(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }

  /** Backward (most-recent-prior) as-of join through the native
    * physical operator. Parameters match
    * [[graft.operators.AsOfJoin.backward]]: right non-key payload comes
    * back `prefix`-renamed plus `prefix + rightTs`; a match farther
    * back than `toleranceSeconds` nulls ALL attached columns. */
  def backward(
      left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTs: String, rightTs: String,
      prefix: String = "asof_",
      toleranceSeconds: Option[Long] = None,
      broadcastRight: Boolean = false): DataFrame =
    join(left, right, keyCols, leftTs, rightTs, prefix,
      toleranceSeconds, forward = false, broadcastRight)

  /** Forward (earliest-following) as-of join: for every left row, the
    * right row with ordering-equal key whose `rightTs` is the SMALLEST
    * value ≥ `leftTs` — the "next event after" lookup (next retry
    * after an error, next heartbeat after a deploy). Same engine as
    * [[backward]] with the merge run over time-reversed streams. */
  def forward(
      left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTs: String, rightTs: String,
      prefix: String = "asof_",
      toleranceSeconds: Option[Long] = None,
      broadcastRight: Boolean = false): DataFrame =
    join(left, right, keyCols, leftTs, rightTs, prefix,
      toleranceSeconds, forward = true, broadcastRight)

  /** Nearest as-of join: for every left row, the right row minimizing
    * |rightTs − leftTs| — two passes through the SAME exec (the
    * backward candidate and the forward candidate; each pass is the
    * one-pass co-partitioned merge, so the whole thing is two sorts of
    * each side, never a window over the pair volume), then a per-row
    * pick of the smaller gap. TIE CONTRACT (pinned by spec): an equal
    * backward/forward gap takes the BACKWARD (earlier) row — "what was
    * true at the time" beats "what happened next" on a dead heat.
    * `toleranceSeconds` bounds the |gap| symmetrically; out-of-horizon
    * degrades to no-match like the directional forms. */
  def nearest(
      left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTs: String, rightTs: String,
      prefix: String = "asof_",
      toleranceSeconds: Option[Long] = None,
      broadcastRight: Boolean = false): DataFrame = {
    val bPre = "__asofnb_"
    val fPre = "__asofnf_"
    val withB = join(left, right, keyCols, leftTs, rightTs, bPre,
      None, forward = false, broadcastRight)
    val both = join(withB, right, keyCols, leftTs, rightTs, fPre,
      None, forward = true, broadcastRight)
    val bTs = col(bPre + rightTs)
    val fTs = col(fPre + rightTs)
    val gapB = unix_micros(col(leftTs)) - unix_micros(bTs)
    val gapF = unix_micros(fTs) - unix_micros(col(leftTs))
    val chooseB = bTs.isNotNull && (fTs.isNull || gapB <= gapF)
    val within = toleranceSeconds.fold(lit(true))(tol =>
      when(chooseB, gapB).otherwise(gapF) <= tol * 1000000L)
    val attached = both.columns.filter(_.startsWith(bPre))
      .map(_.stripPrefix(bPre))
    attached.foldLeft(both) { (df, name) =>
        df.withColumn(prefix + name,
          when(chooseB && within, col(bPre + name))
            .otherwise(when(!chooseB && within, col(fPre + name))))
      }
      .drop(attached.flatMap(n => Seq(bPre + n, fPre + n)).toIndexedSeq: _*)
  }

  /** Inner variants: drop left rows with no (in-tolerance) match —
    * the directional/nearest joins above keep them with nulled
    * attachments (left-join semantics). Matched-ness is exactly
    * "the attached right timestamp survived", including the
    * tolerance degrade. */
  def backwardInner(
      left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTs: String, rightTs: String,
      prefix: String = "asof_",
      toleranceSeconds: Option[Long] = None,
      broadcastRight: Boolean = false): DataFrame =
    backward(left, right, keyCols, leftTs, rightTs, prefix,
      toleranceSeconds, broadcastRight)
      .filter(col(prefix + rightTs).isNotNull)

  def forwardInner(
      left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTs: String, rightTs: String,
      prefix: String = "asof_",
      toleranceSeconds: Option[Long] = None,
      broadcastRight: Boolean = false): DataFrame =
    forward(left, right, keyCols, leftTs, rightTs, prefix,
      toleranceSeconds, broadcastRight)
      .filter(col(prefix + rightTs).isNotNull)

  def nearestInner(
      left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTs: String, rightTs: String,
      prefix: String = "asof_",
      toleranceSeconds: Option[Long] = None,
      broadcastRight: Boolean = false): DataFrame =
    nearest(left, right, keyCols, leftTs, rightTs, prefix,
      toleranceSeconds, broadcastRight)
      .filter(col(prefix + rightTs).isNotNull)

  private def join(
      left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTs: String, rightTs: String,
      prefix: String,
      toleranceSeconds: Option[Long],
      forward: Boolean,
      broadcastRight: Boolean = false): DataFrame = {
    val spark = left.sparkSession
    register(spark)

    // A self-join (both frames reaching back to one relation) would put
    // the same expression ids in both children; re-aliasing the right
    // side mints fresh ids so the custom node never needs the analyzer's
    // relation-deduplication (which only understands built-in nodes).
    val lPlan = left.queryExecution.analyzed
    val rightDistinct =
      if (right.queryExecution.analyzed.outputSet.intersect(lPlan.outputSet).nonEmpty)
        right.select(right.columns.toIndexedSeq.map(c => col(c).as(c)): _*)
      else right
    val rPlan = rightDistinct.queryExecution.analyzed

    // Spark's own resolver (case-insensitive unless spark.sql.caseSensitive),
    // not String ==: the composed AsOfJoin resolves through the analyzer,
    // so the documented drop-in compatibility must accept the same names —
    // and duplicate-named columns must fail loudly, not first-match.
    val resolver = spark.sessionState.analyzer.resolver
    def resolve(out: Seq[Attribute], name: String, side: String): Attribute =
      out.filter(a => resolver(a.name, name)) match {
        case Seq(one) => one
        case Seq() => throw new IllegalArgumentException(
          s"asOfJoinNative: no column '$name' on the $side side " +
            s"(have ${out.map(_.name).mkString(", ")})")
        case many => throw new IllegalArgumentException(
          s"asOfJoinNative: '$name' is ambiguous on the $side side " +
            s"(matches ${many.map(_.name).mkString(", ")})")
      }

    val lKeys = keyCols.map(resolve(lPlan.output, _, "left"))
    val rKeys = keyCols.map(resolve(rPlan.output, _, "right"))
    lKeys.zip(rKeys).foreach { case (l, r) =>
      require(l.dataType == r.dataType,
        s"asOfJoinNative: key '${l.name}' type mismatch: ${l.dataType} vs ${r.dataType}")
    }
    val lTsA = resolve(lPlan.output, leftTs, "left")
    val rTsA = resolve(rPlan.output, rightTs, "right")
    require(lTsA.dataType == rTsA.dataType,
      s"asOfJoinNative: timestamp type mismatch: ${lTsA.dataType} vs ${rTsA.dataType}")

    val payload = rPlan.output.filterNot(a => rKeys.contains(a) || a == rTsA)
    val rightVals = rTsA +: payload
    val rightOutAttrs = rightVals.map(a =>
      AttributeReference(prefix + a.name, a.dataType, nullable = true, a.metadata)())

    val joined = GraftSqlShim.ofRows(spark,
      AsOfJoinPlan(lPlan, rPlan, lKeys, rKeys, lTsA, rTsA, rightVals,
        rightOutAttrs, forward, broadcastRight))

    toleranceSeconds match {
      case None => joined
      case Some(tol) =>
        // Same semantics as the composed operator: an out-of-tolerance
        // match degrades to no-match (every attached column nulled).
        val tsCol = s"$prefix$rightTs"
        val gap =
          if (forward) unix_micros(col(tsCol)) - unix_micros(col(leftTs))
          else unix_micros(col(leftTs)) - unix_micros(col(tsCol))
        val within = col(tsCol).isNotNull && gap <= tol * 1000000L
        rightOutAttrs.foldLeft(joined) { (df, a) =>
          df.withColumn(a.name, when(within, col(a.name)))
        }
    }
  }
}
