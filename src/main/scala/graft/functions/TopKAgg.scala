package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Mergeable top-k as a typed `Aggregator`: per-group "k largest
  * (value, id) rows" as BOUNDED aggregation state.
  *
  * Why this exists next to `row_number() OVER (...) <= k`: Spark ≥3.5
  * already bounds that window's shuffle (WindowGroupLimit pushes a
  * per-partition rank limit below the exchange — measured at 20M
  * rows the two shapes tie), so raw speed is NOT the pitch. What the
  * window form cannot do is compose: top-k here is a COLUMN, so one
  * `groupBy.agg` can carry it alongside count/sum/sketches in a
  * single pass (the window form needs its own sort pass + a
  * join-back), it merges like any aggregate (usable where window
  * functions aren't — streaming complete-mode aggregations,
  * [[graft.streaming.HllRollupTable]]-style stored partials), and it
  * is the exact-top-k instance of the engine's custom-sketch
  * extension point (same state/merge shape as [[KmvDistinct]]).
  * Order contract is total and engine-replayable: value DESC, id ASC
  * on ties — deterministic under any partitioning, window form as
  * oracle.
  *
  * State: sorted Array of (value, id), length ≤ k (KBs for practical
  * k). For top-k BY COUNT over unbounded key domains use
  * [[graft.operators.Frequency]]'s Misra-Gries instead — this
  * operator is exact and meant for k-of-many-rows selection. */
class TopKRows(k: Int)
    extends Aggregator[(Long, Long), Array[(Long, Long)], Array[(Long, Long)]] {
  require(k >= 1)

  /** Sorted by (value DESC, id ASC), length ≤ k. */
  override def zero: Array[(Long, Long)] = Array.empty

  // total order: larger value first, smaller id first on ties
  private def beats(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def reduce(s: Array[(Long, Long)],
      in: (Long, Long)): Array[(Long, Long)] = {
    // in = (id, value) from the column API; state holds (value, id)
    val cand = (in._2, in._1)
    if (s.length >= k && !beats(cand, s.last)) s
    else {
      var ins = s.length
      var i = 0
      while (i < s.length && ins == s.length) {
        if (beats(cand, s(i))) ins = i
        i += 1
      }
      val out = new Array[(Long, Long)](math.min(s.length + 1, k))
      System.arraycopy(s, 0, out, 0, ins)
      if (ins < out.length) out(ins) = cand
      if (ins + 1 < out.length)
        System.arraycopy(s, ins, out, ins + 1, out.length - ins - 1)
      out
    }
  }

  override def merge(a: Array[(Long, Long)],
      b: Array[(Long, Long)]): Array[(Long, Long)] = {
    // merge two sorted runs, keep k (classic bounded merge)
    val out = new Array[(Long, Long)](math.min(a.length + b.length, k))
    var (i, j, o) = (0, 0, 0)
    while (o < out.length) {
      out(o) =
        if (j >= b.length || (i < a.length && beats(a(i), b(j)))) {
          i += 1; a(i - 1)
        } else { j += 1; b(j - 1) }
      o += 1
    }
    out
  }

  override def finish(s: Array[(Long, Long)]): Array[(Long, Long)] = s

  override def bufferEncoder: Encoder[Array[(Long, Long)]] =
    ExpressionEncoder[Array[(Long, Long)]]()
  override def outputEncoder: Encoder[Array[(Long, Long)]] =
    ExpressionEncoder[Array[(Long, Long)]]()
}

object TopKAgg {
  /** Column aggregate: array of the k largest (value, id) pairs,
    * sorted value DESC / id ASC — fields `_1` = value, `_2` = id. */
  def topK(id: Column, value: Column, k: Int): Column =
    udaf(new TopKRows(k), ExpressionEncoder[(Long, Long)]())
      .apply(id, value)
}
