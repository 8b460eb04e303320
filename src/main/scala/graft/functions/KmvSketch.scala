package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** KMV (k-minimum-values) distinct-count sketch as a typed
  * `Aggregator` — the custom-sketch extension point SURVEY §4 reserves
  * for `Aggregator`/`TypedImperativeAggregate` work.
  *
  * State is the k smallest DISTINCT hash values seen; the estimator is
  * the classic (k-1)/h_(k) with hashes normalized to [0,1). Unlike
  * HLL-style sketches, KMV over a fixed hash is ORDER-INSENSITIVE and
  * therefore deterministic under any partitioning — merge is a set
  * union — so the same sketch is replayable in ANSI SQL (order the
  * distinct hashes, take the k-th) and the whole aggregation is
  * oracle-checkable, partial-aggregatable (map-side combine via
  * merge), and stable across retries.
  *
  * Input contract: a non-null 60-bit hash in [0, 2^60), e.g.
  * `Dedup.stringHash(col, portable = true)`.
  */
private[graft] object KmvOps {
  val TwoPow60: Double = 1152921504606846976.0 // 2^60 as double

  /** Insert into a sorted-ascending distinct k-minima buffer. */
  def insert(s: Array[Long], h: Long, k: Int): Array[Long] = {
    val pos = java.util.Arrays.binarySearch(s, h)
    if (pos >= 0) s // already present
    else {
      val ins = -pos - 1
      if (s.length >= k && ins >= k) s // larger than current k-th min
      else {
        val grown = new Array[Long](math.min(s.length + 1, k))
        System.arraycopy(s, 0, grown, 0, ins)
        grown(ins) = h
        System.arraycopy(s, ins, grown, ins + 1,
          math.min(s.length - ins, grown.length - ins - 1))
        grown
      }
    }
  }
}

class KmvDistinct(k: Int) extends Aggregator[Long, Array[Long], Double] {
  require(k >= 2)

  /** Sorted ascending, distinct, length ≤ k. */
  override def zero: Array[Long] = Array.empty[Long]

  override def reduce(s: Array[Long], h: Long): Array[Long] =
    KmvOps.insert(s, h, k)

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    b.foldLeft(a)(KmvOps.insert(_, _, k))

  override def finish(s: Array[Long]): Double =
    if (s.length < k) s.length.toDouble
    else (k - 1).toDouble * KmvOps.TwoPow60 / s.last.toDouble

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Double] = ExpressionEncoder[Double]()
}

/** Same k-minima state, but `finish` SHIPS THE SKETCH (the sorted
  * minima array) instead of collapsing it to an estimate — the
  * composable form: two corpora's sketches support union, intersection
  * and Jaccard estimation AFTER aggregation (Beyer et al., SIGMOD'07),
  * which is how a 100 TB pipeline answers "how much of the eval set
  * leaked into training" without ever joining the corpora. See
  * [[graft.operators.Overlap]]. */
class KmvMinima(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
  require(k >= 2)
  override def zero: Array[Long] = Array.empty[Long]
  override def reduce(s: Array[Long], h: Long): Array[Long] =
    KmvOps.insert(s, h, k)
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    b.foldLeft(a)(KmvOps.insert(_, _, k))
  override def finish(s: Array[Long]): Array[Long] = s
  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

object KmvSketch {
  /** Column aggregate: approximate distinct count of the (hashed)
    * input. */
  def approxDistinct(hashed: Column, k: Int): Column =
    udaf(new KmvDistinct(k), ExpressionEncoder[Long]()).apply(hashed)

  /** Column aggregate: the k-minima sketch itself (sorted ascending
    * distinct hashes, length ≤ k) for post-aggregation set algebra. */
  def minima(hashed: Column, k: Int): Column =
    udaf(new KmvMinima(k), ExpressionEncoder[Long]()).apply(hashed)
}
