package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join. Spark's built-in planner turns a bare
  * `p.x BETWEEN i.lo AND i.hi` predicate into a broadcast-nested-loop
  * (or worse, a cartesian) join — O(points × intervals) comparisons.
  * The scale path is bucketing: quantize the point and every bucket an
  * interval overlaps to a shared `bucket` key, equi-join on
  * (partitionKeys, bucket), then re-verify the exact predicate. Each
  * point meets only the intervals sharing its bucket — shuffle-friendly,
  * skew-bounded by (interval span / bucketWidth).
  *
  * Correctness does not depend on bucketWidth (only the candidate count
  * does): every containing interval shares the point's bucket by
  * construction. Pick bucketWidth ≈ typical interval span.
  */
object RangeJoin {

  /** @param points        rows with a numeric `pointCol`
    * @param intervals     rows with numeric `loCol`/`hiCol` (inclusive)
    * @param partitionKeys equi-keys both sides must also match (may be empty)
    * @param bucketWidth   quantization step (same units as the columns)
    * @return inner join: every (point row ++ interval row) pair with
    *         lo ≤ point ≤ hi — interval columns suffixed when colliding.
    */
  def pointInInterval(
      points: DataFrame, intervals: DataFrame,
      pointCol: String, loCol: String, hiCol: String,
      partitionKeys: Seq[String] = Seq.empty,
      bucketWidth: Long = 1000L): DataFrame = {
    val p = points.withColumn("__bucket",
      floor(col(pointCol) / bucketWidth).cast("long"))
    // one row per bucket the interval overlaps
    val i = intervals.withColumn("__bucket",
      explode(sequence(
        floor(col(loCol) / bucketWidth).cast("long"),
        floor(col(hiCol) / bucketWidth).cast("long"))))
    val joinKeys = partitionKeys :+ "__bucket"
    p.join(i, joinKeys, "inner")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bucket")
  }

  /** Interval×interval overlap join, same bucketing discipline: both
    * sides explode to the buckets they span, equi-join on
    * (partitionKeys, bucket), verify `lo_a ≤ hi_b ∧ lo_b ≤ hi_a`. A
    * pair overlapping across several buckets would surface once per
    * shared bucket — instead of a distinct (an extra shuffle over the
    * full candidate set), each pair is emitted ONLY in the bucket of
    * `max(lo_a, lo_b)`: the first bucket where both intervals are
    * present, which every overlapping pair has exactly one of. The
    * two sides must carry disjoint lo/hi column names (rename before a
    * self-join). Candidate count — and skew — is bounded by
    * (span / bucketWidth) per row; size bucketWidth ≈ typical span. */
  def intervalOverlap(
      a: DataFrame, b: DataFrame,
      loA: String, hiA: String, loB: String, hiB: String,
      partitionKeys: Seq[String] = Seq.empty,
      bucketWidth: Long = 1000L): DataFrame = {
    def burst(df: DataFrame, lo: String, hi: String) =
      df.withColumn("__bucket",
        explode(sequence(
          floor(col(lo) / bucketWidth).cast("long"),
          floor(col(hi) / bucketWidth).cast("long"))))
    burst(a, loA, hiA)
      .join(burst(b, loB, hiB), partitionKeys :+ "__bucket", "inner")
      .filter(col(loA) <= col(hiB) && col(loB) <= col(hiA))
      .filter(col("__bucket") ===
        floor(greatest(col(loA), col(loB)) / bucketWidth).cast("long"))
      .drop("__bucket")
  }
}
