package graft.operators

import graft.SparkSpec
import graft.functions.KmvSketch
import org.apache.spark.sql.functions._

/** KMV sketch-intersection overlap estimation (Beyer et al. 2007). */
class OverlapSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic 60-bit "hash": a wrapping golden-ratio multiply
    * (equidistributed over 2^64 for odd multipliers) shifted into
    * [0, 2^60) — the estimator needs values that SPREAD over the full
    * hash domain, and a closed form keeps truth computable. */
  private def h(x: Long): Long = (x * -7046029254386353131L) >>> 4

  private def side(g: String, xs: Seq[Long]) =
    xs.map(x => (g, h(x))).toDF("grp", "h")

  test("KmvSketch.minima returns the k smallest distinct hashes, sorted") {
    val xs = (1L to 500L) ++ (1L to 500L) // duplicates collapse
    val got = side("a", xs)
      .groupBy(col("grp")).agg(KmvSketch.minima(col("h"), 32).as("sk"))
      .head.getSeq[Long](1)
    val expected = xs.map(h).distinct.sorted.take(32)
    assert(got === expected)
  }

  test("sketch is partitioning-insensitive") {
    val xs = (1L to 2000L).map(x => ("a", h(x)))
    val one = xs.toDF("grp", "h").repartition(1)
      .groupBy(col("grp")).agg(KmvSketch.minima(col("h"), 64).as("sk"))
      .head.getSeq[Long](1)
    val many = xs.toDF("grp", "h").repartition(13)
      .groupBy(col("grp")).agg(KmvSketch.minima(col("h"), 64).as("sk"))
      .head.getSeq[Long](1)
    assert(one === many)
  }

  test("exact regime: union smaller than k reports exact set sizes") {
    val a = side("g", 1L to 60L)
    val b = side("g", 41L to 100L) // |A∪B|=100, |A∩B|=20
    val r = Overlap.kmvOverlap(a, b, "grp", "h", k = 256).head
    assert(r.getAs[Double]("est_union") === 100.0)
    assert(r.getAs[Double]("est_intersection") === 20.0)
    assert(r.getAs[Double]("jaccard_est") === 0.2)
    assert(r.getAs[Long]("n_match") === 20L)
  }

  test("estimator regime: large overlapping sets land near truth") {
    // |A|=20k, |B|=20k, |A∩B|=10k, |A∪B|=30k, J=1/3
    val a = side("g", 1L to 20000L)
    val b = side("g", 10001L to 30000L)
    val r = Overlap.kmvOverlap(a, b, "grp", "h", k = 256).head
    val estU = r.getAs[Double]("est_union")
    val estI = r.getAs[Double]("est_intersection")
    val estJ = r.getAs[Double]("jaccard_est")
    // k=256 ⇒ se ~ 1/16; allow 4 sigma
    assert(math.abs(estU - 30000.0) / 30000.0 < 0.25, s"est_union=$estU")
    assert(math.abs(estJ - 1.0 / 3.0) < 0.15, s"jaccard_est=$estJ")
    assert(math.abs(estI - 10000.0) / 10000.0 < 0.35, s"est_intersection=$estI")
  }

  test("disjoint corpora estimate zero intersection") {
    val a = side("g", 1L to 5000L)
    val b = side("g", 100001L to 105000L)
    val r = Overlap.kmvOverlap(a, b, "grp", "h", k = 128).head
    assert(r.getAs[Long]("n_match") === 0L)
    assert(r.getAs[Double]("est_intersection") === 0.0)
  }

  test("groups are independent; only both-sided groups emit") {
    val a = side("g1", 1L to 50L).union(side("g2", 1L to 50L))
      .union(side("only_a", 1L to 10L))
    val b = side("g1", 1L to 50L).union(side("g2", 51L to 100L))
    val out = Overlap.kmvOverlap(a, b, "grp", "h", k = 64)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.keySet === Set("g1", "g2"))
    assert(out("g1").getAs[Double]("jaccard_est") === 1.0)
    assert(out("g2").getAs[Long]("n_match") === 0L)
  }

  test("estimate is a pure function of the input sets (order/partitioning)") {
    val a1 = side("g", 1L to 3000L)
    val a2 = side("g", (1L to 3000L).reverse).repartition(7)
    val b = side("g", 1500L to 4500L)
    val r1 = Overlap.kmvOverlap(a1, b, "grp", "h", k = 128).head
    val r2 = Overlap.kmvOverlap(a2, b, "grp", "h", k = 128).head
    assert(r1.getAs[Double]("est_union") === r2.getAs[Double]("est_union"))
    assert(r1.getAs[Double]("est_intersection") ===
      r2.getAs[Double]("est_intersection"))
  }
}
