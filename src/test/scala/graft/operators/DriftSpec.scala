package graft.operators

import graft.SparkSpec

class DriftSpec extends SparkSpec {
  import spark.implicits._

  test("identical cohorts drift 0; disjoint bin ranges drift 1") {
    val a = Seq(("k", 1L), ("k", 100L), ("k", 5000L)).toDF("key", "v")
    val same = Drift.tvdLog2(a, a, "key", "v")
      .as[(String, Long, Long, Double)].head()
    assert(same == (("k", 3L, 3L, 0.0)))
    val b = Seq(("k", 1000000L), ("k", 2000000L)).toDF("key", "v")
    val far = Drift.tvdLog2(a, b, "key", "v")
      .as[(String, Long, Long, Double)].head()
    assert(far == (("k", 3L, 2L, 1.0)))
  }

  test("a key present in only one cohort reads as full drift") {
    val a = Seq(("only_a", 5L), ("both", 5L)).toDF("key", "v")
    val b = Seq(("both", 5L)).toDF("key", "v")
    val got = Drift.tvdLog2(a, b, "key", "v")
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("only_a")._4 == 1.0 && got("only_a")._3 == 0L)
    assert(got("both")._4 == 0.0)
  }

  test("matches a brute-force TVD on seeded random cohorts") {
    val rnd = new scala.util.Random(5)
    val ra = (0 until 400).map(_ => ("k", rnd.nextInt(10000).toLong + 1))
    val rb = (0 until 300).map(_ => ("k", rnd.nextInt(40000).toLong + 1))
    val got = Drift.tvdLog2(ra.toDF("key", "v").repartition(5),
        rb.toDF("key", "v").repartition(3), "key", "v")
      .as[(String, Long, Long, Double)].head()
    def hist(xs: Seq[Long]) = xs.groupBy(v =>
      if (v > 0) 64 - java.lang.Long.numberOfLeadingZeros(v) else 0)
      .view.mapValues(_.size.toLong).toMap
    val (haM, hbM) = (hist(ra.map(_._2)), hist(rb.map(_._2)))
    val (na, nb) = (400L, 300L)
    val num = (haM.keySet ++ hbM.keySet).toSeq.map(k =>
      math.abs(haM.getOrElse(k, 0L) * nb - hbM.getOrElse(k, 0L) * na)).sum
    val want = BigDecimal(num.toDouble / (2.0 * na * nb))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got._2 == na && got._3 == nb)
    assert(math.abs(got._4 - want) < 1e-9, s"got ${got._4}, want $want")
  }
}
