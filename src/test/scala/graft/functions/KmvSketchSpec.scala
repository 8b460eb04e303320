package graft.functions

import graft.SparkSpec
import graft.operators.Dedup
import org.apache.spark.sql.functions._

class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  test("exact below k, close above k") {
    val small = (1 to 40).map(i => s"u$i").toDF("u")
      .agg(KmvSketch.approxDistinct(
        Dedup.stringHash($"u", portable = true), 64))
      .head().getDouble(0)
    assert(small == 40.0) // under k → exact
    val n = 5000
    val big = (1 to n).map(i => s"user_$i").toDF("u")
      .agg(KmvSketch.approxDistinct(
        Dedup.stringHash($"u", portable = true), 256))
      .head().getDouble(0)
    // KMV relative error ~ 1/sqrt(k-1) ≈ 6.3%; allow 4 sigma
    assert(math.abs(big - n) / n < 0.25, s"estimate $big for $n")
  }

  test("duplicates don't inflate the estimate") {
    val dup = ((1 to 50) ++ (1 to 50)).map(i => s"u$i").toDF("u")
      .agg(KmvSketch.approxDistinct(
        Dedup.stringHash($"u", portable = true), 64))
      .head().getDouble(0)
    assert(dup == 50.0)
  }

  test("estimate is partition-order invariant (deterministic merge)") {
    val vals = (1 to 3000).map(i => s"x$i")
    def est(parts: Int): Double =
      spark.createDataset(vals).repartition(parts).toDF("u")
        .agg(KmvSketch.approxDistinct(
          Dedup.stringHash($"u", portable = true), 128))
        .head().getDouble(0)
    assert(est(1) == est(7) && est(7) == est(32))
  }

  test("aggregator primitives: insert keeps k smallest distinct") {
    val agg = new KmvDistinct(4)
    var s = agg.zero
    Seq(50L, 10L, 30L, 10L, 70L, 20L, 5L).foreach(h => s = agg.reduce(s, h))
    assert(s.toSeq == Seq(5L, 10L, 20L, 30L))
    val merged = agg.merge(s, Array(1L, 30L, 60L))
    assert(merged.toSeq == Seq(1L, 5L, 10L, 20L))
  }
}
