package graft.operators

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val points = Seq(
    (1L, 5.0), (2L, 10.0), (3L, 999.0), (4L, 1000.0), (5L, -3.0)
  ).toDF("pid", "x")

  private lazy val intervals = Seq(
    ("a", 0.0, 10.0),       // catches 5, 10 (inclusive hi)
    ("b", 10.0, 2000.0),    // catches 10, 999, 1000 (inclusive lo)
    ("c", -100.0, -1.0)     // catches -3
  ).toDF("name", "lo", "hi")

  private def run(width: Long) =
    RangeJoin.pointInInterval(points, intervals, "x", "lo", "hi",
      bucketWidth = width)
      .select($"pid", $"name").as[(Long, String)].collect().toSet

  private val expected = Set(
    (1L, "a"), (2L, "a"), (2L, "b"), (3L, "b"), (4L, "b"), (5L, "c"))

  test("bucketed range join matches containment semantics") {
    assert(run(1000L) == expected)
  }

  test("result is independent of bucket width") {
    assert(run(1L) == expected)
    assert(run(7L) == expected)
    assert(run(1000000L) == expected)
  }

  test("partition keys restrict matches") {
    val p = points.withColumn("k", $"pid" % 2)
    val i = intervals.withColumn("k", org.apache.spark.sql.functions.lit(0L))
    val r = RangeJoin.pointInInterval(p, i, "x", "lo", "hi",
      partitionKeys = Seq("k"), bucketWidth = 100L)
      .select($"pid", $"name").as[(Long, String)].collect().toSet
    // only even pids (k=0) can match
    assert(r == expected.filter(_._1 % 2 == 0))
  }

  // --- interval×interval overlap ---

  private lazy val ivRnd = new scala.util.Random(13)
  private lazy val ivA = (1L to 80L).map { i =>
    val lo = ivRnd.nextInt(500).toLong; (i, lo, lo + ivRnd.nextInt(40))
  }
  private lazy val ivB = (1L to 80L).map { i =>
    val lo = ivRnd.nextInt(500).toLong; (i, lo, lo + ivRnd.nextInt(40))
  }
  private lazy val ivExpected = (for {
    (ia, la, ha) <- ivA; (ib, lb, hb) <- ivB
    if la <= hb && lb <= ha
  } yield (ia, ib)).toSet

  private def runOverlap(w: Long): Set[(Long, Long)] =
    RangeJoin.intervalOverlap(
      ivA.toDF("id_a", "lo_a", "hi_a"), ivB.toDF("id_b", "lo_b", "hi_b"),
      "lo_a", "hi_a", "lo_b", "hi_b", bucketWidth = w)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet

  test("interval overlap matches the naive theta join, exactly once per pair") {
    val got = RangeJoin.intervalOverlap(
      ivA.toDF("id_a", "lo_a", "hi_a"), ivB.toDF("id_b", "lo_b", "hi_b"),
      "lo_a", "hi_a", "lo_b", "hi_b", bucketWidth = 16L)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSeq
    assert(got.toSet == ivExpected)
    assert(got.size == ivExpected.size, "a pair surfaced in multiple buckets")
    assert(ivExpected.nonEmpty)
  }

  test("overlap result is independent of bucket width") {
    assert(runOverlap(1L) == ivExpected)
    assert(runOverlap(7L) == ivExpected)
    assert(runOverlap(100000L) == ivExpected)
  }
}
