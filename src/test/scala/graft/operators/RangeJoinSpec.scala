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
}
