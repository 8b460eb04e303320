package graft.operators

import graft.SparkSpec
import java.sql.Timestamp

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val quotes = Seq(
    (1L, ts("2024-01-01 10:00:00"), 100.0),
    (1L, ts("2024-01-01 10:05:00"), 101.0),
    (1L, ts("2024-01-01 10:10:00"), 102.0),
    (2L, ts("2024-01-01 10:00:00"), 200.0)
  ).toDF("key", "ts", "price")

  private lazy val trades = Seq(
    (1L, ts("2024-01-01 10:03:00"), 5L),  // after first quote
    (1L, ts("2024-01-01 10:05:00"), 6L),  // exactly at second quote (tie → match)
    (1L, ts("2024-01-01 09:59:00"), 7L),  // before any quote → null
    (2L, ts("2024-01-01 11:00:00"), 8L),  // other key
    (3L, ts("2024-01-01 10:00:00"), 9L)   // key with no quotes → null
  ).toDF("key", "ts", "qty")

  test("backward as-of picks most recent quote at or before the trade") {
    val r = AsOfJoin.backward(trades, quotes, Seq("key"), "ts", "ts")
      .select($"qty", $"asof_price").as[(Long, Option[Double])]
      .collect().toMap
    assert(r(5L).contains(100.0))
    assert(r(6L).contains(101.0)) // >= tie matches same-instant quote
    assert(r(7L).isEmpty)
    assert(r(8L).contains(200.0))
    assert(r(9L).isEmpty)
  }

  test("tolerance nulls out matches older than the lookback") {
    val r = AsOfJoin.backward(trades, quotes, Seq("key"), "ts", "ts",
      toleranceSeconds = Some(120L))
      .select($"qty", $"asof_price").as[(Long, Option[Double])]
      .collect().toMap
    assert(r(5L).isEmpty) // 3 min gap > 2 min tolerance
    assert(r(6L).contains(101.0)) // 0 gap
    assert(r(8L).isEmpty) // 60 min gap
  }

  test("property (seeded random): matches per-row brute-force as-of") {
    val rnd = new scala.util.Random(13)
    val lefts = Seq.tabulate(120)(i =>
      (i.toLong, rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong))
    val rights = Seq.tabulate(150)(i =>
      (i.toLong, rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong))
    val lDf = lefts.toDF("lid", "key", "t")
      .select($"lid", $"key", org.apache.spark.sql.functions.timestamp_micros($"t").as("ts"))
    val rDf = rights.toDF("rid", "key", "t")
      .select($"rid", $"key", org.apache.spark.sql.functions.timestamp_micros($"t").as("ts"))
    val got = AsOfJoin.backward(lDf, rDf, Seq("key"), "ts", "ts")
      .select($"lid", $"asof_rid").as[(Long, Option[Long])].collect().toMap
    lefts.foreach { case (lid, key, t) =>
      val candidates = rights.filter(r => r._2 == key && r._3 <= t)
      val expected =
        if (candidates.isEmpty) None
        // equal-ts ties: the operator takes the last in (ts, side) sort
        // order; brute force mirrors max-ts then max-rid among ties is
        // NOT guaranteed — assert on ts instead, which IS determined
        else Some(candidates.map(_._3).max)
      val gotTs = got(lid).map(rid => rights(rid.toInt)._3)
      assert(gotTs == expected, s"left $lid key $key t $t")
    }
  }

  test("left columns and row count are preserved (left-outer semantics)") {
    val out = AsOfJoin.backward(trades, quotes, Seq("key"), "ts", "ts")
    assert(out.count() == trades.count())
    assert(out.columns.toSeq == Seq("key", "ts", "qty", "asof_ts", "asof_price"))
  }
}
