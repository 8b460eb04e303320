package graft.plans

import graft.SparkSpec
import graft.operators.AsOfJoin
import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._

class AsOfJoinNativeSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val quotes = Seq(
    (1L, ts("2024-01-01 10:00:00"), 100.0),
    (1L, ts("2024-01-01 10:05:00"), 101.0),
    (1L, ts("2024-01-01 10:10:00"), 102.0),
    (2L, ts("2024-01-01 10:00:00"), 200.0)
  ).toDF("key", "ts", "price")

  private lazy val trades = Seq(
    (1L, ts("2024-01-01 10:03:00"), 5L),
    (1L, ts("2024-01-01 10:05:00"), 6L),
    (1L, ts("2024-01-01 09:59:00"), 7L),
    (2L, ts("2024-01-01 11:00:00"), 8L),
    (3L, ts("2024-01-01 10:00:00"), 9L)
  ).toDF("key", "ts", "qty")

  private def executed(df: DataFrame) = df.queryExecution.executedPlan

  test("backward as-of picks most recent quote at or before the trade") {
    val r = AsOfJoinNative.backward(trades, quotes, Seq("key"), "ts", "ts")
      .select($"qty", $"asof_price").as[(Long, Option[Double])]
      .collect().toMap
    assert(r(5L).contains(100.0))
    assert(r(6L).contains(101.0)) // >= tie matches same-instant quote
    assert(r(7L).isEmpty)
    assert(r(8L).contains(200.0))
    assert(r(9L).isEmpty)
  }

  test("plan: AsOfJoinExec present, two exchanges, no window machinery") {
    val df = AsOfJoinNative.backward(trades, quotes, Seq("key"), "ts", "ts")
    df.collect() // force planning incl. AQE final plan
    val plan = executed(df)
    assert(collectWithSubqueries(plan) { case e: AsOfJoinExec => e }.size == 1)
    assert(collectWithSubqueries(plan) { case e: ShuffleExchangeLike => e }.size == 2,
      plan.toString)
    assert(collectWithSubqueries(plan) { case w: WindowExec => w }.isEmpty)
  }

  test("output schema and row count match the composed operator") {
    val native = AsOfJoinNative.backward(trades, quotes, Seq("key"), "ts", "ts")
    val composed = AsOfJoin.backward(trades, quotes, Seq("key"), "ts", "ts")
    assert(native.columns.toSeq == composed.columns.toSeq)
    assert(native.schema.map(f => (f.name, f.dataType)) ==
      composed.schema.map(f => (f.name, f.dataType)))
    assert(native.count() == trades.count())
  }

  test("tolerance nulls out matches older than the lookback") {
    val r = AsOfJoinNative.backward(trades, quotes, Seq("key"), "ts", "ts",
      toleranceSeconds = Some(120L))
      .select($"qty", $"asof_price").as[(Long, Option[Double])]
      .collect().toMap
    assert(r(5L).isEmpty)
    assert(r(6L).contains(101.0))
    assert(r(8L).isEmpty)
  }

  test("property (seeded random): row-identical to the composed operator") {
    val rnd = new scala.util.Random(29)
    // many keys + duplicate timestamps + unmatched keys on both sides
    val lDf = Seq.tabulate(500)(i =>
      (i.toLong, rnd.nextInt(13).toLong, rnd.nextInt(400).toLong))
      .toDF("lid", "key", "t")
      .select($"lid", $"key", timestamp_micros($"t").as("ts"))
      .repartition(7) // arbitrary incoming partitioning
    val rDf = Seq.tabulate(600)(i =>
      (i.toLong, (rnd.nextInt(13) + 3).toLong, rnd.nextInt(400).toLong))
      .toDF("rid", "key", "t")
      .select($"rid", $"key", timestamp_micros($"t").as("ts"), ($"rid" * 2).as("payload"))
    // project to the determined part of the result: equal-(key,ts) right
    // ties are sort-order nondeterministic in BOTH formulations, so
    // compare matched ts (determined), not rid
    def det(df: DataFrame) = df.select($"lid", $"asof_ts").as[(Long, Option[Long])]
      .collect().toMap
    val native = det(AsOfJoinNative.backward(lDf, rDf, Seq("key"), "ts", "ts")
      .withColumn("asof_ts", unix_micros($"asof_ts")))
    val composed = det(AsOfJoin.backward(lDf, rDf, Seq("key"), "ts", "ts")
      .withColumn("asof_ts", unix_micros($"asof_ts")))
    assert(native == composed)
  }

  test("self-join source (shared expression ids) resolves correctly") {
    val events = Seq(
      (1L, "purchase", 1L, 10L),
      (2L, "click", 1L, 5L),
      (3L, "click", 1L, 8L),
      (4L, "purchase", 2L, 7L),
      (5L, "click", 2L, 9L) // after the purchase → no match
    ).toDF("event_id", "event_type", "user_id", "t")
      .select($"event_id", $"event_type", $"user_id", timestamp_micros($"t").as("ts"))
    val purchases = events.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts")
    val clicks = events.filter($"event_type" === "click")
      .select($"user_id", $"ts", $"event_id".as("click_id"))
    val r = AsOfJoinNative.backward(purchases, clicks, Seq("user_id"), "ts", "ts")
      .select($"event_id", $"asof_click_id").as[(Long, Option[Long])]
      .collect().toMap
    assert(r(1L).contains(3L)) // most recent of the two prior clicks
    assert(r(4L).isEmpty)
  }

  test("null keys group together (window-partition semantics, like composed)") {
    val l = Seq((1L, Option(7L), 100L), (2L, Option.empty[Long], 100L))
      .toDF("lid", "key", "t")
      .select($"lid", $"key", timestamp_micros($"t").as("ts"))
    val r = Seq((10L, Option(7L), 50L), (11L, Option.empty[Long], 60L))
      .toDF("rid", "key", "t")
      .select($"rid", $"key", timestamp_micros($"t").as("ts"))
    def got(df: DataFrame) = df.select($"lid", $"asof_rid")
      .as[(Long, Option[Long])].collect().toMap
    val native = got(AsOfJoinNative.backward(l, r, Seq("key"), "ts", "ts"))
    val composed = got(AsOfJoin.backward(l, r, Seq("key"), "ts", "ts"))
    assert(native == composed)
    assert(native(2L).contains(11L)) // null key matched the null-key right row
  }

  test("multi-column keys") {
    val l = Seq((1L, 1L, "a", 100L), (2L, 1L, "b", 100L)).toDF("lid", "k1", "k2", "t")
      .select($"lid", $"k1", $"k2", timestamp_micros($"t").as("ts"))
    val r = Seq((10L, 1L, "a", 90L), (11L, 1L, "b", 95L)).toDF("rid", "k1", "k2", "t")
      .select($"rid", $"k1", $"k2", timestamp_micros($"t").as("ts"))
    val got = AsOfJoinNative.backward(l, r, Seq("k1", "k2"), "ts", "ts")
      .select($"lid", $"asof_rid").as[(Long, Option[Long])].collect().toMap
    assert(got(1L).contains(10L) && got(2L).contains(11L))
  }

  test("forward as-of picks the earliest quote at or after the trade") {
    val r = AsOfJoinNative.forward(trades, quotes, Seq("key"), "ts", "ts")
      .select($"qty", $"asof_price").as[(Long, Option[Double])]
      .collect().toMap
    assert(r(5L).contains(101.0)) // 10:03 → earliest following is 10:05
    assert(r(6L).contains(101.0)) // tie: 10:05 quote matches (>= )
    assert(r(7L).contains(100.0)) // 09:59 → first quote at 10:00
    assert(r(8L).isEmpty)         // 11:00, no later quote for key 2
    assert(r(9L).isEmpty)         // key without quotes
  }

  test("forward tolerance nulls matches farther ahead than the horizon") {
    val r = AsOfJoinNative.forward(trades, quotes, Seq("key"), "ts", "ts",
      toleranceSeconds = Some(60L))
      .select($"qty", $"asof_price").as[(Long, Option[Double])]
      .collect().toMap
    assert(r(5L).isEmpty)          // 2 min ahead > 1 min horizon
    assert(r(6L).contains(101.0))  // 0 gap
    assert(r(7L).contains(100.0))  // 1 min ahead, exactly at horizon
  }

  test("forward property (seeded random): matches per-row brute force") {
    val rnd = new scala.util.Random(31)
    val lefts = Seq.tabulate(150)(i =>
      (i.toLong, rnd.nextInt(6).toLong, rnd.nextInt(500).toLong))
    val rights = Seq.tabulate(200)(i =>
      (i.toLong, rnd.nextInt(6).toLong, rnd.nextInt(500).toLong))
    val lDf = lefts.toDF("lid", "key", "t")
      .select($"lid", $"key", timestamp_micros($"t").as("ts"))
    val rDf = rights.toDF("rid", "key", "t")
      .select($"rid", $"key", timestamp_micros($"t").as("ts"))
    val got = AsOfJoinNative.forward(lDf, rDf, Seq("key"), "ts", "ts")
      .select($"lid", unix_micros($"asof_ts")).as[(Long, Option[Long])]
      .collect().toMap
    lefts.foreach { case (lid, key, t) =>
      val candidates = rights.filter(r => r._2 == key && r._3 >= t)
      val expected =
        if (candidates.isEmpty) None else Some(candidates.map(_._3).min)
      assert(got(lid) == expected, s"left $lid key $key t $t")
    }
  }

  test("missing column and key-type mismatch fail loudly") {
    intercept[IllegalArgumentException] {
      AsOfJoinNative.backward(trades, quotes, Seq("nope"), "ts", "ts")
    }
    val badRight = quotes.withColumn("key", $"key".cast("int"))
    intercept[IllegalArgumentException] {
      AsOfJoinNative.backward(trades, badRight, Seq("key"), "ts", "ts")
    }
  }

  test("column resolution follows Spark's resolver (case-insensitive)") {
    // the composed AsOfJoin resolves through the analyzer, which is
    // case-insensitive by default; the native drop-in must match
    val r = AsOfJoinNative.backward(trades, quotes, Seq("KEY"), "TS", "Ts")
      .select($"qty", $"asof_price").as[(Long, Option[Double])]
      .collect().toMap
    assert(r(5L).contains(100.0) && r(9L).isEmpty)
  }

  test("duplicate-named columns fail loudly instead of first-match") {
    val dupRight = quotes.select($"key", $"ts", $"price",
      ($"price" * 2).as("PRICE"))
    val e = intercept[IllegalArgumentException] {
      // 'price' matches two right-side columns case-insensitively; the
      // old first-match would silently pick one as payload key... the
      // loud path triggers on resolving it as the ts column
      AsOfJoinNative.backward(trades, dupRight, Seq("key"), "ts", "price")
    }
    assert(e.getMessage.contains("ambiguous"), e.getMessage)
  }

  test("nearest picks the smaller |gap|; exact tie takes the BACKWARD row") {
    val l = Seq((1L, ts("2024-01-01 10:00:00"), 1L)).toDF("key", "ts", "qty")
    // backward candidate 60s before, forward candidate 30s after
    val r1 = Seq(
      (1L, ts("2024-01-01 09:59:00"), 1.0),
      (1L, ts("2024-01-01 10:00:30"), 2.0)).toDF("key", "ts", "price")
    val n1 = AsOfJoinNative.nearest(l, r1, Seq("key"), "ts", "ts")
      .select($"asof_price").as[Option[Double]].head()
    assert(n1.contains(2.0))
    // exact tie: 60s both directions -> backward (earlier) row
    val r2 = Seq(
      (1L, ts("2024-01-01 09:59:00"), 1.0),
      (1L, ts("2024-01-01 10:01:00"), 2.0)).toDF("key", "ts", "price")
    val n2 = AsOfJoinNative.nearest(l, r2, Seq("key"), "ts", "ts")
      .select($"asof_price").as[Option[Double]].head()
    assert(n2.contains(1.0))
  }

  test("nearest property (seeded random): per-row brute force, tie -> backward") {
    val rnd = new scala.util.Random(11)
    val lRows = (1 to 120).map(i => (rnd.nextInt(4).toLong,
      ts(s"2024-01-01 10:${10 + rnd.nextInt(40)}:${10 + rnd.nextInt(50)}"),
      i.toLong))
    val rRows = (1 to 80).map(i => (rnd.nextInt(5).toLong,
      ts(s"2024-01-01 10:${10 + rnd.nextInt(40)}:${10 + rnd.nextInt(50)}"),
      i.toDouble))
    val lDf = lRows.toDF("key", "ts", "qty")
    val rDf = rRows.toDF("key", "ts", "price")
    val got = AsOfJoinNative.nearest(lDf, rDf, Seq("key"), "ts", "ts")
      .select($"qty", $"asof_ts".cast("long")).as[(Long, Option[Long])]
      .collect().toMap
    lRows.foreach { case (key, t, qty) =>
      val cands = rRows.filter(_._1 == key)
      val expected =
        if (cands.isEmpty) None
        else {
          val best = cands.map(c => (math.abs(c._2.getTime - t.getTime),
            c._2.getTime)).minBy(c => (c._1, c._2))
          // tie -> backward = the earlier timestamp among equal gaps
          Some(best._2 / 1000L)
        }
      assert(got(qty) == expected, s"left $qty key $key t $t")
    }
  }

  test("nearest tolerance bounds |gap| symmetrically") {
    val l = Seq((1L, ts("2024-01-01 10:00:00"), 1L)).toDF("key", "ts", "qty")
    val r = Seq((1L, ts("2024-01-01 10:02:00"), 5.0)).toDF("key", "ts", "price")
    val within = AsOfJoinNative.nearest(l, r, Seq("key"), "ts", "ts",
      toleranceSeconds = Some(150L)).select($"asof_price")
      .as[Option[Double]].head()
    assert(within.contains(5.0))
    val outside = AsOfJoinNative.nearest(l, r, Seq("key"), "ts", "ts",
      toleranceSeconds = Some(60L)).select($"asof_price")
      .as[Option[Double]].head()
    assert(outside.isEmpty)
  }

  test("inner variants drop unmatched left rows (incl. tolerance degrades)") {
    // trades key 3 has no quotes; key 2 trade at 11:00 has only a
    // 10:00 quote (out of a 30-min tolerance)
    val joined = AsOfJoinNative.backwardInner(trades, quotes, Seq("key"),
      "ts", "ts", toleranceSeconds = Some(1800L))
    val kept = joined.select($"qty").as[Long].collect().toSet
    assert(kept == Set(5L, 6L)) // 7 has no prior quote, 8 degraded, 9 no key
    val leftForm = AsOfJoinNative.backward(trades, quotes, Seq("key"),
      "ts", "ts", toleranceSeconds = Some(1800L))
      .filter($"asof_ts".isNotNull)
    assert(joined.collect().toSet == leftForm.collect().toSet)
    // nearestInner keeps only in-horizon rows too
    // qty 6 @10:05 exact (gap 0); qty 7 @09:59 -> 10:00 forward (60s,
    // at the horizon); qty 5 @10:03's nearest is 10:05 (120s) -> dropped
    val ni = AsOfJoinNative.nearestInner(trades, quotes, Seq("key"),
      "ts", "ts", toleranceSeconds = Some(60L))
    assert(ni.select($"qty").as[Long].collect().toSet == Set(6L, 7L))
  }

  test("broadcast path: BroadcastExchange on right, ZERO exchange/sort on left") {
    val df = AsOfJoinNative.backward(trades, quotes, Seq("key"), "ts", "ts",
      broadcastRight = true)
    df.collect()
    val plan = executed(df)
    assert(collectWithSubqueries(plan) {
      case e: BroadcastAsOfJoinExec => e }.size == 1)
    assert(collectWithSubqueries(plan) {
      case e: org.apache.spark.sql.execution.exchange.BroadcastExchangeLike => e
    }.size == 1, plan.toString)
    assert(collectWithSubqueries(plan) {
      case e: ShuffleExchangeLike => e }.isEmpty, plan.toString)
    assert(collectWithSubqueries(plan) {
      case s: org.apache.spark.sql.execution.SortExec => s }.isEmpty,
      plan.toString)
  }

  test("broadcast path: row-identical to the merge exec on adversarial shapes") {
    val rnd = new scala.util.Random(43)
    val lDf = Seq.tabulate(500)(i =>
      (i.toLong, rnd.nextInt(13).toLong, rnd.nextInt(400).toLong))
      .toDF("lid", "key", "t")
      .select($"lid", $"key", timestamp_micros($"t").as("ts"))
      .repartition(7)
    val rDf = Seq.tabulate(600)(i =>
      (i.toLong, (rnd.nextInt(13) + 3).toLong, rnd.nextInt(400).toLong))
      .toDF("rid", "key", "t")
      .select($"rid", $"key", timestamp_micros($"t").as("ts"),
        ($"rid" * 2).as("payload"))
    def det(df: DataFrame) = df
      .withColumn("m", unix_micros($"asof_ts"))
      .select($"lid", $"m").as[(Long, Option[Long])].collect().toMap
    for (fwd <- Seq(false, true); tol <- Seq(None, Some(40L))) {
      val run = if (fwd) AsOfJoinNative.forward _ else AsOfJoinNative.backward _
      val shuffled = det(run(lDf, rDf, Seq("key"), "ts", "ts", "asof_",
        tol, false))
      val broadcast = det(run(lDf, rDf, Seq("key"), "ts", "ts", "asof_",
        tol, true))
      assert(broadcast == shuffled, s"fwd=$fwd tol=$tol")
    }
    // nearest composes two broadcast passes; tie contract unchanged
    val nS = det(AsOfJoinNative.nearest(lDf, rDf, Seq("key"), "ts", "ts"))
    val nB = det(AsOfJoinNative.nearest(lDf, rDf, Seq("key"), "ts", "ts",
      broadcastRight = true))
    assert(nB == nS)
  }

  test("broadcast path: null keys and null timestamps match the merge exec") {
    val l = Seq((1L, Option(5L), Option(100L)), (2L, None, Option(100L)),
      (3L, Option(5L), None), (4L, Option(9L), Option(50L)))
      .toDF("lid", "key", "t")
      .select($"lid", $"key", timestamp_micros($"t").as("ts"))
    val r = Seq((10L, Option(5L), Option(90L)), (11L, None, Option(80L)),
      (12L, Option(5L), None), (13L, Option(9L), Option(60L)))
      .toDF("rid", "key", "t")
      .select($"rid", $"key", timestamp_micros($"t").as("ts"))
    def got(df: DataFrame) = df.select($"lid", $"asof_rid")
      .as[(Long, Option[Long])].collect().toMap
    for (fwd <- Seq(false, true)) {
      val run = if (fwd) AsOfJoinNative.forward _ else AsOfJoinNative.backward _
      assert(got(run(l, r, Seq("key"), "ts", "ts", "asof_", None, true)) ==
        got(run(l, r, Seq("key"), "ts", "ts", "asof_", None, false)),
        s"fwd=$fwd")
    }
  }
}
