package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class PrefixSumSpec extends SparkSpec {
  import spark.implicits._

  private def rows(n: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    // non-contiguous, shuffled ids — range partitioning must not
    // depend on density or input order
    rnd.shuffle((1 to n).map(i => (i * 7L + (i % 3), rnd.nextInt(100).toLong)))
      .toDF("id", "w")
  }

  test("globalCumsum ≡ single-partition window cumsum, across nParts") {
    val df = rows(5000, 1)
    val expect = df
      .withColumn("cw", sum($"w").over(Window.orderBy($"id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .as[(Long, Long, Long)].collect().toSet
    // 1024 > the row count of many range partitions AND far past where
    // a chained-`when` offset literal would bloat the expression tree —
    // pins that the broadcast-joined offsets stay value-identical at
    // widths the old shape couldn't reach
    for (nParts <- Seq(1, 7, 64, 1024)) {
      val got = PrefixSum.globalCumsum(df, Seq(col("id")), col("w"),
          "cw", nParts)
        .as[(Long, Long, Long)].collect().toSet
      assert(got == expect, s"nParts=$nParts")
    }
  }

  test("phase-2 plan has no single-task global window") {
    val (out, pinned) = PrefixSum.globalCumsumLazy(rows(500, 2),
      Seq(col("id")), col("w"), "cw", nParts = 8)
    val plan = out.queryExecution.executedPlan.toString()
    // the window must partition on __pid — an empty PARTITION BY would
    // be the single-task shape this operator exists to avoid
    assert(plan.contains("__pid"), plan.take(2000))
    Lifecycle.release(pinned: _*)
    pinned.foreach(_.unpersist(blocking = false))
  }

  test("systematicSample: one pick per step of weight, exact crossings") {
    val df = Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 70L), (5L, 10L),
      (6L, 10L)).toDF("id", "w")
    // step=30: cum = 10,20,30,100,110,120 → picks at crossings of
    // 30,60,90 (id 3 and the heavy id 4 which crosses two) and 120
    val got = PrefixSum.systematicSample(df, Seq(col("id")), col("w"),
        step = 30L, nParts = 4)
      .select($"id").as[Long].collect().toSet
    assert(got == Set(3L, 4L, 6L))
    // total picks ≈ totalWeight/step and heavy rows always picked when
    // w >= step
    val big = rows(2000, 3)
    val total = big.agg(sum($"w")).head().getLong(0)
    val picks = PrefixSum.systematicSample(big, Seq(col("id")), col("w"),
      step = total / 40, nParts = 8).count()
    assert(picks >= 35 && picks <= 45, s"picks=$picks")
  }

  test("equiDepthBoundaries ≡ sorted-reference order statistics") {
    val rnd = new scala.util.Random(31)
    // duplicate-heavy values: order statistics must respect the full
    // (v, id) total order, not collapse ties
    val rows = (1L to 1000L).map(i => (i, rnd.nextInt(50).toLong))
    val df = rows.toDF("id", "v")
    val got = PrefixSum.equiDepthBoundaries(df,
        Seq(col("v"), col("id")), col("v"), b = 10, nParts = 8)
      .as[(Long, Long)].collect().toMap
    val sortedV = rows.sortBy(r => (r._2, r._1)).map(_._2)
    val n = rows.size
    val expect = (1 to 10).map(i =>
      i.toLong -> sortedV(((i.toLong * n + 9) / 10).toInt - 1)).toMap
    assert(got == expect)
    intercept[IllegalArgumentException] {
      PrefixSum.equiDepthBoundaries(df.limit(5), Seq(col("v"), col("id")),
        col("v"), b = 10)
    }
  }

  test("packByTokenBudget global path (PrefixSum) ≡ sharded semantics") {
    val df = (1L to 300L).map(i => (i, (i % 7) + 1)).toDF("id", "tokens")
    val global = DataMix.packByTokenBudget(df, "id", "tokens", 50L)
      .as[(Long, Long, Long)].collect().toSet
    // reference: plain single-window cumsum replica
    val w = Window.orderBy($"id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expect = df.withColumn("__c", sum($"tokens").over(w))
      .withColumn("pack_id",
        floor(($"__c" - $"tokens") / 50L).cast("long"))
      .drop("__c").as[(Long, Long, Long)].collect().toSet
    assert(global == expect)
  }
}
