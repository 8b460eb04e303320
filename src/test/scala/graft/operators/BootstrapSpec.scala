package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BootstrapSpec extends SparkSpec {
  import spark.implicits._

  test("cumulative Poisson(1) CDF is correct and monotone") {
    val c = Bootstrap.cumulativeProbs
    assert(c.length == 8)
    assert(math.abs(c.head - math.exp(-1.0)) < 1e-15) // P(X<=0)
    assert(math.abs(c(1) - 2 * math.exp(-1.0)) < 1e-15) // P(X<=1)
    assert(c == c.sorted && c.last < 1.0 && c.last > 0.9999)
  }

  test("weights are deterministic and Poisson(1)-shaped") {
    val keys = spark.range(200000).select(concat($"id", lit(":0")).as("k"))
    val w = keys.select(Bootstrap.poissonWeight($"k").as("w"))
    val counts = w.groupBy("w").count().as[(Int, Long)].collect().toMap
    val n = 200000.0
    // pmf(0)=pmf(1)=e^-1≈0.368, pmf(2)≈0.184 — 1% absolute tolerance
    assert(math.abs(counts(0) / n - 0.3679) < 0.01, counts)
    assert(math.abs(counts(1) / n - 0.3679) < 0.01, counts)
    assert(math.abs(counts(2) / n - 0.1839) < 0.01, counts)
    // mean ≈ 1
    val mean = w.agg(avg($"w")).head().getDouble(0)
    assert(math.abs(mean - 1.0) < 0.01, mean)
    // bit-determinism across evaluations
    val again = keys.select(Bootstrap.poissonWeight($"k").as("w"))
      .groupBy("w").count().as[(Int, Long)].collect().toMap
    assert(again == counts)
  }

  test("bootstrapSums: one row per replicate, unweighted total recovered on average") {
    val df = (1L to 2000L).map(i => (i, 10L)).toDF("id", "v")
    val r = Bootstrap.bootstrapSums(df, Seq("id"), "v", reps = 20)
      .as[(Int, Long, Long)].collect()
    assert(r.length == 20)
    assert(r.map(_._1).sorted.toSeq == (0 until 20))
    // each replicate's effective n is near 2000 (Poisson sum, sd≈45)
    r.foreach { case (_, nEff, sumV) =>
      assert(math.abs(nEff - 2000L) < 300, s"n_eff $nEff")
      assert(sumV == nEff * 10L) // constant value: sum = 10*n_eff exactly
    }
    // replicates differ (the whole point)
    assert(r.map(_._2).distinct.length > 1)
  }

  test("grouped sums: per-group rows, groups partition the global sums") {
    val df = (1L to 3000L).map(i => (i, if (i % 3 == 0) "a" else "b", 5L))
      .toDF("id", "g", "v")
    val grouped = Bootstrap.bootstrapGroupSums(df, Seq("id"), Seq("g"), "v", 6)
      .as[(String, Int, Long, Long)].collect()
    assert(grouped.length == 12) // 2 groups x 6 reps
    val global = Bootstrap.bootstrapSums(df, Seq("id"), "v", 6)
      .as[(Int, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // same weights (same key, rep) => group sums add up to the global sums
    (0 until 6).foreach { rep =>
      val parts = grouped.filter(_._2 == rep)
      assert((parts.map(_._3).sum, parts.map(_._4).sum) == global(rep))
    }
  }

  test("fast (xxhash64) path is Poisson(1)-shaped and deterministic too") {
    val keys = spark.range(200000).select($"id", lit(0).as("rep"))
    val w = keys.select(Bootstrap.weightFromUniform(
      Bootstrap.fastUniform(Seq($"id", $"rep"))).as("w"))
    val counts = w.groupBy("w").count().as[(Int, Long)].collect().toMap
    val n = 200000.0
    assert(math.abs(counts(0) / n - 0.3679) < 0.01, counts)
    assert(math.abs(counts(1) / n - 0.3679) < 0.01, counts)
    val again = keys.select(Bootstrap.weightFromUniform(
      Bootstrap.fastUniform(Seq($"id", $"rep"))).as("w"))
      .groupBy("w").count().as[(Int, Long)].collect().toMap
    assert(again == counts)
  }

  test("SQL twin renders the same cutoffs the Column form uses") {
    val sql = Bootstrap.poissonWeightSql("x")
    Bootstrap.cumulativeProbs.foreach(p => assert(sql.contains(p.toString)))
    // 2^60 rendered by the same Double.toString both engines parse back
    // to exactly 2^60 (doubles near 2^60 are 256 apart; the decimal is
    // 24 off)
    assert(sql.contains(1152921504606846976.0.toString))
  }

  test("reps < 1 fails loudly") {
    intercept[IllegalArgumentException] {
      Bootstrap.bootstrapSums(Seq((1L, 1L)).toDF("id", "v"), Seq("id"), "v", 0)
    }
  }

  test("reserved column names refused loudly") {
    val df = Seq((1L, 1L)).toDF("rep", "v")
    val e = intercept[IllegalArgumentException] {
      Bootstrap.bootstrapSums(df, Seq("rep"), "v", 2)
    }
    assert(e.getMessage.contains("reserved"), e.getMessage)
    val df2 = Seq((1L, 1L)).toDF("id", "__w")
    intercept[IllegalArgumentException] {
      Bootstrap.bootstrapSums(df2, Seq("id"), "__w", 2)
    }
  }

  test("portable path: NULL key part does not alias with the absent part") {
    // concat_ws alone SKIPS null parts, so ("a", NULL) would encode as
    // "a:<rep>" — the same string the single-key ("a") row hashes — and
    // the two rows would draw identical weights on every replicate. The
    // null-safe encoding must give NULL its own identity.
    val twoKey = Seq(("a", null: String, 100L)).toDF("k1", "k2", "v")
    val oneKey = Seq(("a", 100L)).toDF("k1", "v")
    val reps = 64
    val wTwo = Bootstrap.bootstrapGroupSums(
      twoKey, Seq("k1", "k2"), Nil, "v", reps, portable = true)
      .as[(Int, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    val wOne = Bootstrap.bootstrapSums(oneKey, Seq("k1"), "v", reps,
      portable = true)
      .as[(Int, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    assert((0 until reps).exists(r => wTwo(r) != wOne(r)),
      "(k, NULL) aliased with (k) across all 64 replicates")
    // and non-null keys' draws are untouched by the encoding change:
    // single-part keys never hit the coalesce sentinel
    val again = Bootstrap.bootstrapSums(oneKey, Seq("k1"), "v", reps,
      portable = true)
      .as[(Int, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(again == wOne)
  }

  test("bootstrapGroupCi equals the sort-based rank selection") {
    val df = (1 to 300).map(i => (i.toLong, s"g${i % 3}", (i % 17).toLong))
      .toDF("id", "g", "v")
    val reps = 40
    val got = Bootstrap.bootstrapGroupCi(df, Seq("id"), "g", "v", reps)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val sums = Bootstrap.bootstrapGroupSums(df, Seq("id"), Seq("g"), "v",
      reps).as[(String, Int, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._4).sorted.toIndexedSeq).toMap
    sums.foreach { case (g, sorted) =>
      val n = sorted.length.toLong
      val lo = sorted((math.max(1L, (n + 39) / 40) - 1).toInt)
      val hi = sorted((math.max(1L, (39 * n + 39) / 40) - 1).toInt)
      assert(got(g) == ((n, lo, hi)), s"group $g")
      assert(lo <= hi)
    }
    assert(got.size == 3)
    intercept[IllegalArgumentException] { // one-sided q refused
      Bootstrap.bootstrapGroupCi(df, Seq("id"), "g", "v", 8, qNum = 3,
        qDen = 5)
    }
  }
}
