package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FrequencySpec extends SparkSpec {
  import spark.implicits._

  test("misraGries: every item with count > n/k survives, at most k survive") {
    // 1001 distinct values, one of them 20% of the stream, k = 15
    // fixed seed: the guarantee must hold for ANY order, this pins one
    val stream = new scala.util.Random(7).shuffle(
      (Seq.fill(250)("hot") ++ (0 until 1000).map(i => s"u$i")).toList)
    val survivors = Frequency.misraGries(stream.iterator, 15).toSet
    assert(survivors.size <= 15)
    assert(survivors.contains("hot")) // 250 > 1250/15
  }

  test("heavyHitters equals plain GROUP BY + HAVING under real shedding") {
    // distinct terms (1001) >> MG capacity (n/minCount + 1 = 13), so the
    // candidate pass must shed - and the result must still be exact
    val terms = (Seq.fill(250)("hot") ++ Seq.fill(120)("warm") ++
      (0 until 1000).map(i => s"u$i"))
    val df = terms.toDF("term").repartition(8)
    val n = terms.size.toLong
    val minCount = 110L
    val got = Frequency.heavyHitters(df, "term", minCount)
      .as[(String, Long)].collect().toMap
    val want = df.groupBy("term").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
      .as[(String, Long)].collect().toMap
    assert(got == want)
    assert(got == Map("hot" -> 250L, "warm" -> 120L))
    assert(n / minCount + 1 < 20) // the test really runs in shedding regime
  }

  test("null terms are ignored, not counted") {
    val df = Seq(Some("a"), Some("a"), None, Some("b"))
      .toDF("term")
    val got = Frequency.heavyHitters(df, "term", 2L)
      .as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 2L))
  }

  test("refuses thresholds that would need >10M-entry summaries") {
    val df = Seq("a", "b").toDF("term")
    val e = intercept[IllegalArgumentException] {
      Frequency.heavyHitters(df, "term", 1L, Some(100_000_000L))
    }
    assert(e.getMessage.contains("GROUP BY"))
  }

  private lazy val cmTerms =
    (Seq.fill(40)("hot") ++ Seq.fill(7)("warm") ++
      (0 until 30).map(i => s"u$i")).toDF("term")

  test("countMin: estimates are one-sided (est >= exact), sketch stays d*w") {
    val sketch = Frequency.countMinTable(cmTerms, "term",
      depth = 4, width = 16, seed = 42L)
    assert(sketch.count() <= 4 * 16)
    val exact = cmTerms.groupBy("term").agg(count(lit(1)).as("cnt"))
    val est = Frequency.countMinEstimate(sketch, exact.select("term"),
        "term", depth = 4, width = 16, seed = 42L)
      .join(exact, "term")
      .as[(String, Long, Long)].collect()
    assert(est.nonEmpty)
    est.foreach { case (t, e, c) =>
      assert(e >= c, s"$t: est $e < exact $c") }
  }

  test("countMin sketches merge by cell-wise sum") {
    // a ⊎ b is exactly the cmTerms multiset
    val a = (Seq.fill(20)("hot") ++ Seq.fill(3)("warm") ++
      (0 until 15).map(i => s"u$i")).toDF("term")
    val b = (Seq.fill(20)("hot") ++ Seq.fill(4)("warm") ++
      (15 until 30).map(i => s"u$i")).toDF("term")
    def cells(df: org.apache.spark.sql.DataFrame) =
      Frequency.countMinTable(df, "term", depth = 4, width = 16, seed = 42L)
        .as[(Int, Long, Long)].collect()
        .map { case (r, bk, c) => (r, bk) -> c }.toMap
    val (ca, cb) = (cells(a), cells(b))
    val merged = (ca.keySet ++ cb.keySet).map { k =>
      k -> (ca.getOrElse(k, 0L) + cb.getOrElse(k, 0L))
    }.toMap
    assert(cells(cmTerms) == merged)
  }

  test("countMin: an unseen term can only read colliding mass, never negative") {
    val sketch = Frequency.countMinTable(cmTerms, "term",
      depth = 4, width = 16, seed = 42L)
    val unseen = Seq("never-seen-term").toDF("term")
    val est = Frequency.countMinEstimate(sketch, unseen, "term",
        depth = 4, width = 16, seed = 42L)
      .as[(String, Long)].head()
    assert(est._2 >= 0L)
  }

  test("countMinJoinSize: one-sided (est >= exact), exact on collision-free keys") {
    val a = (Seq.fill(3)("x") ++ Seq.fill(2)("y") ++ Seq("z")).toDF("k")
    val b = (Seq.fill(4)("x") ++ Seq("y") ++ Seq.fill(2)("w")).toDF("k")
    def sk(df: org.apache.spark.sql.DataFrame) =
      Frequency.countMinTable(df, "k", depth = 4, width = 64, seed = 42L)
    val est = Frequency.countMinJoinSize(sk(a), sk(b))
      .as[Long].head()
    val exact = a.join(b, "k").count() // 3*4 + 2*1 = 14
    assert(exact == 14L)
    assert(est >= exact)
    // 4 distinct keys in 64 buckets: overwhelmingly collision-free at
    // some depth row -> the min-row bound is exact here
    assert(est == exact, s"est $est")
  }

  test("countMinJoinSize: disjoint key sets bound the join at 0") {
    val a = Seq("a", "b").toDF("k")
    val b = Seq("c", "d").toDF("k")
    def sk(df: org.apache.spark.sql.DataFrame) =
      Frequency.countMinTable(df, "k", depth = 4, width = 64, seed = 42L)
    val est = Frequency.countMinJoinSize(sk(a), sk(b)).as[Long].head()
    assert(est == 0L || est >= 0L)
    // with 4 keys in 64x4 cells a fully-overlap-free row exists whp;
    // pin the stronger outcome for this fixed seed
    assert(est == 0L)
  }

  test("log2Bin: integer-exact power-of-two boundaries, nonpositive → 0") {
    val got = Seq(-5L, 0L, 1L, 2L, 3L, 4L, 1023L, 1024L).toDF("v")
      .select($"v", Frequency.log2Bin($"v").as("bin"))
      .as[(Long, Int)].collect().toMap
    assert(got == Map(-5L -> 0, 0L -> 0, 1L -> 1, 2L -> 2, 3L -> 2,
      4L -> 3, 1023L -> 10, 1024L -> 11))
  }

  test("log2 histograms merge by (key, bin)-wise sum") {
    val a = Seq(("k", 1L), ("k", 100L), ("j", 7L)).toDF("key", "v")
    val b = Seq(("k", 100L), ("k", 5000L), ("j", 7L)).toDF("key", "v")
    val all = a.unionAll(b)
    def cells(df: org.apache.spark.sql.DataFrame) =
      Frequency.log2Histogram(df, "key", "v")
        .as[(String, Int, Long)].collect()
        .map { case (k, bn, c) => (k, bn) -> c }.toMap
    val (ca, cb) = (cells(a), cells(b))
    val merged = (ca.keySet ++ cb.keySet).map { k =>
      k -> (ca.getOrElse(k, 0L) + cb.getOrElse(k, 0L))
    }.toMap
    assert(cells(all) == merged)
  }

  test("histQuantile brackets the exact quantile (seeded random, 2 quantiles)") {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 500).map { _ =>
      (s"k${rnd.nextInt(3)}", rnd.nextInt(100000).toLong + 1)
    }
    val df = rows.toDF("key", "v").repartition(4)
    val hist = Frequency.log2Histogram(df, "key", "v")
    for ((qn, qd) <- Seq((1L, 2L), (9L, 10L))) {
      val est = Frequency.histQuantile(hist, "key", qn, qd)
        .as[(String, Long, Int, Long, Long)].collect()
        .map(r => r._1 -> r).toMap
      val byKey = rows.groupBy(_._1)
      assert(est.keySet == byKey.keySet)
      byKey.foreach { case (k, kv) =>
        val sorted = kv.map(_._2).sorted
        val n = sorted.size.toLong
        val target = ((qn * n + qd - 1) / qd).toInt
        val exact = sorted(target - 1)
        val (_, gotN, _, lo, hi) = est(k)
        assert(gotN == n)
        assert(lo <= exact && exact <= hi,
          s"$k q=$qn/$qd: [$lo,$hi] misses $exact")
        assert(hi < 2 * lo || lo <= 1) // the 2x relative bracket
      }
    }
  }

  test("histQuantile: single-value key and zero values hit exact bins") {
    val df = Seq(("one", 10L), ("zero", 0L), ("zero", 0L), ("zero", 3L))
      .toDF("key", "v")
    val est = Frequency.histQuantile(
        Frequency.log2Histogram(df, "key", "v"), "key", 1L, 2L)
      .as[(String, Long, Int, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(est("one") == (("one", 1L, 4, 8L, 15L)))   // 10 → bin 4
    // zero key: n=3, target=2 → second smallest = 0 → bin 0, [0,0]
    assert(est("zero") == (("zero", 3L, 0, 0L, 0L)))
  }

  test("exactKth: lower median per key equals the sort-based answer") {
    val rnd = new scala.util.Random(17)
    val data = Seq.tabulate(5000)(i =>
      (s"k${i % 4}", rnd.nextInt(2000000).toLong - 1000000L))
    val df = data.toDF("key", "v").repartition(7)
    val got = Frequency.exactKth(df, "key", "v")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    data.groupBy(_._1).foreach { case (k, rows) =>
      val sorted = rows.map(_._2).sorted
      val expected = sorted(((sorted.length + 1) / 2 - 1).toInt)
      assert(got(k) == ((rows.length.toLong, expected)), s"key $k")
    }
  }

  test("exactKth: arbitrary rank, duplicates, tiny bits (many passes)") {
    // heavy duplication + bits=2 forces ~16-way recursion over many passes
    val data = Seq.tabulate(1000)(i => ("a", (i % 7).toLong * 1000L))
    val df = data.toDF("key", "v")
    (1 to 5).foreach { pick =>
      val rank = pick * 199L // spread ranks across [199, 995]
      val got = Frequency.exactKth(df, "key", "v", _ => rank, bits = 2)
        .as[(String, Long, Long)].head()
      val expected = data.map(_._2).sorted.apply(rank.toInt - 1)
      assert(got == (("a", 1000L, expected)), s"rank $rank")
    }
  }

  test("exactRanks: all quartiles in shared passes equal per-rank answers") {
    val rnd = new scala.util.Random(23)
    val data = Seq.tabulate(3000)(i => (s"g${i % 3}", rnd.nextInt(100000).toLong))
    val df = data.toDF("key", "v").repartition(5)
    val quartiles = Seq(
      "p25" -> ((n: Long) => (n + 3) / 4),
      "p50" -> ((n: Long) => (2 * n + 3) / 4),
      "p75" -> ((n: Long) => (3 * n + 3) / 4))
    val got = Frequency.exactRanks(df, "key", "v", quartiles)
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._4).toMap
    data.groupBy(_._1).foreach { case (k, rows) =>
      val sorted = rows.map(_._2).sorted
      quartiles.foreach { case (tag, rankOf) =>
        val expected = sorted(rankOf(rows.length.toLong).toInt - 1)
        assert(got((k, tag)) == expected, s"key $k $tag")
      }
    }
    assert(got.size == 9) // 3 keys x 3 quartiles
  }

  test("exactRanks: duplicate tags refused") {
    val df = Seq(("a", 1L), ("a", 2L)).toDF("key", "v")
    intercept[IllegalArgumentException] {
      Frequency.exactRanks(df, "key", "v",
        Seq("x" -> ((n: Long) => 1L), "x" -> ((n: Long) => 2L)))
    }
  }

  test("exactKth: single-value key short-circuits, guards fire") {
    import org.apache.spark.sql.functions.lit
    val one = Seq(("a", 5L), ("a", 5L), ("b", 9L)).toDF("key", "v")
    val got = Frequency.exactKth(one, "key", "v")
      .as[(String, Long, Long)].collect().toSet
    assert(got == Set(("a", 2L, 5L), ("b", 1L, 9L)))
    intercept[IllegalArgumentException] { // rank out of bounds
      Frequency.exactKth(one, "key", "v", _ => 99L)
    }
    intercept[IllegalArgumentException] { // non-integral values
      Frequency.exactKth(one.withColumn("v", lit(1.5)), "key", "v")
    }
  }

  test("exactRanks: NULL keys and NULL values refused loudly") {
    import org.apache.spark.sql.functions.{col, when}
    val nullKey = Seq(("a", 1L), (null: String, 2L), ("a", 3L))
      .toDF("key", "v")
    val e1 = intercept[IllegalArgumentException] {
      Frequency.exactKth(nullKey, "key", "v")
    }
    assert(e1.getMessage.contains("NULL"), e1.getMessage)
    val nullVal = Seq(("a", 1L), ("a", 2L), ("a", 3L)).toDF("key", "v")
      .withColumn("v", when(col("v") === 2L, null).otherwise(col("v")))
    val e2 = intercept[IllegalArgumentException] {
      Frequency.exactKth(nullVal, "key", "v")
    }
    assert(e2.getMessage.contains("NULL"), e2.getMessage)
  }

  test("exactRanks: bucket arithmetic exact beyond 2^53 (integral div)") {
    // A live range wider than 2^53 makes double division round across
    // bucket boundaries; integral div must keep the selection exact.
    val big = Long.MaxValue / 2
    val data = Seq(("k", -big), ("k", -1L), ("k", 0L), ("k", 1L),
      ("k", big - 1L), ("k", big))
    val df = data.toDF("key", "v")
    val sorted = data.map(_._2).sorted
    for (rank <- 1 to sorted.length) {
      val got = Frequency.exactKth(df, "key", "v", _ => rank.toLong)
        .as[(String, Long, Long)].collect().head
      assert(got._3 == sorted(rank - 1), s"rank $rank")
    }
  }

  test("exactRanks: key-cardinality guard refuses id-space keys") {
    // 70k keys x 2^12 buckets > the 64M driver-row cap
    val df = spark.range(70000).selectExpr("id AS key", "id AS v")
    val e = intercept[IllegalArgumentException] {
      Frequency.exactKth(df, "key", "v")
    }
    assert(e.getMessage.contains("grouping"), e.getMessage)
  }

  test("exactRanksDouble: quartiles over signed doubles equal the sort") {
    val rnd = new scala.util.Random(29)
    val data = Seq.tabulate(4000)(i =>
      (s"k${i % 3}", (rnd.nextDouble() - 0.5) * math.pow(10, rnd.nextInt(7))))
    val df = data.toDF("key", "v").repartition(7)
    val tags = Seq(
      "p25" -> ((n: Long) => (n + 3) / 4),
      "p50" -> ((n: Long) => (2 * n + 3) / 4),
      "p75" -> ((n: Long) => (3 * n + 3) / 4))
    val got = Frequency.exactRanksDouble(df, "key", "v", tags)
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    data.groupBy(_._1).foreach { case (k, rows) =>
      val sorted = rows.map(_._2).sorted
      tags.foreach { case (tag, rankOf) =>
        val expected = sorted((rankOf(rows.length.toLong) - 1).toInt)
        val (n, kth) = got((k, tag))
        assert(n == rows.length.toLong && kth == expected,
          s"($k,$tag): got $kth expected $expected")
      }
    }
  }

  test("exactRanksDouble: bits=8 (8 passes) bit-identical to bits=16") {
    val rnd = new scala.util.Random(31)
    val df = Seq.tabulate(1500)(_ => ("a", rnd.nextGaussian() * 1e-3))
      .toDF("key", "v")
    val tags = Seq("med" -> ((n: Long) => (n + 1) / 2))
    val a = Frequency.exactRanksDouble(df, "key", "v", tags, bits = 16)
      .as[(String, String, Long, Double)].head()
    val b = Frequency.exactRanksDouble(df, "key", "v", tags, bits = 8)
      .as[(String, String, Long, Double)].head()
    assert(java.lang.Double.doubleToLongBits(a._4) ==
      java.lang.Double.doubleToLongBits(b._4))
  }

  test("exactRanksDouble: IEEE total-order edges pinned (NaN, ±0.0, ±Inf)") {
    // lift order: -Inf < -1.5 < -0.0 < +0.0 < 1.5 < +Inf < NaN
    val vals = Seq(Double.NaN, Double.PositiveInfinity, 1.5, 0.0, -0.0,
      -1.5, Double.NegativeInfinity)
    val df = vals.map(("a", _)).toDF("key", "v")
    val ranks = (1 to 7).map(i => s"r$i" -> ((_: Long) => i.toLong))
    val got = Frequency.exactRanksDouble(df, "key", "v", ranks)
      .as[(String, String, Long, Double)].collect()
      .map(r => r._2 -> r._4).toMap
    def bits(d: Double) = java.lang.Double.doubleToLongBits(d)
    assert(got("r1") == Double.NegativeInfinity)
    assert(got("r2") == -1.5)
    assert(bits(got("r3")) == bits(-0.0), "rank 3 must be -0.0, not +0.0")
    assert(bits(got("r4")) == bits(0.0))
    assert(got("r5") == 1.5)
    assert(got("r6") == Double.PositiveInfinity)
    assert(got("r7").isNaN, "NaN sorts above +Inf")
    // the lift round-trips every edge bit-exactly
    for (v <- vals.filterNot(_.isNaN))
      assert(bits(graft.functions.IeeeSortable.unlift(
        graft.functions.IeeeSortable.lift(v))) == bits(v))
  }

  test("exactRanksDouble: NULLs and integral columns refused loudly") {
    val withNull = Seq(("a", java.lang.Double.valueOf(1.0)),
      ("a", null.asInstanceOf[java.lang.Double]))
      .toDF("key", "v")
    val e = intercept[IllegalArgumentException] {
      Frequency.exactRanksDouble(withNull, "key", "v",
        Seq("m" -> ((n: Long) => (n + 1) / 2)))
    }
    assert(e.getMessage.contains("NULL"), e.getMessage)
    val ints = Seq(("a", 1L)).toDF("key", "v")
    val e2 = intercept[IllegalArgumentException] {
      Frequency.exactRanksDouble(ints, "key", "v",
        Seq("m" -> ((n: Long) => 1L)))
    }
    assert(e2.getMessage.contains("exactRanks for integrals"), e2.getMessage)
  }
}
