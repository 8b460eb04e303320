package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChunkedFoldSpec extends SparkSpec {
  import spark.implicits._

  // reference: the exact per-key sequential fold in plain Scala, with
  // Spark `div` semantics (Java long `/` truncates toward zero)
  private def ref(vals: Seq[Long], num: Int, den: Int): Long =
    vals.tail.foldLeft(vals.head)((acc, x) =>
      (num * x + (den - num) * acc) / den)

  private def series(seed: Int, nKeys: Int, maxLen: Int): Seq[(Long, Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    (1 to nKeys).flatMap { k =>
      val len = 1 + rnd.nextInt(maxLen)
      // negatives included: `div` truncation vs floorDiv diverges there
      (1 to len).map(i => (k.toLong, i.toLong, rnd.nextLong() % 10000L))
    }
  }

  test("chunked ≡ whole-series fold on random series (negatives incl.)") {
    val rows = series(seed = 7, nKeys = 40, maxLen = 97)
    val df = rows.toDF("k", "idx", "v")
    val expect = rows.groupBy(_._1).map { case (k, s) =>
      k -> ref(s.sortBy(_._2).map(_._3), 2, 10)
    }
    for (chunkSize <- Seq(1, 5, 32, 1000)) {
      val got = ChunkedFold.ewmaChunked(df, "k", Seq(col("idx")), col("v"),
          num = 2, den = 10, chunkSize = chunkSize)
        .as[(Long, Long, Long)].collect()
        .map(r => r._1 -> r._3).toMap
      assert(got == expect, s"chunkSize=$chunkSize")
    }
  }

  test("chunked ≡ the q121 array-fold SQL shape") {
    val df = series(seed = 11, nKeys = 10, maxLen = 50).toDF("k", "idx", "v")
    val whole = df
      .groupBy($"k")
      .agg(sort_array(collect_list(struct($"idx", $"v"))).as("__arr"))
      .withColumn("__vals", expr("transform(__arr, x -> x.v)"))
      .withColumn("ewma", expr(
        """aggregate(slice(__vals, 2, greatest(size(__vals) - 1, 0)),
           __vals[0], (acc, x) -> (2*x + 8*acc) div 10)"""))
      .select($"k", $"ewma").as[(Long, Long)].collect().toMap
    val chunked = ChunkedFold.ewmaChunked(df, "k", Seq(col("idx")),
        col("v"), num = 2, den = 10, chunkSize = 8)
      .select($"k", $"ewma").as[(Long, Long)].collect().toMap
    assert(chunked == whole)
  }

  test("one hot key with a 10⁶-event series folds in bounded chunks") {
    // the regime the whole-series shape can't survive: every event on
    // ONE key. 1M here (CI-sized); the shape is invariant in series
    // length — no row ever exceeds chunkSize elements.
    val n = 1000000L
    val df = spark.range(1, n + 1)
      .select(lit(1L).as("k"), $"id".as("idx"),
        (($"id" % 1000L) - 500L).as("v"))
    val got = ChunkedFold.ewmaChunked(df, "k", Seq(col("idx")), col("v"),
        num = 2, den = 10, chunkSize = 1024)
      .as[(Long, Long, Long)].collect()
    assert(got.length == 1)
    assert(got.head._2 == n)
    val expect = ref((1L to n).map(i => (i % 1000L) - 500L), 2, 10)
    assert(got.head._3 == expect)
  }

  test("single-element series returns its own value; bad params refused") {
    val df = Seq((1L, 1L, 42L)).toDF("k", "idx", "v")
    val got = ChunkedFold.ewmaChunked(df, "k", Seq(col("idx")), col("v"),
        num = 2, den = 10, chunkSize = 4)
      .as[(Long, Long, Long)].collect()
    assert(got.toSeq == Seq((1L, 1L, 42L)))
    intercept[IllegalArgumentException] {
      ChunkedFold.ewmaChunked(df, "k", Seq(col("idx")), col("v"),
        num = 10, den = 10, chunkSize = 4)
    }
    intercept[IllegalArgumentException] {
      ChunkedFold.ewmaChunked(df, "k", Seq(col("idx")), col("v"),
        num = 2, den = 10, chunkSize = 0)
    }
  }
}
