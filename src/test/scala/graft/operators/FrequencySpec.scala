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
}
