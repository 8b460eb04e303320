package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Median/MAD outlier rule: doubled-median order statistics, the
  * degenerate MAD=0 regime, odd/even counts, row-level/stats parity,
  * and a brute-force reference on random data. */
class AnomalySpec extends SparkSpec {
  import spark.implicits._

  private def stats(vals: Seq[Long], k: Long = 5L): Row =
    Anomaly.madOutlierStats(
      vals.map(("g", _)).toDF("key", "v"), "key", col("v"), k)
      .collect().head

  test("glitch among constants: MAD 0, every deviation flagged") {
    val r = stats(Seq(10L, 10L, 10L, 10L, 10L, 1000L))
    assert(r.getAs[Long]("n") === 6L)
    assert(r.getAs[Long]("med2") === 20L)
    assert(r.getAs[Long]("mad4") === 0L)
    assert(r.getAs[Long]("n_anom") === 1L)
    assert(r.getAs[Long]("anom_sum") === 1000L)
  }

  test("odd count: exact middle, doubled") {
    val r = stats(Seq(1L, 2L, 3L, 4L, 100L))
    assert(r.getAs[Long]("med2") === 6L)  // median 3
    assert(r.getAs[Long]("mad4") === 4L)  // MAD 1
    assert(r.getAs[Long]("n_anom") === 1L)
    assert(r.getAs[Long]("anom_sum") === 100L)
  }

  test("even count: half-integer median carried exactly") {
    val r = stats(Seq(1L, 3L, 5L, 7L))
    assert(r.getAs[Long]("med2") === 8L)  // median 4.0
    assert(r.getAs[Long]("mad4") === 8L)  // MAD 2.0
    assert(r.getAs[Long]("n_anom") === 0L)
  }

  test("row flags agree with the aggregate count, multi-key") {
    val df = (Seq.tabulate(50)(i => ("a", i.toLong)) ++
      Seq(("a", 100000L)) ++
      Seq.tabulate(30)(i => ("b", 1000L + i))).toDF("key", "v")
    val agg = Anomaly.madOutlierStats(df, "key", col("v"), 5L)
      .select("key", "n_anom").as[(String, Long)].collect().toMap
    val flags = Anomaly.madFlags(df, "key", col("v"), 5L)
      .filter(col("is_anom")).groupBy("key").count()
      .as[(String, Long)].collect().toMap
    assert(agg("a") === flags.getOrElse("a", 0L))
    assert(agg("b") === flags.getOrElse("b", 0L))
    assert(agg("a") >= 1L)
  }

  test("brute-force parity on random data") {
    val rnd = new scala.util.Random(11)
    val vals = Seq.fill(257)(rnd.nextInt(1000).toLong) ++
      Seq.fill(3)(1000000L + rnd.nextInt(100))
    def med2Of(xs: Seq[Long]): Long = {
      val s = xs.sorted; val n = s.length
      s((n + 1) / 2 - 1) + s((n + 2) / 2 - 1)
    }
    val m2 = med2Of(vals)
    val devs = vals.map(v => math.abs(2 * v - m2))
    val m4 = med2Of(devs)
    val expected = vals.indices.count(i => 2 * devs(i) > 5 * m4)
    val r = stats(vals)
    assert(r.getAs[Long]("med2") === m2)
    assert(r.getAs[Long]("mad4") === m4)
    assert(r.getAs[Long]("n_anom") === expected.toLong)
  }
}
