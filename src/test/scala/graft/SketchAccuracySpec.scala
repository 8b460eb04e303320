package graft

import org.apache.spark.sql.functions._

/** The approximate scale paths recommended throughout the operator
  * docs (exact percentile → approx_percentile, countDistinct →
  * approx_count_distinct) pinned against their exact counterparts on
  * real testdata: the sketches must land within their documented error
  * bounds, or the "swap in the sketch at 100 TB" advice is wrong. */
class SketchAccuracySpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.01"

  test("approx_count_distinct within 5% of exact on event users") {
    val r = Tables.events(spark, d).agg(
      countDistinct($"user_id").as("exact"),
      approx_count_distinct($"user_id", 0.02).as("approx"))
      .as[(Long, Long)].head()
    val relErr = math.abs(r._2 - r._1).toDouble / r._1
    assert(relErr < 0.05, s"exact=${r._1} approx=${r._2} relErr=$relErr")
  }

  test("approx_percentile within 1% rank error of exact median") {
    val cents = Tables.lineitem(spark, d)
      .select(round($"l_extendedprice" * 100, 0).cast("long").as("c"))
    val (exact, approx) = cents.agg(
      percentile($"c", lit(0.5)).as("exact"),
      approx_percentile($"c", lit(0.5), lit(10000)).as("approx"))
      .as[(Double, Long)].head() match { case (e, a) => (e, a.toDouble) }
    // accuracy=10000 → rank error ≤ 1/10000; translate via the value at
    // rank ±1% as a generous envelope
    val n = cents.count()
    val lo = cents.orderBy($"c").limit((n * 0.49).toInt)
      .agg(max($"c")).as[Long].head()
    val hi = cents.orderBy($"c").limit((n * 0.51).toInt)
      .agg(max($"c")).as[Long].head()
    assert(approx >= lo && approx <= hi,
      s"approx=$approx outside [$lo, $hi] (exact=$exact)")
  }
}
