package graft

import org.apache.spark.sql.functions._

/** The frequency-map exact-percentile rewrite must be bit-identical to
  * the plain per-group sort — on the real q62 input AND on the
  * high-duplication shape it exists for. */
class QuantileFreqSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  private def key(r: org.apache.spark.sql.Row) =
    (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))

  test("freq rewrite equals plain percentile on lineitem (q62 input)") {
    val plain = queries.RelationalQueries.groupQuantiles(spark, d)
      .collect().map(key).toSet
    val freq = queries.RelationalQueries.groupQuantilesFreq(spark, d)
      .collect().map(key).toSet
    assert(freq == plain)
  }

  test("freq rewrite equals plain percentile on a high-duplication column") {
    import spark.implicits._
    // 60k rows, 100 distinct values, 3 groups — the shape the rewrite wins on
    val df = spark.range(0, 60000).select(
      (col("id") % 3).cast("string").as("g"),
      pmod(col("id") * 2654435761L, lit(100)).as("v"))
    def agg(freqForm: Boolean) =
      if (freqForm)
        df.groupBy(col("g"), col("v")).agg(count(lit(1)).as("f"))
          .groupBy(col("g"))
          .agg(sum(col("f")).as("n"),
            percentile(col("v"), lit(0.25), col("f")).as("p25"),
            percentile(col("v"), lit(0.5), col("f")).as("p50"),
            percentile(col("v"), lit(0.75), col("f")).as("p75"))
      else
        df.groupBy(col("g"))
          .agg(count(lit(1)).as("n"),
            percentile(col("v"), lit(0.25)).as("p25"),
            percentile(col("v"), lit(0.5)).as("p50"),
            percentile(col("v"), lit(0.75)).as("p75"))
    val plain = agg(freqForm = false).collect().map(key).toSet
    val freq = agg(freqForm = true).collect().map(key).toSet
    assert(freq == plain)
  }
}
