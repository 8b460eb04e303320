package graft

import org.apache.spark.sql.functions._

/** Co-located joins via bucketing: both sides written bucketed on the
  * join key produce a sort-merge join with NO shuffle exchange — the
  * on-disk layout that makes repeated fact⋈fact joins at 100 TB pay
  * their shuffle once at write time instead of per query.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed-by-key tables join without a shuffle exchange") {
    val d = "/root/testdata/sf0.001"
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.lineitem(spark, d)
        .write.mode("overwrite")
        .bucketBy(4, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("li_bucketed")
      Tables.orders(spark, d)
        .withColumnRenamed("o_orderkey", "l_orderkey")
        .write.mode("overwrite")
        .bucketBy(4, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("ord_bucketed")
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"), "l_orderkey")
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      val rows = joined.collect()
      assert(rows.map(_.getLong(1)).sum == 6000L)
      val plan = joined.queryExecution.executedPlan.toString
      // the join itself must not introduce a shuffle on either side
      // (only the final aggregation exchanges)
      val joinSection = plan.substring(0, plan.length)
      val shufflesBeforeAgg = "Exchange hashpartitioning\\(l_orderkey".r
        .findAllIn(joinSection).length
      assert(shufflesBeforeAgg == 0, s"join shuffled:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }

  test("built-in HLL sketch lands within documented error of exact") {
    val d = "/root/testdata/sf0.01"
    val r = Tables.events(spark, d)
      .agg(approx_count_distinct(col("user_id"), 0.02).as("approx"),
        countDistinct(col("user_id")).as("exact"))
      .head()
    val (approx, exact) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(math.abs(approx - exact) / exact < 0.1,
      s"approx $approx vs exact $exact")
  }
}
