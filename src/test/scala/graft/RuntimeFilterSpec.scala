package graft

import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning: for a shuffle join whose build
  * side is selectively filtered, Catalyst can inject a bloom filter of
  * the build-side keys into the probe side's scan — rows that cannot
  * match die before the shuffle, the 100 TB version of "don't move
  * what you'll drop". Off by default thresholds assume cluster-sized
  * tables; this spec lowers them to pin the mechanism (the probe side
  * gains a `might_contain(bloom_filter_agg(build keys))` filter) and
  * that results are unchanged.
  */
class RuntimeFilterSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  private def withConfs(confs: (String, String)*)(body: => Unit): Unit = {
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { confs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("selective shuffle join injects a bloom filter into the probe scan") {
    withConfs(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val orders = Tables.orders(spark, d)
        .filter($"o_orderpriority" === "1-URGENT")
        .select($"o_orderkey", $"o_orderpriority")
      val joined = Tables.lineitem(spark, d)
        .join(orders, $"l_orderkey" === $"o_orderkey")
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain") &&
        plan.contains("bloom_filter_agg"), plan)

      // and the filter is purely an optimization — results are exact
      val expected = Tables.lineitem(spark, d).as("l")
        .join(Tables.orders(spark, d)
          .filter($"o_orderpriority" === "1-URGENT").as("o"),
          $"l.l_orderkey" === $"o.o_orderkey").count()
      assert(joined.count() == expected)
    }
  }
}
