package graft

import org.apache.spark.sql.functions._

/** Join-strategy hints: the escape hatch when statistics mislead the
  * planner at scale (a "small" side that isn't, a broadcast-able side
  * the estimator overestimates). Each hint must flip the physical
  * operator without changing results. */
class JoinStrategySpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"
  private lazy val lineitem = Tables.lineitem(spark, d)
  private lazy val orders = Tables.orders(spark, d)
    .select($"o_orderkey", $"o_orderpriority")

  private def physical(hint: String): String =
    lineitem.join(orders.hint(hint), $"l_orderkey" === $"o_orderkey")
      .queryExecution.executedPlan.toString

  test("broadcast / merge / shuffle_hash hints pick their operators") {
    assert(physical("broadcast").contains("BroadcastHashJoin"))
    assert(physical("merge").contains("SortMergeJoin"))
    assert(physical("shuffle_hash").contains("ShuffledHashJoin"))
  }

  test("all three strategies agree on the result") {
    def agg(hint: String): Map[String, Long] =
      lineitem.join(orders.hint(hint), $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderpriority").count()
        .as[(String, Long)].collect().toMap
    val b = agg("broadcast")
    assert(agg("merge") == b && agg("shuffle_hash") == b)
    assert(b.values.sum == lineitem.count())
  }
}
