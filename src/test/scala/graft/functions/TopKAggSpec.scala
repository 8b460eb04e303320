package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** TopKRows pins beyond the q158 oracle: equivalence with the window
  * form on adversarial data, tie order, short groups, partitioning
  * invariance, and the partial-aggregation plan shape that is the
  * operator's reason to exist. */
class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  private def pool(n: Long) = spark.range(n).select(
    pmod(col("id"), lit(37)).as("g"),
    col("id").as("rid"),
    // heavy ties: only 11 distinct values per group
    pmod(xxhash64(col("id")), lit(11)).as("v"))

  private def viaAgg(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy(col("g"))
      .agg(TopKAgg.topK(col("rid"), col("v"), k).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), (col("pos") + 1).as("rank"),
        col("col._2").as("rid"), col("col._1").as("v"))

  private def viaWindow(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("v").desc, col("rid"))
    df.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("g"), col("rank").cast("int"), col("rid"), col("v"))
  }

  test("aggregator selects exactly what the window sort selects") {
    val df = pool(50000)
    val a = viaAgg(df, 7).collect().toSet
    val b = viaWindow(df, 7).collect().toSet
    assert(a == b)
  }

  test("ties break on smaller id; groups shorter than k return whole") {
    val df = Seq((1L, 10L, 5L), (1L, 3L, 5L), (1L, 7L, 5L),
      (2L, 99L, 1L)).toDF("g", "rid", "v")
    val got = viaAgg(df, 2).as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 1L, 3L, 5L), (1L, 2L, 7L, 5L),
      (2L, 1L, 99L, 1L)))
  }

  test("invariant under partitioning (merge path exercised)") {
    val df = pool(30000)
    val a = viaAgg(df, 5).collect().toSet
    val b = viaAgg(df.repartition(23, col("rid")), 5).collect().toSet
    assert(a == b)
  }

  test("plans with partial aggregation: shuffle carries <= groups*k") {
    val plan = pool(100000).groupBy(col("g"))
      .agg(TopKAgg.topK(col("rid"), col("v"), 5).as("top"))
      .queryExecution.executedPlan.toString
    // typed Aggregator → ObjectHashAggregate in partial + final twice
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2,
      s"expected partial+final ObjectHashAggregate stages:\n$plan")
    assert(plan.contains("partial_"), s"no map-side partial stage:\n$plan")
  }
}
