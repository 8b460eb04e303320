package graft

import org.apache.spark.sql.functions._

/** AQE runtime skew handling — the first line of defense the Skew
  * operators' docs defer to: a shuffle join whose largest key dwarfs
  * the rest gets its oversized partition split at runtime (final
  * adaptive plan marks the join `skew=true`), with results unchanged.
  * Thresholds are lowered to make a local-scale partition register as
  * skewed; on a real cluster the defaults (256MB advisory, 5× median)
  * do this unprompted.
  */
class AqeSkewSpec extends SparkSpec {
  import spark.implicits._

  private def withConfs(confs: (String, String)*)(body: => Unit): Unit = {
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { confs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits a skewed join partition at runtime (skew=true in final plan)") {
    withConfs(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      // 100k facts, 95% on one key; dim covers all keys
      val facts = spark.range(0, 100000).select(
        when(pmod($"id", lit(20)) < 19, lit(7L)).otherwise($"id").as("k"),
        concat(lit("payload-"), $"id").as("payload"))
      val dims = spark.range(0, 100000).select($"id".as("k"),
        concat(lit("dim-"), $"id").as("label"))
      val joined = facts.join(dims, "k")
      // collect() runs THIS dataset's queryExecution (count() would
      // build a separate aggregate plan and leave this one unfinalized)
      assert(joined.collect().length == 100000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"), finalPlan.take(2000))
    }
  }
}
