package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** JoinPrune pins beyond the q163 oracle: exact result equality with
  * the plain join (including at aggressive fpp, where false positives
  * must be join-discarded, and with null keys, which match nothing),
  * and the plan property that the bloom predicate sits below the
  * join. */
class JoinPruneSpec extends SparkSpec {

  private val dim = spark.range(2000)
    .select((col("id") * 7).as("k"), col("id").as("d"))
  private val fact = spark.range(50000)
    .select(pmod(xxhash64(col("id")), lit(20000L)).as("k"),
      col("id").as("f"))

  test("bloom-pruned join equals the plain join, even at fpp = 0.5") {
    val plain = fact.join(dim, Seq("k")).collect().toSet
    val pruned = JoinPrune.bloomFilteredJoin(fact, dim, "k").collect().toSet
    val sloppy = JoinPrune.bloomFilteredJoin(fact, dim, "k", fpp = 0.5)
      .collect().toSet
    assert(pruned == plain && sloppy == plain)
    assert(plain.nonEmpty)
  }

  test("null fact keys are pruned, matching join semantics exactly") {
    val withNulls = fact.withColumn("k",
      when(col("f") % 10 === 0, lit(null)).otherwise(col("k")))
    val plain = withNulls.join(dim, Seq("k")).collect().toSet
    val pruned = JoinPrune.bloomFilteredJoin(withNulls, dim, "k")
      .collect().toSet
    assert(pruned == plain)
  }

  test("the bloom predicate is a scan-side Filter below the join") {
    val plan = JoinPrune.bloomFilteredJoin(fact, dim, "k")
      .queryExecution.executedPlan.toString
    assert(plan.contains(graft.functions.BloomFunctions.mightContainName),
      s"bloom predicate missing from the plan:\n$plan")
    val joinPos = plan.indexOfSlice("Join")
    val bloomPos = plan.indexOf(graft.functions.BloomFunctions.mightContainName)
    assert(joinPos >= 0 && bloomPos > joinPos,
      "bloom filter must appear BELOW (after, in tree print order) the join")
  }
}
