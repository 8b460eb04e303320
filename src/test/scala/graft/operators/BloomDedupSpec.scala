package graft.operators

import graft.SparkSpec
import graft.functions.BloomFunctions
import org.apache.spark.sql.functions._

class BloomDedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val batch = Seq(
    (1L, "a"), (2L, "b"), (3L, "c"),
    (4L, null.asInstanceOf[String]), // null key: matches nothing, must survive
    (5L, "b")                        // same key twice in the batch
  ).toDF("id", "fp")

  private lazy val index = Seq(
    (10L, "b"), (11L, "x"),
    (12L, null.asInstanceOf[String]), // null index key: joins nothing
    (13L, "y")
  ).toDF("id", "fp")

  private def expected: Seq[Long] =
    batch.join(index.select("fp"), Seq("fp"), "left_anti")
      .select("id").as[Long].collect().sorted.toSeq

  test("bloomPrunedAntiJoin equals the plain anti-join") {
    val got = Dedup.bloomPrunedAntiJoin(batch, index, "fp")
      .select("id").as[Long].collect().sorted.toSeq
    assert(got == expected)
    assert(got == Seq(1L, 3L, 4L))
  }

  test("still exact when the bloom is saturated (high fpp)") {
    // a near-useless filter prunes almost nothing — the anti-join must
    // still discharge every false positive
    val got = Dedup.bloomPrunedAntiJoin(batch, index, "fp", fpp = 0.9)
      .select("id").as[Long].collect().sorted.toSeq
    assert(got == expected)
  }

  test("mightContainHashed has no false negatives (codegen path)") {
    BloomFunctions.register(spark)
    val bytes = BloomFunctions.buildHashedBloom(batch, "fp", 5, 0.01)
    val hits = batch.filter(col("fp").isNotNull)
      .withColumn("m", BloomFunctions.mightContainHashed(bytes, col("fp")))
      .select("m").as[Boolean].collect()
    assert(hits.forall(identity), "an inserted key tested negative")
  }

  test("expression interpreted eval matches codegen") {
    BloomFunctions.register(spark)
    val bytes = BloomFunctions.buildHashedBloom(batch, "fp", 5, 0.01)
    val keys = (batch.select("fp") union index.select("fp"))
      .filter(col("fp").isNotNull).distinct()
    val viaPlan = keys
      .withColumn("m", BloomFunctions.mightContainHashed(bytes, col("fp")))
      .as[(String, Boolean)].collect().toMap
    val bf = org.apache.spark.util.sketch.BloomFilter.readFrom(bytes)
    val viaDirect = viaPlan.keySet.map { k =>
      val h = keys.sparkSession.range(1)
        .select(xxhash64(lit(k))).as[Long].head()
      k -> bf.mightContainLong(h)
    }.toMap
    assert(viaPlan == viaDirect)
  }

  test("prune keeps every index row that could match a batch key") {
    // structural guarantee behind exactness: no-false-negative prune
    BloomFunctions.register(spark)
    val bytes = BloomFunctions.buildHashedBloom(batch, "fp", 5, 0.01)
    val kept = index
      .filter(BloomFunctions.mightContainHashed(bytes, col("fp")))
      .select("fp").as[String].collect().toSet
    val batchKeys = batch.filter(col("fp").isNotNull)
      .select("fp").as[String].collect().toSet
    val mustKeep = index.filter(col("fp").isNotNull)
      .select("fp").as[String].collect().toSet.intersect(batchKeys)
    assert(mustKeep.subsetOf(kept))
  }
}
