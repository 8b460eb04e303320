package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DataMixSpec extends SparkSpec {
  import spark.implicits._

  private lazy val rows = (1L to 2000L).map(i => (i, s"src${i % 4}", 10 + (i % 50)))
    .toDF("id", "source", "tokens")

  test("hashSample: deterministic, partition-invariant, ~fraction") {
    val a = DataMix.hashSample(rows, "id", 0.3).select($"id").as[Long].collect().toSet
    val b = DataMix.hashSample(rows.repartition(13), "id", 0.3)
      .select($"id").as[Long].collect().toSet
    assert(a == b)
    assert(math.abs(a.size / 2000.0 - 0.3) < 0.05)
  }

  test("trainTestSplit partitions completely and disjointly") {
    val s = DataMix.trainTestSplit(rows, "id", 0.25)
    assert(s.count() == 2000)
    val test = s.filter($"split" === "test").count()
    assert(math.abs(test / 2000.0 - 0.25) < 0.05)
    // membership is a pure function of id: resampling train never
    // leaks test ids
    val trainIds = s.filter($"split" === "train").select($"id").as[Long].collect().toSet
    val testIds = s.filter($"split" === "test").select($"id").as[Long].collect().toSet
    assert((trainIds & testIds).isEmpty)
  }

  test("mixtureSample keeps ~weight per source, drops unknown sources") {
    val w = Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.0)
    val m = DataMix.mixtureSample(rows, "id", "source", w)
      .groupBy($"source").count().as[(String, Long)].collect().toMap
    assert(m("src0") == 500) // weight 1.0 keeps everything
    assert(!m.contains("src2") && !m.contains("src3"))
    assert(math.abs(m("src1") / 500.0 - 0.5) < 0.1)
  }

  test("packByTokenBudget: packs are contiguous id ranges, docs start within budget") {
    val packed = DataMix.packByTokenBudget(rows, "id", "tokens", 500L)
      .orderBy($"id").as[(Long, String, Long, Long)].collect()
    // pack ids are non-decreasing in id order and start at 0
    assert(packed.head._4 == 0L)
    assert(packed.sliding(2).forall { case Array(a, b) => b._4 >= a._4; case _ => true })
    // each doc's pack = floor(tokens-before-it / budget)
    var cum = 0L
    packed.foreach { case (_, _, t, pid) =>
      assert(pid == cum / 500L); cum += t
    }
  }

  test("temperature flattening damps big sources toward the smallest") {
    val df = ((1L to 900L).map(i => (i, "big")) ++
      (901L to 1000L).map(i => (i, "small"))).toDF("id", "source")
    val kept = DataMix.temperatureFlatten(df, "id", "source")
      .groupBy($"source").count().as[(String, Long)].collect().toMap
    // small source: rate 1.0 → all kept; big: rate sqrt(100/900) = 1/3
    assert(kept("small") == 100)
    assert(math.abs(kept("big") - 300L) < 60, s"big kept ${kept("big")}")
    // deterministic under repartitioning
    val again = DataMix.temperatureFlatten(df.repartition(7), "id", "source")
      .select($"id").as[Long].collect().toSet
    val first = DataMix.temperatureFlatten(df, "id", "source")
      .select($"id").as[Long].collect().toSet
    assert(again == first)
  }

  test("stratified sample: exactly k per stratum, partition-invariant, capped by stratum size") {
    val df = (1L to 100L).map(i => (i, if (i <= 80) "big" else "small"))
      .toDF("id", "stratum")
    val s1 = DataMix.stratifiedSample(df, "id", "stratum", k = 10)
      .as[(Long, String)].collect().toSet
    val s2 = DataMix.stratifiedSample(df.repartition(7), "id", "stratum", k = 10)
      .as[(Long, String)].collect().toSet
    assert(s1 == s2) // membership is a pure function of the ids
    assert(s1.count(_._2 == "big") == 10)
    assert(s1.count(_._2 == "small") == 10)
    val tiny = DataMix.stratifiedSample(df.filter($"id" > 95), "id", "stratum", 10)
    assert(tiny.count() == 5) // stratum smaller than k → whole stratum
  }

  test("shuffleShards: a partition-invariant permutation of the corpus") {
    val df = (1L to 200L).toDF("id")
    val s1 = DataMix.shuffleShards(df, "id", nShards = 4)
      .select($"id", $"shard", $"pos").as[(Long, Int, Int)].collect().toSet
    val s2 = DataMix.shuffleShards(df.repartition(7), "id", nShards = 4)
      .select($"id", $"shard", $"pos").as[(Long, Int, Int)].collect().toSet
    assert(s1 == s2) // reproducible order regardless of input layout
    assert(s1.size == 200)
    // (shard, pos) is a dense, collision-free training order
    val byShard = s1.groupBy(_._2)
    assert(byShard.keySet.subsetOf((0 until 4).toSet))
    byShard.foreach { case (_, rows) =>
      assert(rows.map(_._3).toSeq.sorted == (1 to rows.size).toSeq)
    }
    // different seed → different permutation (not the identity relabel)
    val s3 = DataMix.shuffleShards(df, "id", nShards = 4, seed = 7L)
      .select($"id", $"shard", $"pos").as[(Long, Int, Int)].collect().toSet
    assert(s3 != s1)
  }

  test("domainQuota caps only oversized domains, at exactly ⌊cap·N⌋ rows") {
    // 100 "big" + 50 "mid" + 10 "small": cap 40% of 160 = 64
    val df = ((1L to 100L).map(i => (i, "big")) ++
      (101L to 150L).map(i => (i, "mid")) ++
      (151L to 160L).map(i => (i, "small"))).toDF("id", "domain")
    val kept = DataMix.domainQuota(df, "id", "domain", 2, 5)
      .as[(Long, String)].collect()
    val byDom = kept.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byDom == Map("big" -> 64, "mid" -> 50, "small" -> 10))
    assert(kept.map(_._1).distinct.length == kept.length)
  }

  test("domainQuota is deterministic and partition-invariant") {
    val df = (1L to 300L).map(i => (i, s"d${i % 3}")).toDF("id", "domain")
    val a = DataMix.domainQuota(df, "id", "domain", 1, 4)
      .as[(Long, String)].collect().toSet
    val b = DataMix.domainQuota(df.repartition(13), "id", "domain", 1, 4)
      .as[(Long, String)].collect().toSet
    assert(a == b)
    // every domain is at 100 > 75 = ⌊300/4⌋ → all capped to 75
    assert(a.groupBy(_._2).values.forall(_.size == 75))
  }

  test("groupAwareSplit: no group straddles; a row-hash split does") {
    // 40 groups x 25 rows of consecutive ids: sibling rows that a
    // row-level hash split will scatter across the boundary
    val df = (1L to 1000L).map(i => (i, s"g${i / 25}")).toDF("id", "grp")
    val byGroup = DataMix.groupAwareSplit(df, "grp", 0.25)
      .select($"grp", $"split").as[(String, String)].collect()
    val sides = byGroup.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    assert(sides.values.forall(_.size == 1)) // every group on ONE side
    assert(byGroup.map(_._2).toSet == Set("train", "test")) // both used
    val byRow = DataMix.trainTestSplit(df, "id", 0.25)
      .select($"grp", $"split").as[(String, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    assert(byRow.values.exists(_.size == 2)) // the leak this prevents
  }

  test("domainQuota refuses caps outside (0, 1]") {
    val df = Seq((1L, "a")).toDF("id", "domain")
    intercept[IllegalArgumentException] {
      DataMix.domainQuota(df, "id", "domain", 3, 2)
    }
  }
}
