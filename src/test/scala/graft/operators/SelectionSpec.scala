package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Selection]] — DSIR-style importance weighting/resampling pins:
  * the exact-neutrality identity (target ≡ raw → every score is
  * EXACTLY 1e6 ppm), hand-checked weight arithmetic on synthetic
  * bucket counts (smoothing, floor-div, the 1e12 cap, the ≥1 guard),
  * target-likeness ordering, length invariance, partitioning
  * invariance, and the broadcast shape of the scoring join. */
class SelectionSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("target == raw: every document scores exactly 1e6 ppm") {
    val docs = corpus(
      1L -> "the quick brown fox", 2L -> "jumps over the lazy dog",
      3L -> "pack my box with five dozen jugs", 4L -> "sphinx of black quartz")
    val scored = Selection.importanceScores(docs, docs, "doc_id", "text",
      buckets = 64, portable = true)
    val scores = scored.select("score_ppm").as[Long].collect().toSeq
    assert(scores.nonEmpty && scores.forall(_ == 1000000L),
      s"neutral corpus must score exactly 1e6: $scores")
  }

  test("importanceWeights: smoothing, cap, and zero-bucket guard on synthetic counts") {
    // B = 4; target mass all in bucket 0, raw mass all in bucket 1.
    val tgt = Seq((0L, 96L)).toDF("bucket", "cnt")
    val raw = Seq((1L, 96L)).toDF("bucket", "cnt")
    val w = Selection.importanceWeights(tgt, raw, buckets = 4)
      .orderBy("bucket").as[(Long, Long)].collect().toMap
    // t_tot = 96, r_tot = 96, T+B = R+B = 100.
    // bucket 0: pt_ppb = 97*1e9 div 100 = 970_000_000; pr_ppb = 1e9 div 100
    //   = 10_000_000 -> w = 970e6*1e6 div 10e6 = 97_000_000.
    assert(w(0L) == 97000000L)
    // bucket 1: pt_ppb = 10_000_000, pr_ppb = 970_000_000 -> 10_309.
    assert(w(1L) == 10309L)
    // buckets 2,3: both empty -> 1e7*1e6 div 1e7 = exactly 1e6.
    assert(w(2L) == 1000000L && w(3L) == 1000000L)
    // Cap: raw so large an absent bucket's pr_ppb floors to its
    // minimum -> ratio would exceed 1e6x; the guard + cap bound it.
    val bigRaw = Seq((1L, 4000000000L)).toDF("bucket", "cnt")
    val w2 = Selection.importanceWeights(tgt, bigRaw, buckets = 4)
      .orderBy("bucket").as[(Long, Long)].collect().toMap
    // bucket 0: pr_ppb = 1e9 div 4000000004 = 0 -> guarded to 1;
    //   pt_ppb*1e6 = 9.7e14 < cap -> 970_000_000_000_000? No: capped.
    assert(w2(0L) == Selection.WeightCapPpm,
      s"cap must bound the zero-raw bucket: ${w2(0L)}")
  }

  test("target-likeness orders scores; length does not") {
    val enish = (1L to 6L).map(i => i -> "the cat sat on the mat")
    val alien = (7L to 12L).map(i => i -> "zx qv wk jn px fz")
    val docs = corpus((enish ++ alien): _*)
    val target = corpus(100L -> "the cat sat on the mat and the cat ran")
    val scored = Selection.importanceScores(docs, target, "doc_id", "text",
      buckets = 64, portable = true)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert((1L to 6L).map(scored).min > (7L to 12L).map(scored).max,
      s"target-like docs must outscore alien docs: $scored")
    // Length invariance: same content repeated -> identical score.
    val docs2 = corpus(1L -> "x x x", 2L -> "x x x x x x x x x")
    val t2 = corpus(9L -> "x x y")
    val s2 = Selection.importanceScores(docs2, t2, "doc_id", "text",
      buckets = 64, portable = true)
      .as[(Long, Long, Long)].collect()
    assert(s2.map(_._3).distinct.length == 1,
      s"pure repetition must not move the per-ngram score: ${s2.toSeq}")
    assert(s2.map(r => r._1 -> r._2).toMap == Map(1L -> 2L, 2L -> 8L))
  }

  test("scores are partitioning-invariant and docs under 2 tokens drop") {
    val docs = corpus(1L -> "alpha beta gamma", 2L -> "solo",
      3L -> "beta gamma delta epsilon", 4L -> "  ")
    val target = corpus(9L -> "beta gamma")
    def run(df: org.apache.spark.sql.DataFrame) =
      Selection.importanceScores(df, target, "doc_id", "text",
        buckets = 32, portable = true)
        .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val base = run(docs)
    assert(base.map(_._1) == Seq(1L, 3L), s"short docs must drop: $base")
    assert(run(docs.repartition(7, col("text"))) == base)
    assert(run(docs.coalesce(1)) == base)
  }

  test("resample: systematic PPS membership + broadcast scoring join") {
    val docs = corpus((1L to 40L).map(i =>
      i -> (if (i % 2 == 0) "the cat sat" else "qq zz vv")): _*)
    val target = corpus(99L -> "the cat sat on the mat")
    val scored = Selection.importanceScores(docs, target, "doc_id", "text",
      buckets = 64, portable = true)
    // fast-mode hash must also work (100 TB path) and keep the shape
    Selection.importanceScores(docs, target, "doc_id", "text",
      buckets = 64, portable = false).count()
    val plan = scored.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"weight table must broadcast into the scoring join:\n$plan")
    val total = scored.agg(sum("score_ppm")).as[Long].head()
    val step = total / 10
    val picks = Selection.importanceResample(scored, "doc_id", step)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(picks.size >= 9 && picks.size <= 11, s"~10 expected: $picks")
    // replay the crossing rule off the scores themselves
    val byId = scored.as[(Long, Long, Long)].collect().sortBy(_._1)
    val expect = byId.scanLeft((0L, 0L, 0L, 0L)) { case ((_, _, _, cum), r) =>
      (r._1, r._2, r._3, cum + r._3) }.tail
      .filter(r => (r._4 / step) > ((r._4 - r._3) / step))
      .map(r => (r._1, r._2, r._3, r._4)).toSeq
    assert(picks.sortBy(_._1) == expect)
  }

  test("A-ES weighted sample: exact k, no dupes, weight-proportional") {
    val pool = spark.range(20000).select(col("id").as("doc_id"),
      when(pmod(col("id"), lit(2)) === 0, 9L).otherwise(1L).as("wt"))
    val got = Selection.weightedSampleK(pool, "doc_id", col("wt"),
      k = 200, seed = 42L).collect()
    assert(got.length == 200)
    assert(got.map(_.getLong(0)).distinct.length == 200, "no duplicates")
    // 10k docs at w=9 vs 10k at w=1: heavy class expected ~90% of picks
    val heavy = got.count(_.getLong(1) == 9L)
    assert(heavy >= 160 && heavy <= 199,
      s"heavy-weight class got $heavy/200, expected ≈180")
  }

  test("A-ES sample is deterministic under partitioning, varies by seed") {
    val pool = spark.range(5000).select(col("id").as("doc_id"),
      (pmod(col("id"), lit(7)) + 1).as("wt"))
    val a = Selection.weightedSampleK(pool, "doc_id", col("wt"), 50, 42L)
      .collect().map(_.getLong(0)).toSeq
    val b = Selection.weightedSampleK(pool.repartition(17, col("doc_id")),
      "doc_id", col("wt"), 50, 42L).collect().map(_.getLong(0)).toSeq
    assert(a == b, "same seed + same pool must pick the same sample")
    val c = Selection.weightedSampleK(pool, "doc_id", col("wt"), 50, 43L)
      .collect().map(_.getLong(0)).toSeq
    assert(a != c, "a different seed must (overwhelmingly) differ")
  }

  test("A-ES selection plans as TakeOrderedAndProject — no global sort") {
    val pool = spark.range(10000).select(col("id").as("doc_id"),
      lit(5L).as("wt"))
    val plan = Selection.weightedSampleK(pool, "doc_id", col("wt"), 10, 1L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must not be a full sort:\n$plan")
  }
}
