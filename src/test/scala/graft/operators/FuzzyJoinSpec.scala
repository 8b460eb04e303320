package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Deletion-neighborhood fuzzy join: lossless vs the naive Levenshtein
  * scan across every edit kind, collision discharge, and the null
  * convention. */
class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  test("variants: the string plus each single deletion") {
    val got = Seq("abc").toDF("s")
      .select(FuzzyJoin.deletionVariants(col("s")).as("v"))
      .as[Seq[String]].head()
    assert(got.toSet === Set("abc", "bc", "ac", "ab"))
  }

  test("matches the naive scan for substitution, insertion, deletion, equality") {
    val ref = Seq((1L, "kitten"), (2L, "sitting"), (3L, "kitchen"),
      (4L, "mitten"), (5L, "kitte"), (6L, "kittens")).toDF("rid", "rname")
    val probe = Seq((10L, "kitten"),   // exact → 1; sub → mitten; del → kitte; ins → kittens
      (11L, "xyzzy"),                  // matches nothing
      (12L, "sittin")).toDF("pid", "pname") // deletion of sitting
    val got = FuzzyJoin.ed1Join(probe, ref, "pid", "pname", "rid", "rname")
      .select($"pid", $"rid").as[(Long, Long)].collect().toSet
    val naive = (for {
      (pid, p) <- Seq((10L, "kitten"), (11L, "xyzzy"), (12L, "sittin"))
      (rid, r) <- Seq((1L, "kitten"), (2L, "sitting"), (3L, "kitchen"),
        (4L, "mitten"), (5L, "kitte"), (6L, "kittens"))
      if levenshteinRef(p, r) <= 1
    } yield (pid, rid)).toSet
    assert(got === naive)
    assert(got === Set((10L, 1L), (10L, 4L), (10L, 5L), (10L, 6L),
      (12L, 2L)))
  }

  test("variant collisions at distance 2 are discharged by verification") {
    // "ab" vs "ba": share deletion variants "a" and "b" but distance 2
    val a = Seq((1L, "ab")).toDF("pid", "pname")
    val b = Seq((2L, "ba")).toDF("rid", "rname")
    assert(FuzzyJoin.ed1Join(a, b, "pid", "pname", "rid", "rname")
      .count() === 0)
  }

  test("anchor cap: lossless when buckets fit; loses only " +
      "both-past-cap pairs; dropped-slot count matches") {
    // a hot bucket by construction: many strings sharing variant "aa"
    // (all "aa"+suffix-free forms: "aaX"/"Xaa" collapse via deletions)
    val a = (1L to 12L).map(i => (i, "aa")).toDF("pid", "pname")
    val b = (101L to 112L).map(i => (i, "aab")).toDF("rid", "rname")
    val full = FuzzyJoin.ed1Join(a, b, "pid", "pname", "rid", "rname")
      .select($"pid", $"rid").as[(Long, Long)].collect().toSet
    assert(full.size === 144) // every pair is a genuine ed-1 match
    // cap ≥ bucket population on either side → identical result
    val capped12 = FuzzyJoin.ed1Join(a, b, "pid", "pname", "rid", "rname",
      maxBucket = 12).select($"pid", $"rid").as[(Long, Long)].collect().toSet
    assert(capped12 === full)
    assert(FuzzyJoin.ed1JoinDropped(
      a, b, "pid", "pname", "rid", "rname", maxBucket = 12) === 0L)
    // cap = 4: anchors (4 smallest ids per side) still pair with the
    // full other side; only non-anchor × non-anchor pairs are dropped
    val capped4 = FuzzyJoin.ed1Join(a, b, "pid", "pname", "rid", "rname",
      maxBucket = 4).select($"pid", $"rid").as[(Long, Long)].collect().toSet
    assert(capped4 === full.filter { case (p, r) => p <= 4L || r <= 104L })
    // dropped-slot surface: the one shared bucket ("aa": a-side selves ×
    // b-side deletions) drops max(0,12-4) * max(0,12-4) = 64 slots —
    // exactly the pairs lost here (single shared bucket, no recurrence)
    val dropped = FuzzyJoin.ed1JoinDropped(
      a, b, "pid", "pname", "rid", "rname", maxBucket = 4)
    assert(dropped === (full.size - capped4.size).toLong)
    assert(dropped === 64L)
  }

  test("null strings join nothing") {
    val a = Seq((1L, Option.empty[String]), (2L, Some("ok")))
      .toDF("pid", "pname")
    val b = Seq((3L, Option.empty[String]), (4L, Some("ok")))
      .toDF("rid", "rname")
    val got = FuzzyJoin.ed1Join(a, b, "pid", "pname", "rid", "rname")
      .select($"pid", $"rid").as[(Long, Long)].collect().toSet
    assert(got === Set((2L, 4L)))
  }

  /** Plain DP Levenshtein for the reference side of the spec. */
  private def levenshteinRef(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }
}
