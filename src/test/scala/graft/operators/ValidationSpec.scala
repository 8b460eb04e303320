package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ValidationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val t = Seq(
    (1L, Some(10.0), Some("b")),
    (2L, Some(2.5), Some("a")),
    (3L, None, Some("a")),
    (4L, Some(10.0), None)
  ).toDF("id", "price", "tag")

  test("profile: one row per column with exact stats over one fixture scan") {
    val got = Validation.profile(t, Seq(
        Validation.ProfileCol("id"),
        Validation.ProfileCol("price",
          c => round(c * 100, 0).cast("long")),
        Validation.ProfileCol("tag")))
      .as[(String, Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.keySet == Set("id", "price", "tag"))
    assert(got("id") == (("id", 4L, 0L, 4L, "1", "4")))
    assert(got("price") == (("price", 4L, 1L, 2L, "250", "1000")))
    assert(got("tag") == (("tag", 4L, 1L, 2L, "a", "b")))
  }

  test("profile formats AFTER the typed min/max (never lexicographic)") {
    // lexicographic min of formatted strings would be "10" (< "9"); the
    // typed min is 9 — the formatter must apply to the typed aggregate
    val d = Seq(9L, 10L, 100L).toDF("v")
    val got = Validation.profile(d, Seq(Validation.ProfileCol("v")))
      .as[(String, Long, Long, Long, String, String)].head()
    assert(got._5 == "9" && got._6 == "100")
  }

  test("profile plans hash aggregates per branch — no Expand, no sort-agg") {
    // the multi-distinct single-aggregate form costs an Expand (k+1
    // rows per input row) + SortAggregate chain; the per-column branch
    // form must plan each distinct as a plain two-phase hash aggregate
    val df = Validation.profile(t, Seq(
      Validation.ProfileCol("id"),
      Validation.ProfileCol("price"),
      Validation.ProfileCol("tag")))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), plan)
    // numeric branches hash-aggregate; string min/max buffers are
    // immutable so that branch may legally fall to SortAggregate (its
    // sort is over map-side-grouped distinct values, not raw rows)
    assert(plan.contains("HashAggregate"), plan)
  }
}
