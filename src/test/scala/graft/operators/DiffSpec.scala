package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Snapshot-diff classification: all four statuses, null-safe field
  * comparison (NULL→value is `changed`, NULL→NULL is `unchanged`),
  * schema guard, and the summary checksum. */
class DiffSpec extends SparkSpec {
  import spark.implicits._

  private val oldDf = Seq[(Long, Option[String], Option[Long])](
    (1L, Some("a"), Some(10L)),   // unchanged
    (2L, Some("b"), Some(20L)),   // changed (value)
    (3L, None, Some(30L)),        // changed (NULL → value)
    (4L, None, None),             // unchanged (NULL == NULL, null-safely)
    (5L, Some("e"), Some(50L)))   // removed
    .toDF("k", "s", "v")
  private val newDf = Seq[(Long, Option[String], Option[Long])](
    (1L, Some("a"), Some(10L)),
    (2L, Some("b"), Some(21L)),
    (3L, Some("c"), Some(30L)),
    (4L, None, None),
    (6L, Some("f"), Some(60L)))   // added
    .toDF("k", "s", "v")

  test("statuses classify added/removed/changed/unchanged, null-safely") {
    val m = Diff.snapshotDiff(oldDf, newDf, Seq("k"))
      .as[(Long, String)].collect().toMap
    assert(m === Map(1L -> "unchanged", 2L -> "changed", 3L -> "changed",
      4L -> "unchanged", 5L -> "removed", 6L -> "added"))
  }

  test("summary: per-status counts + exact key checksum") {
    val m = Diff.diffSummary(oldDf, newDf, "k")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(m("added") === ((1L, 6L)))
    assert(m("removed") === ((1L, 5L)))
    assert(m("changed") === ((2L, 5L)))
    assert(m("unchanged") === ((2L, 5L)))
  }

  test("column order does not matter, extra/missing columns do") {
    val reordered = newDf.select(col("v"), col("k"), col("s"))
    val m = Diff.snapshotDiff(oldDf, reordered, Seq("k"))
      .filter(col("status") === "changed").count()
    assert(m === 2L)
    intercept[IllegalArgumentException] {
      Diff.snapshotDiff(oldDf, newDf.drop("v"), Seq("k"))
    }
  }

  test("multi-column keys") {
    val o = Seq((1L, "x", 10L), (1L, "y", 11L)).toDF("k1", "k2", "v")
    val n = Seq((1L, "x", 10L), (1L, "z", 12L)).toDF("k1", "k2", "v")
    val m = Diff.snapshotDiff(o, n, Seq("k1", "k2"))
      .as[(Long, String, String)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(m === Map((1L, "x") -> "unchanged", (1L, "y") -> "removed",
      (1L, "z") -> "added"))
  }
}
