package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: the maintain ≡ recompute
  * contract on randomized feeds, group birth/death, and cross-group
  * updates. */
class IvmSpec extends SparkSpec {
  import spark.implicits._

  private def agg(df: DataFrame): DataFrame =
    df.groupBy(col("g")).agg(count(lit(1)).as("n"), sum(col("sv")).as("sv"))

  private def asSet(df: DataFrame): Set[(String, Long, Long)] =
    df.as[(String, Long, Long)].collect().toSet

  private def maintain(base: DataFrame, changes: DataFrame): DataFrame =
    Ivm.maintainSumCountAgg(agg(base), base, changes,
      "k", "op", "g", "n", Seq("sv"))

  test("maintain ≡ recompute on a mixed feed") {
    val base = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L),
      (4L, "c", 40L)).toDF("k", "g", "sv")
    val changes = Seq(
      ("delete", 1L, "a", 0L),     // measures of deletes are ignored
      ("update", 3L, "b", 35L),    // in-group value change
      ("insert", 9L, "d", 90L))    // new group born
      .toDF("op", "k", "g", "sv")
    val expected = asSet(agg(Upsert.applyChanges(base, changes, "k", "op")))
    assert(asSet(maintain(base, changes)) === expected)
    assert(expected.exists(_._1 == "d"))
  }

  test("a group whose last row is deleted disappears") {
    val base = Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("k", "g", "sv")
    val changes = Seq(("delete", 2L, "b", 0L)).toDF("op", "k", "g", "sv")
    assert(asSet(maintain(base, changes)) === Set(("a", 1L, 10L)))
  }

  test("an update that moves a row across groups adjusts both") {
    val base = Seq((1L, "a", 10L), (2L, "a", 20L)).toDF("k", "g", "sv")
    val changes = Seq(("update", 2L, "b", 25L)).toDF("op", "k", "g", "sv")
    assert(asSet(maintain(base, changes)) ===
      Set(("a", 1L, 10L), ("b", 1L, 25L)))
  }

  test("randomized feeds: maintain ≡ recompute") {
    val rnd = new scala.util.Random(23)
    val base = (1L to 500L).map(k =>
      (k, s"g${rnd.nextInt(12)}", rnd.nextInt(1000).toLong))
      .toDF("k", "g", "sv")
    val ops = (1L to 500L).flatMap { k =>
      rnd.nextInt(5) match {
        case 0 => Some(("delete", k, "", 0L))
        case 1 => Some(("update", k, s"g${rnd.nextInt(12)}",
          rnd.nextInt(1000).toLong))
        case 2 if k % 3 == 0 => Some(("insert", k + 10000L,
          s"g${rnd.nextInt(12)}", rnd.nextInt(1000).toLong))
        case _ => None
      }
    }.toDF("op", "k", "g", "sv")
    val expected = asSet(agg(Upsert.applyChanges(base, ops, "k", "op")))
    assert(asSet(maintain(base, ops)) === expected)
  }
}
