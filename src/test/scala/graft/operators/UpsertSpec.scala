package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UpsertSpec extends SparkSpec {
  import spark.implicits._

  private lazy val base = Seq(
    (1L, "a", 10), (2L, "b", 20), (3L, "c", 30)).toDF("k", "name", "v")

  test("delete / update / insert each apply; untouched rows pass through") {
    val changes = Seq(
      ("delete", 2L, "b", 20),
      ("update", 3L, "c2", 33),
      ("insert", 4L, "d", 40)).toDF("op", "k", "name", "v")
    val got = Upsert.applyChanges(base, changes, "k")
      .as[(Long, String, Int)].collect().toSet
    assert(got == Set((1L, "a", 10), (3L, "c2", 33), (4L, "d", 40)))
  }

  test("insert on an existing key upserts (MERGE matched+unmatched unify)") {
    val changes = Seq(("insert", 1L, "a9", 99)).toDF("op", "k", "name", "v")
    val got = Upsert.applyChanges(base, changes, "k")
      .as[(Long, String, Int)].collect().toSet
    assert(got == Set((1L, "a9", 99), (2L, "b", 20), (3L, "c", 30)))
  }

  test("latest-wins collapse by sequence; ties resolve deterministically") {
    val changes = Seq(
      ("update", 1L, "x", 1, 5L),
      ("update", 1L, "y", 2, 9L), // latest → wins
      ("delete", 2L, "b", 0, 3L),
      ("update", 2L, "z", 7, 3L)  // same seq: op desc → "update" > "delete"
    ).toDF("op", "k", "name", "v", "seq")
    val got = Upsert.applyChanges(base, changes, "k", seqCol = Some("seq"))
      .as[(Long, String, Int)].collect().toSet
    assert(got.contains((1L, "y", 2)))
    assert(got.contains((3L, "c", 30)))
    // tie at seq 3: op descending orders "update" before "delete", so
    // the update wins — assert the documented deterministic outcome
    assert(got.contains((2L, "z", 7)))
    assert(got.size == 3)
  }
}
