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

  test("SCD2 apply closes current versions and opens new ones; history untouched") {
    val scd = Seq(
      (1L, "a0", 1, 0L, Some(5L)), // closed history
      (1L, "a1", 2, 5L, None),     // current
      (2L, "b0", 3, 0L, None),
      (3L, "c0", 4, 0L, None)
    ).toDF("k", "name", "v", "valid_from", "valid_to")
    val changes = Seq(
      ("update", 1L, "a2", 9, 7L),
      ("delete", 2L, "", 0, 7L)).toDF("op", "k", "name", "v", "ts")
    val got = Upsert.applyChangesScd2(scd, changes, "k")
      .as[(Long, String, Int, Long, Option[Long])].collect().toSet
    assert(got == Set(
      (1L, "a0", 1, 0L, Some(5L)),  // history kept
      (1L, "a1", 2, 5L, Some(7L)),  // closed at change ts
      (1L, "a2", 9, 7L, None),      // new current version
      (2L, "b0", 3, 0L, Some(7L)),  // delete closes, opens nothing
      (3L, "c0", 4, 0L, None)))     // untouched
  }

  test("merge: every clause family fires; defaults match SQL MERGE") {
    import Upsert.MergeClause._
    val b = Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30),
      (4L, "d", 40)).toDF("k", "name", "v")
    val s = Seq((1L, "A", 11), (2L, "B", 21), (9L, "i", 90),
      (10L, "j", 5)).toDF("k", "name", "v")
    val got = Upsert.merge(b, s, "k",
      whenMatched = Seq(update("t.v < 15"), delete()),
      whenNotMatched = Seq(insert("s.v >= 50")),
      whenNotMatchedBySource = Seq(delete("t.v >= 40")))
      .as[(Long, String, Int)].collect().toSet
    assert(got == Set(
      (1L, "A", 11),  // matched, t.v < 15 -> updated from source
      // 2 matched, second clause (unconditional delete) -> gone
      (3L, "c", 30),  // not matched by source, cond false -> kept
      // 4 not matched by source, t.v >= 40 -> deleted
      (9L, "i", 90)   // not matched, s.v >= 50 -> inserted; 10 skipped
    ))
  }

  test("merge: clause order is first-match-wins") {
    import Upsert.MergeClause._
    val b = Seq((1L, "a", 10)).toDF("k", "name", "v")
    val s = Seq((1L, "A", 99)).toDF("k", "name", "v")
    // delete-first ordering deletes even though update also matches
    val d = Upsert.merge(b, s, "k",
      whenMatched = Seq(delete("s.v > 50"), update()))
    assert(d.count() == 0)
    val u = Upsert.merge(b, s, "k",
      whenMatched = Seq(update(), delete("s.v > 50")))
      .as[(Long, String, Int)].collect().toSet
    assert(u == Set((1L, "A", 99)))
  }

  test("merge: null-key rows route by PRESENCE, not key nullness") {
    import Upsert.MergeClause._
    // a base row with a NULL merge key never equi-joins; it must land in
    // the NOT MATCHED BY SOURCE family (kept by default, like SQL MERGE)
    // — not be silently dropped as a failed insert
    val b = Seq((Some(1L), "a", 10), (None, "nk", 77))
      .toDF("k", "name", "v")
    val s = Seq((Some(1L), "A", 11), (None, "snk", 55))
      .toDF("k", "name", "v")
    val kept = Upsert.merge(b, s, "k",
      whenMatched = Seq(update()),
      whenNotMatched = Seq(insert()))
      .as[(Option[Long], String, Int)].collect().toSet
    // null-key base row KEPT (by-source default); null-key source row is
    // NOT MATCHED -> inserted with its null key
    assert(kept == Set(
      (Some(1L), "A", 11), (None, "nk", 77), (None, "snk", 55)))
    // and the by-source family can SEE the null-key base row
    val swept = Upsert.merge(b, s, "k",
      whenNotMatchedBySource = Seq(delete("t.v > 50")))
      .as[(Option[Long], String, Int)].collect().toSet
    assert(swept == Set((Some(1L), "a", 10)))
  }

  test("merge: per-column SET updates touch only listed columns") {
    import Upsert.MergeClause._
    val b = Seq((1L, "a", 10), (2L, "b", 20)).toDF("k", "name", "v")
    val s = Seq((1L, "A", 100), (2L, "B", 200)).toDF("k", "name", "v")
    // SET v = t.v + s.v leaves name at the TARGET value
    val got = Upsert.merge(b, s, "k",
      whenMatched = Seq(update(set = Map("v" -> "t.v + s.v"))))
      .as[(Long, String, Int)].collect().toSet
    assert(got == Set((1L, "a", 110), (2L, "b", 220)))
  }

  test("merge: explicit SET/VALUES lists work with a source schema " +
      "that differs from the base") {
    import Upsert.MergeClause._
    val b = Seq((1L, "a", 10), (2L, "b", 20)).toDF("k", "name", "v")
    // source carries only the key and a delta column — no base payload
    val s = Seq((1L, 5), (9L, 90)).toDF("k", "dv")
    val got = Upsert.merge(b, s, "k",
      whenMatched = Seq(update(set = Map("v" -> "t.v + s.dv"))),
      whenNotMatched = Seq(insert(set =
        Map("k" -> "s.k", "v" -> "s.dv"))))
      .as[(Long, Option[String], Int)].collect().toSet
    // matched: v bumped, name kept; inserted: unlisted name is NULL
    assert(got == Set(
      (1L, Some("a"), 15), (2L, Some("b"), 20), (9L, None, 90)))
    // a STAR clause still demands the full base schema on the source
    intercept[IllegalArgumentException] {
      Upsert.merge(b, s, "k", whenMatched = Seq(update()))
    }
    // SET lists naming a non-base column refuse
    intercept[IllegalArgumentException] {
      Upsert.merge(b, s, "k",
        whenMatched = Seq(update(set = Map("nope" -> "s.dv"))))
    }
  }

  test("merge: no clauses is the identity; wrong action families refuse") {
    import Upsert.MergeClause._
    val s = Seq((1L, "A", 99)).toDF("k", "name", "v")
    val got = Upsert.merge(base, s, "k")
      .as[(Long, String, Int)].collect().toSet
    assert(got == base.as[(Long, String, Int)].collect().toSet)
    intercept[IllegalArgumentException] {
      Upsert.merge(base, s, "k", whenMatched = Seq(insert()))
    }
    intercept[IllegalArgumentException] {
      Upsert.merge(base, s, "k", whenNotMatched = Seq(update()))
    }
    intercept[IllegalArgumentException] {
      Upsert.merge(base, s, "k", whenNotMatchedBySource = Seq(update()))
    }
  }
}
