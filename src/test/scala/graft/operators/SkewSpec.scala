package graft.operators

import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  private lazy val facts = Seq.tabulate(100)(i =>
    (if (i < 90) 1L else i.toLong, s"row$i")).toDF("k", "payload") // 90% hot key
  private lazy val dims = Seq((1L, "one"), (91L, "ninety-one"), (99L, "ninety-nine"))
    .toDF("k", "label")

  test("salted join result equals plain join, any salt width") {
    val plain = facts.join(dims, Seq("k")).select($"payload", $"label")
      .as[(String, String)].collect().toSet
    for (n <- Seq(1, 4, 16)) {
      val salted = Skew.saltedJoin(facts, dims, "k", n)
        .select($"payload", $"label").as[(String, String)].collect().toSet
      assert(salted == plain, s"n=$n")
    }
    assert(plain.size == 92)
  }

  test("adaptive salted join equals plain join at every hotness threshold") {
    val plain = facts.join(dims, Seq("k")).select($"payload", $"label")
      .as[(String, String)].collect().toSet
    for (threshold <- Seq(0L, 10L, 1000L)) { // all hot / only the 90% key / none
      val adaptive = Skew.adaptiveSaltedJoin(facts, dims, "k", 4, threshold)
        .select($"payload", $"label").as[(String, String)].collect().toSet
      assert(adaptive == plain, s"threshold=$threshold")
    }
  }

  test("adaptive salting: hot-key rows are spread yet never duplicated") {
    // threshold 10 → only key 1 (90 fact rows) is hot
    val hot = facts.groupBy($"k").count().filter($"count" > 10)
      .select($"k").as[Long].collect().toSet
    assert(hot == Set(1L))
    // join cardinality must equal the plain join's (the 4×-replicated
    // hot dim row matches each fact row on exactly one salt)
    assert(Skew.adaptiveSaltedJoin(facts, dims, "k", 4, 10L).count() == 92)
  }

  test("left joins preserve unmatched facts") {
    val salted = Skew.saltedJoin(facts, dims, "k", 4, "left")
    assert(salted.count() == 100)
    assert(salted.filter($"label".isNull).count() == 8) // keys 90..98 minus 91
  }
}
