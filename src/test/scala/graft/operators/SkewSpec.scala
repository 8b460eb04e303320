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

  test("left joins preserve unmatched facts") {
    val salted = Skew.saltedJoin(facts, dims, "k", 4, "left")
    assert(salted.count() == 100)
    assert(salted.filter($"label".isNull).count() == 8) // keys 90..98 minus 91
  }
}
