package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Prefix-filtered similarity join: exact equality with a brute-force
  * reference (the lossless claim), threshold boundary exactness, and
  * null/short-text conventions. */
class PrefixJoinSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force reference in plain Scala: 3-gram shingle sets, exact
    * integer threshold test. */
  private def ref(docs: Seq[(Long, String)], tNum: Long, tDen: Long)
      : Set[(Long, Long)] = {
    def sh(t: String): Set[String] = {
      val toks = t.trim.split("\\s+").toSeq
      if (toks.size >= 3) toks.sliding(3).map(_.mkString(" ")).toSet
      else Set(toks.mkString(" "))
    }
    val sets = docs.map { case (id, t) => id -> sh(t) }
    (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      common = (sa & sb).size.toLong
      if common * tDen >= tNum * (sa.size + sb.size - common)
    } yield (ia, ib)).toSet
  }

  private val docs: Seq[(Long, String)] = {
    val rnd = new scala.util.Random(7)
    val phrases = Vector("the quick brown fox jumps over the lazy dog",
      "pack my box with five dozen liquor jugs",
      "how vexingly quick daft zebras jump")
    (1L to 60L).map { i =>
      val base = phrases(rnd.nextInt(3))
      val mutated =
        if (i % 4 == 0) base // exact clusters
        else if (i % 4 == 1) base + s" tail$i" // near dups
        else if (i % 4 == 2) base.replace("quick", s"w$i") // medium
        else s"unique doc $i with words " + Seq.fill(6)(s"t${rnd.nextInt(99)}").mkString(" ")
      (i, mutated)
    }
  }

  test("equals the brute-force exact join (lossless prefix filter)") {
    val got = Dedup.prefixJaccardPairs(docs.toDF("doc_id", "text"),
        "doc_id", "text", n = 3, tNum = 3L, tDen = 5L)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val expected = ref(docs, 3L, 5L)
    assert(got === expected)
    assert(expected.nonEmpty) // the corpus genuinely exercises the join
  }

  test("pairs at exactly the threshold are kept (integer accept test)") {
    // A={x y z w} (2 shingles: "x y z","y z w"), B shares 1 of 2 and
    // has 1 more: J = 1/3 — exactly tNum/tDen = 1/3
    val d = Seq((1L, "x y z w"), (2L, "x y z q")).toDF("doc_id", "text")
    val got = Dedup.prefixJaccardPairs(d, "doc_id", "text", 3, 1L, 3L)
      .as[(Long, Long, Double)].collect()
    assert(got.map(r => (r._1, r._2)).toSet === Set((1L, 2L)))
  }

  test("null-text docs join nothing; whole-text shingle for short docs") {
    val d = Seq((1L, null.asInstanceOf[String]), (2L, null.asInstanceOf[String]),
      (3L, "ab"), (4L, "ab")).toDF("doc_id", "text")
    val got = Dedup.prefixJaccardPairs(d, "doc_id", "text", 3, 1L, 2L)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got === Set((3L, 4L))) // NULLs never pair; short texts pair whole
  }
}
