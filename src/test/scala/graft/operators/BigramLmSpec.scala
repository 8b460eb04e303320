package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Fixed-point bigram-LM pins beyond the q154/q155 oracles: the
  * ilog2 approximation bound and monotonicity (what makes nll ≥ 0),
  * partitioning invariance, the smoothing floor for fully-unseen
  * text, and the fluent-vs-gibberish ordering the filter exists for. */
class BigramLmSpec extends SparkSpec {
  import spark.implicits._

  test("ilog2Milli is within 6 milli-bits of true log2 and monotone") {
    val ns = (1L to 1000L) ++ Seq(1L << 20, (1L << 20) + 7, 1L << 40,
      (1L << 52) - 1, 255L, 256L, 257L, 511L, 512L, 513L) ++
      (1 to 500).map(i => math.abs(scala.util.hashing.MurmurHash3
        .stringHash(s"n$i").toLong) % (1L << 45) + 1)
    val got = ns.toDF("n")
      .select(col("n"), expr(BigramLm.ilog2MilliSpark("n")).as("l"))
      .as[(Long, Long)].collect().sortBy(_._1)
    got.foreach { case (n, l) =>
      val truth = 1000.0 * math.log(n.toDouble) / math.log(2.0)
      assert(math.abs(l - truth) <= 6.0, s"n=$n: $l vs $truth")
    }
    got.sliding(2).foreach { case Array((n1, l1), (n2, l2)) =>
      if (n1 != n2) assert(l1 <= l2, s"not monotone at $n1->$n2")
      case _ =>
    }
  }

  private def corpus(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("scores are invariant under input partitioning") {
    val docs = spark.range(400).select(col("id").as("doc_id"),
      concat(lit("w"), pmod(col("id"), lit(7)), lit(" x"),
        pmod(col("id"), lit(5)), lit(" y"),
        pmod(col("id"), lit(3))).as("text"))
    val train = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
    val a = BigramLm.scoreDocs(docs, train, "doc_id", "text")
    val b = BigramLm.scoreDocs(docs.repartition(11, col("doc_id")),
      train.repartition(3), "doc_id", "text")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("fully-unseen text hits the exact smoothing floor ilog2(V)") {
    // training bigrams: (a,b),(b,c),(c,d),(a,b),(b,e),(e,f) →
    // prefix vocab V = |{a,b,c,e}| = 4, so an unseen bigram costs
    // exactly ilog2(0 + V) − ilog2(0 + 1) = ilog2(4) = 2000 milli-bits
    val train = corpus(1L -> "a b c d", 2L -> "a b e f")
    val unseen = corpus(9L -> "zz qq ww")
    val got = BigramLm.scoreDocs(unseen, train, "doc_id", "text")
      .select(col("n_bigrams"), col("avg_nll_milli"))
      .as[(Long, Long)].head()
    val floor = spark.range(1)
      .select(expr(BigramLm.ilog2MilliSpark("4"))).as[Long].head()
    assert(got == ((2L, floor)), s"got $got, want (2, $floor)")
    assert(floor == 2000L) // log2(4) exactly
  }

  test("the filter's reason to exist: fluent scores below gibberish") {
    val train = corpus((1L to 20L).map(i =>
      i -> "the cat sat on the mat and the dog ran to the cat"): _*)
    val probe = corpus(100L -> "the cat sat on the mat",
      101L -> "mat the to ran sat qq")
    val s = BigramLm.scoreDocs(probe, train, "doc_id", "text")
      .select(col("doc_id"), col("avg_nll_milli")).as[(Long, Long)]
      .collect().toMap
    assert(s(100L) < s(101L),
      s"fluent ${s(100L)} must score below shuffled/unseen ${s(101L)}")
  }

  test("every nll term is non-negative (num <= den structurally)") {
    val docs = spark.range(300).select(col("id").as("doc_id"),
      concat(lit("t"), pmod(col("id"), lit(4)), lit(" t"),
        pmod(col("id"), lit(6)), lit(" t"),
        pmod(col("id"), lit(9))).as("text"))
    val scored = BigramLm.scoreDocs(docs, docs, "doc_id", "text")
    assert(scored.filter(col("nll_sum_milli") < 0 ||
      col("avg_nll_milli") < 0).isEmpty)
  }
}
