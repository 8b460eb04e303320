package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Binary (1-bit) quantization ANN: sign-bit packing, Hamming distance,
  * and the two-stage shortlist-then-exact-rerank search. */
class HammingAnnSpec extends SparkSpec {
  import spark.implicits._

  private def vecsOf(rows: Seq[(Long, Seq[Float])]) =
    rows.toDF("vec_id", "embedding")

  test("signBits packs the sign of each dimension into the right bit") {
    // dims 0, 2, 65 positive → word0 bits 0+2, word1 bit 1
    val v = Array.fill(70)(-1.0f)
    v(0) = 0.5f; v(2) = 2.0f; v(65) = 1e-9f
    val out = vecsOf(Seq((1L, v.toSeq)))
      .select(Similarity.signBits(col("embedding"), 70).as("code"))
      .head.getSeq[Long](0)
    assert(out === Seq((1L | (1L << 2)), (1L << 1)))
  }

  test("signBits treats 0 and negatives as 0-bits, bit 63 lands in the sign bit") {
    val v = Array.fill(64)(0.0f)
    v(63) = 1.0f
    val out = vecsOf(Seq((1L, v.toSeq)))
      .select(Similarity.signBits(col("embedding"), 64).as("code"))
      .head.getSeq[Long](0)
    assert(out === Seq(Long.MinValue)) // 1L << 63
  }

  test("hammingDist equals the count of dimensions whose signs differ; codegen chain == HOF form") {
    val rnd = new scala.util.Random(7)
    val dim = 130 // 3 words, last partial
    val pairs = (0 until 20).map { i =>
      val a = Array.fill(dim)(rnd.nextFloat() - 0.5f)
      val b = Array.fill(dim)(rnd.nextFloat() - 0.5f)
      val expected = (0 until dim).count(j => (a(j) > 0) != (b(j) > 0))
      (i.toLong, a.toSeq, b.toSeq, expected.toLong)
    }
    val got = pairs.toDF("id", "a", "b", "expected")
      .select(col("expected"),
        Similarity.hammingDist(
          Similarity.signBits(col("a"), dim),
          Similarity.signBits(col("b"), dim), words = 3).as("got"),
        Similarity.hammingDistHof(
          Similarity.signBits(col("a"), dim),
          Similarity.signBits(col("b"), dim)).as("hof"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(1) === r.getLong(0))
      assert(r.getLong(2) === r.getLong(0))
    }
  }

  test("hammingTopK with a full-corpus shortlist matches bruteForceTopK") {
    val rnd = new scala.util.Random(11)
    val corpus = vecsOf((0L until 40L).map(i =>
      (i, Seq.fill(64)(rnd.nextFloat() * 2 - 1))))
    val queries = corpus.filter(col("vec_id") < 5)
    val exact = Similarity.bruteForceTopK(corpus, queries,
      "vec_id", "embedding", k = 3)
      .select("query_id", "neighbor_id", "rank", "similarity")
    val ham = Similarity.hammingTopK(corpus, queries,
      "vec_id", "embedding", dim = 64, k = 3, shortlist = 39)
      .select("query_id", "neighbor_id", "rank", "similarity")
    assert(ham.exceptAll(exact).isEmpty && exact.exceptAll(ham).isEmpty)
  }

  test("hammingTopK emits exactly k rows per query, ranked by exact similarity") {
    val rnd = new scala.util.Random(3)
    val corpus = vecsOf((0L until 30L).map(i =>
      (i, Seq.fill(64)(rnd.nextFloat() * 2 - 1))))
    val out = Similarity.hammingTopK(corpus, corpus.filter(col("vec_id") < 4),
      "vec_id", "embedding", dim = 64, k = 5, shortlist = 10)
      .collect()
    assert(out.length === 20)
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_.getInt(2))
      assert(byRank.map(_.getInt(2)).toSeq === (1 to 5))
      // similarity non-increasing in rank
      val sims = byRank.map(_.getDouble(4))
      assert(sims.zip(sims.tail).forall { case (x, y) => x >= y })
    }
  }

  test("shortlist < k is refused loudly") {
    val corpus = vecsOf(Seq((1L, Seq.fill(64)(1.0f))))
    intercept[IllegalArgumentException] {
      Similarity.hammingTopK(corpus, corpus, "vec_id", "embedding",
        dim = 64, k = 5, shortlist = 4)
    }
  }
}
