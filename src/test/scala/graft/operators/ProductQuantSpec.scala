package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProductQuantSpec extends SparkSpec {
  import spark.implicits._

  // 8-dim vectors in two well-separated groups; ids 1..4 seed the book
  private def g(a: Float, b: Float) =
    Array(a, a, a, a, b, b, b, b)
  private lazy val vecs = Seq(
    (1L, g(1.0f, 0.0f)),
    (2L, g(0.0f, 1.0f)),
    (3L, g(-1.0f, 0.0f)),
    (4L, g(0.0f, -1.0f)),
    (5L, g(0.98f, 0.02f)),  // near 1
    (6L, g(0.02f, 0.97f))   // near 2
  ).toDF("vec_id", "embedding")

  test("trainCodebooks: m subspaces × k codewords of dim/m each") {
    val books = ProductQuant.trainCodebooks(vecs, "vec_id", "embedding",
      m = 2, k = 4)
    assert(books.length == 2)
    assert(books.forall(_.length == 4))
    assert(books.forall(_.forall(_.length == 4)))
    // codeword 0 of subspace 0 = first 4 dims of vec 1
    assert(books(0)(0).toSeq == Seq(1.0, 1.0, 1.0, 1.0))
    assert(books(1)(1).toSeq == Seq(1.0, 1.0, 1.0, 1.0)) // vec 2 back half
  }

  test("encode: codes in range; seeds code to themselves; near-dups share codes") {
    val books = ProductQuant.trainCodebooks(vecs, "vec_id", "embedding",
      m = 2, k = 4)
    val codes = ProductQuant.encode(vecs, "vec_id", "embedding", books)
      .as[(Long, Int, Int)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(codes.values.forall { case (a, b) =>
      a >= 0 && a < 4 && b >= 0 && b < 4 })
    // nonzero subvectors code to their own codeword; all-zero
    // subvectors tie at distance ‖cw‖²=0 across the three zero
    // codewords and the strict-< chain keeps the EARLIEST (vec 1's
    // back half = codeword 0) — the tie-break the oracle mirrors
    assert(codes(1L) == ((0, 0)) && codes(2L) == ((1, 1)) &&
      codes(3L) == ((2, 0)) && codes(4L) == ((1, 3)))
    // near-duplicates of seeds quantize to the seed's codes
    assert(codes(5L) == codes(1L) && codes(6L) == codes(2L))
  }

  test("pqTopK ranks the quantization-equivalent neighbor first") {
    val top = ProductQuant.pqTopK(vecs, vecs.filter($"vec_id" === 1L),
      "vec_id", "embedding", m = 2, k = 4, topK = 2)
      .as[(Long, Long, Int, Double)].collect().sortBy(_._3)
    assert(top.head._2 == 5L) // same codes as query's own cell, top score
    assert(top.forall(_._1 == 1L))
  }

  test("pqTopK is deterministic across runs") {
    def run() = ProductQuant.pqTopK(vecs, vecs.filter($"vec_id" <= 2L),
      "vec_id", "embedding", m = 2, k = 4, topK = 3)
      .as[(Long, Long, Int, Double)].collect().toSet
    assert(run() == run())
  }

  test("trainCodebooksLloyd: deterministic across partitionings, bit-equal") {
    // the determinism claim is exactly "partition order can't change the
    // books": integer per-dim sums are order-free, so 1 partition vs 5
    // partitions vs reversed input must land bit-identical doubles
    def books(df: org.apache.spark.sql.DataFrame) =
      ProductQuant.trainCodebooksLloyd(df, "vec_id", "embedding",
        m = 2, k = 4, iters = 3)
    val a = books(vecs.repartition(1))
    val b = books(vecs.repartition(5))
    val c = books(vecs.orderBy($"vec_id".desc).repartition(3))
    assert(a.map(_.map(_.toSeq)) == b.map(_.map(_.toSeq)))
    assert(a.map(_.map(_.toSeq)) == c.map(_.map(_.toSeq)))
  }

  test("trainCodebooksLloyd: recenters occupied cells, keeps empty ones") {
    val seeds = ProductQuant.trainCodebooks(vecs, "vec_id", "embedding",
      m = 2, k = 4)
    val refined = ProductQuant.trainCodebooksLloyd(vecs, "vec_id",
      "embedding", m = 2, k = 4, iters = 1)
    // vecs 1 and 5 both assign to (s=0, code=0): its centroid moves to
    // their mean ((1.0 + 0.98)/2 per dim, through the 1e6 fixed point)
    assert(refined(0)(0).toSeq == Seq.fill(4)(0.99))
    // iters=0 is the identity
    val zero = ProductQuant.trainCodebooksLloyd(vecs, "vec_id",
      "embedding", m = 2, k = 4, iters = 0)
    assert(zero.map(_.map(_.toSeq)) == seeds.map(_.map(_.toSeq)))
    // every refined codeword is finite and shaped (empty cells keep
    // their seed value rather than collapsing to NaN/zero)
    assert(refined.forall(_.forall(cw =>
      cw.length == 4 && cw.forall(d => !d.isNaN && !d.isInfinite))))
  }

  test("dim not divisible by m is refused loudly") {
    val bad = Seq((1L, Array(1.0f, 2.0f, 3.0f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      ProductQuant.trainCodebooks(bad, "vec_id", "embedding", m = 2, k = 1)
    }
    assert(e.getMessage.contains("divisible"))
  }
}
