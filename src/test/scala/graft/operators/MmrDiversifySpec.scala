package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Retrieval.mmrDiversify]] contracts: pure-relevance first pick,
  * diversity deferral of redundant candidates, exact integer scores,
  * and partitioning invariance. */
class MmrDiversifySpec extends SparkSpec {
  import spark.implicits._

  // 4 candidates: 10 and 11 near-identical (high mutual cosine), 12
  // orthogonal-ish, 13 medium. rel favors 10 > 11 > 12 > 13.
  private def pool = Seq(
    (10L, 990000L, Seq(1.0, 0.0, 0.0, 0.1)),
    (11L, 980000L, Seq(1.0, 0.01, 0.0, 0.1)),
    (12L, 900000L, Seq(0.0, 1.0, 0.0, 0.0)),
    (13L, 800000L, Seq(0.5, 0.5, 0.7, 0.0))
  ).toDF("id", "rel_ppm", "v")

  test("first pick is max relevance; near-duplicate is deferred") {
    val got = Retrieval.mmrDiversify(pool, "id", "rel_ppm", "v",
        lambdaPpm = 500000L, k = 3)
      .select($"rank", $"id").as[(Int, Long)].collect().toSeq
    assert(got.head == ((1, 10L)))
    // 11 is rel-rank 2 but nearly identical to 10: at λ=0.5 the
    // diversity term pushes it out of the next picks
    assert(got(1)._2 == 12L, got.toString)
    assert(!got.take(3).map(_._2).contains(11L), got.toString)
  }

  test("λ=1 reduces to pure relevance order") {
    val got = Retrieval.mmrDiversify(pool, "id", "rel_ppm", "v",
        lambdaPpm = 1000000L, k = 4)
      .select($"id").as[Long].collect().toSeq
    assert(got == Seq(10L, 11L, 12L, 13L))
  }

  test("scores are the exact integer λ·rel − (1−λ)·maxsim longs") {
    val got = Retrieval.mmrDiversify(pool, "id", "rel_ppm", "v",
        lambdaPpm = 1000000L, k = 2)
      .select($"mmr_score").as[Long].collect().toSeq
    assert(got == Seq(1000000L * 990000L, 1000000L * 980000L))
  }

  test("invariant under input partitioning") {
    val a = Retrieval.mmrDiversify(pool, "id", "rel_ppm", "v",
      500000L, 4).collect().map(_.toSeq).toSeq
    val b = Retrieval.mmrDiversify(pool.repartition(5), "id", "rel_ppm",
      "v", 500000L, 4).collect().map(_.toSeq).toSeq
    assert(a == b)
  }
}
