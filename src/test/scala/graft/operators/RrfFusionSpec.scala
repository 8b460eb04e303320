package graft.operators

import graft.SparkSpec

/** Reciprocal-rank fusion contracts: exact integer scores, tie
  * determinism, and single-list membership handling. */
class RrfFusionSpec extends SparkSpec {

  import spark.implicits._

  test("fused score is the exact integer sum and ties break on id") {
    // doc 10: rank 1 in A, rank 2 in B; doc 20: rank 2 in A, rank 1
    // in B — identical fused scores, so output order must fall back
    // to ascending id. doc 30 appears only in A.
    val a = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("doc_id", "rank")
    val b = Seq((20L, 1), (10L, 2)).toDF("doc_id", "rank")
    val rows = Retrieval.rrfFuse(Seq(a, b), "doc_id", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val s12 = 1000000L / 61 + 1000000L / 62
    assert(rows.toSeq == Seq(
      (10L, 2L, s12), (20L, 2L, s12), (30L, 1L, 1000000L / 63)))
  }

  test("fusion is invariant under list order and input partitioning") {
    val a = Seq((1L, 1), (2L, 2), (3L, 3)).toDF("doc_id", "rank")
    val b = Seq((3L, 1), (4L, 2)).toDF("doc_id", "rank")
    val ab = Retrieval.rrfFuse(Seq(a, b), "doc_id", k = 10)
      .collect().map(_.toSeq).toSeq
    val ba = Retrieval.rrfFuse(
        Seq(b.repartition(5), a.repartition(3)), "doc_id", k = 10)
      .collect().map(_.toSeq).toSeq
    assert(ab == ba)
  }
}
