package graft.operators

import graft.SparkSpec

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "dup spark join filter"),
    (2L, "spark join spark join spark join"),
    (3L, "dup dup dup"),
    (4L, "the quick brown fox"), // no query terms
    (5L, ""),                    // tokenless
    (6L, null.asInstanceOf[String]),
    (7L, "dup spark join filter"), // identical to doc 1: tie broken by id
    (8L, "spark join stuff"),      // pad df(spark)/df(join) so "dup"
    (9L, "spark join words")       // is genuinely the rare term
  ).toDF("doc_id", "text")

  private val terms = Seq("dup", "spark", "join")

  /** Independent fixed-point reference (same formula, BigInt-safe). */
  private def reference: Map[Long, (Long, Long)] = {
    val toks = Map(
      1L -> Seq("dup", "spark", "join", "filter"),
      2L -> Seq("spark", "join", "spark", "join", "spark", "join"),
      3L -> Seq("dup", "dup", "dup"),
      4L -> Seq("the", "quick", "brown", "fox"),
      7L -> Seq("dup", "spark", "join", "filter"),
      8L -> Seq("spark", "join", "stuff"),
      9L -> Seq("spark", "join", "words"))
    val nDocs = toks.size.toLong
    val totLen = toks.values.map(_.size.toLong).sum
    val dfT = terms.map(t =>
      t -> toks.count(_._2.contains(t)).toLong).toMap
    toks.flatMap { case (id, ts) =>
      val lenD = ts.size.toLong
      val kd6 = (12L * (250000L + (750000L * lenD * nDocs) / totLen)) / 10L
      val contribs = terms.flatMap { t =>
        val tf = ts.count(_ == t).toLong
        if (tf == 0) None
        else {
          val idf6 = ((2L * (nDocs - dfT(t)) + 1L) * 1000000L) / (2L * dfT(t) + 1L)
          Some(((tf * 2200000L * 1000000L) / (tf * 1000000L + kd6) * idf6) / 1000000L)
        }
      }
      if (contribs.isEmpty) None
      else Some(id -> (contribs.size.toLong, contribs.sum))
    }
  }

  test("bm25TopK matches an independent fixed-point reference") {
    val got = Retrieval.bm25TopK(docs, "doc_id", "text", terms, k = 10)
      .as[(Long, Long, Long)].collect()
      .map { case (id, nt, sc) => id -> (nt, sc) }.toMap
    assert(got == reference)
  }

  test("ranking: rare-term docs outrank common-term docs; ties by id") {
    val order = Retrieval.bm25TopK(docs, "doc_id", "text", terms, k = 10)
      .as[(Long, Long, Long)].collect().map(_._1).toSeq
    // docs 4 (no match), 5/6 (no tokens) are absent
    assert(order.toSet == Set(1L, 2L, 3L, 7L, 8L, 9L))
    // identical docs 1 and 7 are adjacent with 1 first (id tiebreak)
    val (i1, i7) = (order.indexOf(1L), order.indexOf(7L))
    assert(i7 == i1 + 1)
    // the all-"dup" doc beats the all-common doc: rare term, high idf
    assert(order.indexOf(3L) < order.indexOf(2L))
  }

  test("k truncates after the deterministic (score desc, id) order") {
    val top1 = Retrieval.bm25TopK(docs, "doc_id", "text", terms, k = 1)
      .as[(Long, Long, Long)].collect()
    val full = Retrieval.bm25TopK(docs, "doc_id", "text", terms, k = 10)
      .as[(Long, Long, Long)].collect()
    assert(top1.toSeq == full.toSeq.take(1))
  }
}
