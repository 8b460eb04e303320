package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BPE trainer/tokenizer contracts: merge-order determinism under
  * partitioning, greedy left-to-right substitution semantics, and
  * document-order token reassembly. */
class BpeSpec extends SparkSpec {

  import spark.implicits._

  test("merge order is invariant under input partitioning") {
    val docs = Seq.tabulate(40)(i =>
      (i.toLong, s"low lower lowest ${if (i % 3 == 0) "new newer" else "wide wider"}"))
      .toDF("doc_id", "text")
    val m1 = Bpe.trainMerges(docs.repartition(1), "text", 6)
    val m7 = Bpe.trainMerges(docs.repartition(7), "text", 6)
    assert(m1 == m7)
    assert(m1.size == 6)
  }

  test("greedy left-to-right: 'aaa' under merge(a,a) becomes [aa, a]") {
    val docs = Seq((1L, "aaa")).toDF("doc_id", "text")
    val merges = Seq(Bpe.Merge(1, "a", "a", 2L))
    val toks = Bpe.applyMerges(docs, "doc_id", "text", merges)
      .head.getSeq[String](1)
    assert(toks == Seq("aa", "a"))
  }

  test("ties break on (count desc, lhs, rhs) and stop when fully merged") {
    // one word, repeated: pairs (x,y) and (y,z) both count 5 → (x,y)
    // wins lexicographically; after 2 merges the word is one symbol
    // and training stops early
    val docs = Seq.fill(5)((0L, "xyz")).zipWithIndex
      .map { case ((_, t), i) => (i.toLong, t) }.toDF("doc_id", "text")
    val ms = Bpe.trainMerges(docs, "text", 10)
    assert(ms.map(m => (m.lhs, m.rhs)) == Seq(("x", "y"), ("xy", "z")))
    assert(ms.head.pair_cnt == 5L)
  }

  test("applyMerges preserves document token order and handles unseen " +
      "words via the replace chain") {
    val train = Seq((1L, "ship shop ship shop")).toDF("doc_id", "text")
    val ms = Bpe.trainMerges(train, "text", 3)
    // apply to a doc containing a word never seen in training
    val toks = Bpe.applyMerges(
        Seq((7L, "shop shrimp ship")).toDF("doc_id", "text"),
        "doc_id", "text", ms)
      .head.getSeq[String](1)
    // order: all of "shop"'s subwords, then "shrimp"'s, then "ship"'s
    assert(toks.mkString("") == "shopshrimpship")
    // learned 'sh' merge applies inside the unseen word too
    assert(toks.contains("sh") || toks.exists(_.startsWith("sh")))
  }
}
