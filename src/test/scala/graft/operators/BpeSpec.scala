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

  test("driver-side trainer produces the IDENTICAL merge list") {
    val docs = Seq.tabulate(60)(i =>
      (i.toLong, s"low lower lowest aaaa abab ${if (i % 3 == 0) "new newer" else "wide wider"}"))
      .toDF("doc_id", "text")
    val distributed = Bpe.trainMerges(docs, "text", 20)
    val local = Bpe.trainMergesLocal(docs, "text", 20)
    assert(local == distributed)
    // and the early-stop contract matches on a fully-mergeable corpus
    val tiny = Seq((1L, "xyz xyz")).toDF("doc_id", "text")
    assert(Bpe.trainMergesLocal(tiny, "text", 10) ==
      Bpe.trainMerges(tiny, "text", 10))
  }

  test("vocab cap: capped-local ≡ capped-distributed, no-op below cap, meta recorded") {
    val docs = Seq.tabulate(40)(i =>
      (i.toLong, s"alpha beta gamma_$i delta_${i % 5} rare_$i epsilon"))
      .toDF("doc_id", "text")
    // cap bites: only the top-8 words by (cnt DESC, word) survive —
    // the two trainers must cut the SAME vocabulary and tie-break the
    // same way
    val cappedLocal = Bpe.trainMergesLocal(docs, "text", 15, maxVocab = 8)
    val cappedDist = Bpe.trainMerges(docs, "text", 15, maxVocab = 8)
    assert(cappedLocal == cappedDist)
    // cap above the true vocab is a no-op (q139/q140/q166 unchanged
    // under the new default)
    assert(Bpe.trainMergesLocal(docs, "text", 15, maxVocab = 100000) ==
      Bpe.trainMergesLocal(docs, "text", 15, maxVocab = -1))
    // and the cap changes the result here (the test would be vacuous
    // if the corpus vocab were below 8)
    assert(cappedLocal !=
      Bpe.trainMergesLocal(docs, "text", 15, maxVocab = -1))
    // meta: capped flag + collected size recorded
    val meta = Bpe.trainMergesLocalMeta(docs, "text", 15, maxVocab = 8)
    assert(meta.capped && meta.vocabSize == 8L && meta.maxVocab == 8)
    val unmeta = Bpe.trainMergesLocalMeta(docs, "text", 15, maxVocab = 100000)
    assert(!unmeta.capped && unmeta.vocabSize > 8L)
    // the bounded-collect plan: orderBy+limit must compile to
    // TakeOrderedAndProject (a heap), not a global sort
    val plan = Bpe.cappedWordCounts(docs, "text", 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("segmentWord ≡ segmentExpr (property, incl. the non-overlap quirk)") {
    // the quirk, pinned directly: replace resumes AFTER the matched
    // region, so the next symbol loses its leading separator
    assert(Bpe.segmentWord("aaaa", Seq(Bpe.Merge(1, "a", "a", 0L)))
      .toSeq == Seq("aa", "a", "a"))
    assert(Bpe.segmentWord("aaaaa", Seq(Bpe.Merge(1, "a", "a", 0L)))
      .toSeq == Seq("aa", "a", "aa"))
    val rnd = new scala.util.Random(7)
    val alpha = "abc"
    val words = Seq.tabulate(120)(_ =>
      Seq.fill(1 + rnd.nextInt(10))(alpha(rnd.nextInt(3))).mkString)
    val train = words.zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val merges = Bpe.trainMergesLocal(train, "text", 12)
    val viaExpr = words.distinct.zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toDF("i", "w")
      .select(col("w"), Bpe.segmentExpr(col("w"), merges).as("seg"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    words.distinct.foreach { w =>
      assert(Bpe.segmentWord(w, merges).toSeq == viaExpr(w),
        s"word '$w': jvm=${Bpe.segmentWord(w, merges).toSeq} " +
          s"expr=${viaExpr(w)}")
    }
  }

  test("applyMergesFast ≡ applyMerges (dictionary join + constant codegen)") {
    val train = Seq((1L, "ship shop ship shop shore")).toDF("doc_id", "text")
    val ms = Bpe.trainMerges(train, "text", 5)
    val corpus = Seq((7L, "shop shrimp ship aaaa"), (8L, "unrelated words"),
      (9L, "ship shore shop")).toDF("doc_id", "text")
    val slow = Bpe.applyMerges(corpus, "doc_id", "text", ms)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val fast = Bpe.applyMergesFast(corpus, "doc_id", "text", ms)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(fast == slow)
  }

  test("1500-merge vocabulary stays inside whole-stage codegen") {
    // fabricated but well-formed merge list at production depth — the
    // segmentExpr fold at this size is the janino failure class;
    // the reference-object form must keep every span compiling
    val merges = (1 to 1500).map { i =>
      Bpe.Merge(i, ('a' + i % 26).toChar.toString,
        ('a' + (i / 26) % 26).toChar.toString, 1L)
    }
    val docs = Seq((1L, "abcdef ghijkl zzyyxx"), (2L, "mnopqr aa bb cc"))
      .toDF("doc_id", "text")
    // the expression's home is the dict projection — pin THAT span
    // (applyMergesFast's full plan is AQE-wrapped, which hides its
    // codegen nodes until execution)
    graft.functions.BpeFunctions.register(spark)
    val dictPlan = spark.range(3)
      .select(concat(lit("abc"), col("id")).as("word"))
      .select(Bpe.segmentCol(col("word"), merges).as("seg"))
    val spans = dictPlan.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    val plan = Bpe.applyMergesFast(docs, "doc_id", "text", merges)
    assert(spans.nonEmpty)
    spans.foreach { w =>
      val (_, source) = w.doCodeGen()
      org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
        .compile(source) // throws on janino overflow
    }
    // and the fast path still tokenizes correctly at this depth: the
    // only applicable merges chain greedily in order
    val toks = plan.filter(col("doc_id") === 2L).head.getSeq[String](1)
    assert(toks.nonEmpty && toks.mkString("") == "mnopqraabbcc")
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
