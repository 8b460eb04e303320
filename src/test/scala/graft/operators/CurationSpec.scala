package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-computed fixtures for the curation operators: repetition
  * metrics, boilerplate n-grams, split contamination. */
class CurationSpec extends SparkSpec {

  import scala.jdk.CollectionConverters._

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("repetitionStats: dup-token and top-bigram fractions") {
    // "a a a b": 4 tokens, 2 distinct -> dup = (4-2)/4 = 0.5
    // bigrams: "a a","a a","a b" -> top 2/3
    val r = Curation.repetitionStats(
      docs(1L -> "a a a b", 2L -> "x y z"), "doc_id", "text")
      .collect().map(x => x.getLong(0) ->
        (x.getInt(1), x.getDouble(2), x.getDouble(3))).toMap
    assert(r(1L) == ((4, 0.5, 2.0 / 3.0)))
    // "x y z": 0 dups; bigrams "x y","y z" each once -> top 1/2
    assert(r(2L) == ((3, 0.0, 0.5)))
  }

  test("repetitionStats: single-token doc gets top_bigram_frac 0") {
    val r = Curation.repetitionStats(docs(1L -> "solo"), "doc_id", "text")
      .collect().head
    assert(r.getInt(1) == 1 && r.getDouble(2) == 0.0 && r.getDouble(3) == 0.0)
  }

  test("boilerplateNgrams: df threshold counts distinct docs only") {
    // "the same header" appears (duplicated in-doc for doc 3) in 3 docs;
    // in-doc duplication must not inflate the document frequency.
    val d = docs(
      1L -> "the same header unique one",
      2L -> "the same header unique two",
      3L -> "the same header the same header",
      4L -> "totally different text here")
    val bp = Curation.boilerplateNgrams(d, "doc_id", "text", n = 3, minDocs = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bp == Map("the same header" -> 3L))
  }

  test("splitContamination: counts train docs sharing an n-gram per test doc") {
    val d = docs(
      1L -> "alpha beta gamma delta epsilon zeta", // test
      2L -> "alpha beta gamma delta epsilon eta",  // train: shares 5-gram? no ("..epsilon zeta" vs "..epsilon eta") -> shares "alpha beta gamma delta epsilon"
      3L -> "unrelated text goes right here now",  // train
      4L -> "alpha beta gamma delta epsilon zeta extra") // train: shares both 5-grams of doc 1
    import org.apache.spark.sql.functions.when
    val split = d.withColumn("split",
      when(col("doc_id") === 1L, "test").otherwise("train"))
    val c = Curation.splitContamination(split, "doc_id", "text", "split",
      n = 5, maxDocFreq = 50)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // doc 1's 5-grams: "alpha beta gamma delta epsilon", "beta gamma delta epsilon zeta"
    // doc 2 shares the first (1 hit), doc 4 shares both (2 hits)
    assert(c == Map(1L -> ((2L, 3L))))
  }

  test("splitContamination: capped shingles generate no hits") {
    val d = docs(
      1L -> "common words here",
      2L -> "common words here",
      3L -> "common words here")
    val split = d.withColumn("split",
      when(col("doc_id") === 1L, "test").otherwise("train"))
    // every shingle has df 3 > cap 2 -> excluded -> no contamination rows
    val c = Curation.splitContamination(split, "doc_id", "text", "split",
      n = 3, maxDocFreq = 2)
    assert(c.count() == 0)
  }

  test("chunk: sliding windows with overlap; short docs yield one chunk") {
    import spark.implicits._
    val d = docs(
      1L -> (1 to 10).map(i => s"t$i").mkString(" "), // 10 tokens
      2L -> "just three tokens")
    val chunks = Curation.chunk(d, "doc_id", "text", chunkTokens = 4, stride = 3)
      .as[(Long, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    // doc 1: windows start at tokens 1,4,7,10 → ceil((10-4)/3)+1 = 3 → wait
    // ceil(6/3)+1 = 3 windows: [t1..t4],[t4..t7],[t7..t10]
    assert(chunks(1L) == Seq("t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10"))
    assert(chunks(2L) == Seq("just three tokens"))
    // overlap invariant: consecutive windows share chunkTokens - stride
    assert(chunks(1L)(0).split(" ").last == chunks(1L)(1).split(" ").head)
  }

  test("dedupSentences keeps first occurrence corpus-wide and reassembles") {
    import spark.implicits._
    val d = docs(
      1L -> "alpha beta. gamma delta. unique one",
      2L -> "gamma delta. alpha beta. unique two")
    val r = Curation.dedupSentences(d, "doc_id", "text")
      .select($"doc_id", $"n_segments", $"n_kept", $"text")
      .as[(Long, Long, Long, String)].collect().toSet
    // doc 1 owns both shared sentences (lowest doc_id); doc 2 keeps
    // only its unique tail
    assert(r == Set(
      (1L, 3L, 3L, "alpha beta. gamma delta. unique one"),
      (2L, 3L, 1L, "unique two")))
  }

  test("chunk property: random docs — full coverage, exact windows, correct count") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val rows = Seq.tabulate(30) { i =>
      val n = 1 + rnd.nextInt(40)
      (i.toLong, (0 until n).map(j => s"w${i}_$j").mkString(" "))
    }
    for ((chunkTok, stride) <- Seq((8, 8), (8, 5), (16, 4))) {
      val got = Curation.chunk(rows.toDF("doc_id", "text"), "doc_id", "text",
          chunkTok, stride)
        .as[(Long, Long, String)].collect()
        .groupBy(_._1).view
        .mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
      rows.foreach { case (id, text) =>
        val toks = text.split(" ").toSeq
        val expN = math.max(1,
          math.ceil((toks.size - chunkTok).toDouble / stride).toInt + 1)
        val exp = (0 until expN).map(i =>
          toks.slice(i * stride, i * stride + chunkTok).mkString(" "))
        assert(got(id) == exp, s"doc $id (${toks.size} toks, $chunkTok/$stride)")
        // coverage: every token appears in at least one window
        assert(toks.forall(t => got(id).exists(_.contains(t))))
      }
    }
  }

  test("redactPii replaces emails/ips/phones and counts hits") {
    import spark.implicits._
    val d = docs(1L ->
      "mail a.b@x.org or 192.168.0.1 call +1 (555) 123-4567 done")
    val r = Curation.redactPii(d, "text")
      .select($"text", $"n_emails", $"n_ips", $"n_phones")
      .as[(String, Int, Int, Int)].head()
    assert(r == ("mail <EMAIL> or <IP> call <PHONE> done", 1, 1, 1))
  }

  test("repeatedSpans merges overlapping and adjacent duplicated n-grams") {
    import spark.implicits._
    // docs 1/2 share tokens 0..5 ("a b c d e f") → overlapping 3-grams
    // at positions 0..3 merge into ONE maximal span [0,5]; the tail of
    // doc 1 is unique and must NOT be covered. doc 3 shares nothing.
    val d = docs(
      1L -> "a b c d e f uniq1 uniq2 uniq3",
      2L -> "x y a b c d e f z w",
      3L -> "p q r s t u v")
    val got = Curation.repeatedSpans(d, "doc_id", "text",
        n = 3, minDocs = 2, minTokens = 3)
      .as[(Long, Int, Int, Int)].collect().toSet
    assert(got == Set((1L, 0, 5, 6), (2L, 2, 7, 6)))
  }

  test("repeatedSpans: adjacent-but-gapped islands stay separate") {
    import spark.implicits._
    // shared trigram at both ends of doc 1, a unique middle: two spans
    val d = docs(
      1L -> "a b c m1 m2 m3 m4 d e f",
      2L -> "a b c q q q q d e f")
    val got = Curation.repeatedSpans(d, "doc_id", "text",
        n = 3, minDocs = 2, minTokens = 3)
      .as[(Long, Int, Int, Int)].collect().toSet
    assert(got == Set((1L, 0, 2, 3), (1L, 7, 9, 3), (2L, 0, 2, 3), (2L, 7, 9, 3)))
  }

  test("repeatedSpans: minTokens filters short spans, null/short docs ignored") {
    import spark.implicits._
    val d = docs(
      1L -> "a b c tail1 tail2",
      2L -> "a b c other stuff",
      3L -> "ab",                       // shorter than n
      4L -> null.asInstanceOf[String])  // null text
    val strict = Curation.repeatedSpans(d, "doc_id", "text",
      n = 3, minDocs = 2, minTokens = 4)
    assert(strict.count() == 0) // the shared span is only 3 tokens
    val loose = Curation.repeatedSpans(d, "doc_id", "text",
        n = 3, minDocs = 2, minTokens = 3)
      .as[(Long, Int, Int, Int)].collect().toSet
    assert(loose == Set((1L, 0, 2, 3), (2L, 0, 2, 3)))
  }
}
