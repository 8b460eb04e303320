package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[QualityModel]] — exact-integer GD pins: the zero-gradient fixed
  * point, an independently-implemented integer recurrence replayed
  * bit-for-bit, partitioning invariance of the whole trajectory, and
  * real separation on a synthetic long/short corpus. */
class QualityModelSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(rows: (Long, String, Long)*) =
    rows.toDF("doc_id", "text", "label")

  test("all-zero labels: weights stay exactly zero") {
    val docs = corpus((1L, "the cat sat on the mat", 0L),
      (2L, "a longer document with many more words in it here", 0L))
    val hist = QualityModel.train(docs, "text", "label", iters = 3,
      lrDen = 1000L)
    assert(hist.forall(_.forall(_ == 0L)), hist.map(_.toSeq))
  }

  test("trajectory replays an independent integer recurrence bit-for-bit") {
    val docs = corpus(
      (1L, "the cat sat on the mat today ok fine", 0L),
      (2L, "one two three four five six seven eight nine ten " * 6, 1L),
      (3L, "a b c d", 0L),
      (4L, "the the the and and of to in is it " * 8, 1L))
    // independent features: mirror the documented formulas directly
    val feats = docs.select(col("doc_id"), col("label"), col("text"))
      .collect().map { r =>
        val text = r.getString(2)
        val toks = text.trim.split("\\s+").count(_.nonEmpty).toLong
        val t = math.max(toks, 1L)
        val stop = "\\b(the|a|an|and|of|to|in|is|it)\\b".r
          .findAllIn(text.toLowerCase).size.toLong
        val punct = "[.,;:!?]".r.findAllIn(text).size.toLong
        val chars = text.replaceAll("\\s", "").length.toLong
        (Array(1000L, math.min(1000L, stop * 10000L / t),
          math.min(1000L, punct * 4000L / t),
          math.min(1000L, toks * 10L),
          math.min(1000L, chars * 100L / t)),
          r.getLong(1) * 1000000L)
      }
    val n = feats.length.toLong
    var w = Array.fill(5)(0L)
    val expected = (1 to 4).map { _ =>
      val g = Array.fill(5)(0L)
      feats.foreach { case (x, y) =>
        val pred = (0 until 5).map(j => w(j) * x(j)).sum / 1000L
        (0 until 5).foreach(j => g(j) += x(j) * (pred - y))
      }
      w = Array.tabulate(5)(j => w(j) - (g(j) / n) / 500L)
      w.toSeq
    }
    val hist = QualityModel.train(docs, "text", "label", iters = 4,
      lrDen = 500L).map(_.toSeq)
    assert(hist == expected, s"\ngot      $hist\nexpected $expected")
  }

  test("trajectory is partitioning-invariant") {
    val docs = corpus((1L to 24L).map(i =>
      (i, ("w" * (i % 7 + 1).toInt + " ") * (i % 30 + 2).toInt, i % 2)): _*)
    val base = QualityModel.train(docs, "text", "label", 5, 1000L)
      .map(_.toSeq)
    val re = QualityModel.train(docs.repartition(7, col("text")),
      "text", "label", 5, 1000L).map(_.toSeq)
    assert(base == re)
  }

  test("probe separates long from short docs; score() matches train-side predictions") {
    val long = (1L to 30L).map(i => (i, "alpha beta gamma delta " * 20, 1L))
    val short = (31L to 60L).map(i => (i, "alpha beta gamma", 0L))
    val docs = corpus((long ++ short): _*)
    val w = QualityModel.train(docs, "text", "label", 12, 1000L).last
    val scored = QualityModel.score(docs, "text", w)
      .select(col("doc_id"), col("quality_ppm")).as[(Long, Long)]
      .collect().toMap
    val pos = (1L to 30L).map(scored)
    val neg = (31L to 60L).map(scored)
    assert(pos.min > neg.max,
      s"long docs must outscore short: ${pos.min} vs ${neg.max}")
    // score keeps passthrough columns and adds exactly quality_ppm
    val cols = QualityModel.score(docs, "text", w).columns.toSeq
    assert(cols == Seq("doc_id", "text", "label", "quality_ppm"), cols)
  }
}
