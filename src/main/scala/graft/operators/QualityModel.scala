package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based quality filtering — train a tiny linear probe that
  * separates a TARGET slice from the raw pool on cheap text-shape
  * features, then score every document with it (the GPT-3/CCNet
  * "quality classifier" recipe, shrunk to a model the engines can
  * replay exactly).
  *
  * Architecture for 100 TB: each gradient-descent iteration is ONE
  * map-side-combined aggregate over the feature frame (d sums + a
  * count); the d-long gradient is the only thing the driver ever
  * holds, and the updated weight vector re-enters the next iteration
  * as codegen'd literals — no UDF, no ML-library dependency, no
  * driver-side data. The feature frame materializes once
  * ([[Lifecycle]]) and every iteration re-reads it instead of
  * re-scanning the corpus.
  *
  * Determinism (cross-engine contract): features are integer
  * per-mille ratios, labels/predictions/weights integer ppm, the
  * learning rate an integer divisor — and every division is the
  * engines' shared truncate-toward-zero integer quotient (Spark
  * `div` ≡ DuckDB `//`, verified on negatives AND on DuckDB's
  * HUGEINT-promoted sums), so an oracle replays all k training
  * iterations as unrolled CTEs bit-for-bit. Squared loss, not
  * logistic: the gradient stays polynomial — no transcendental
  * function whose last-ulp behavior differs across engines (the q79
  * lesson).
  *
  * Exactness bound: per-doc gradient terms are ≤ 1e3·|resid|; with
  * converged-scale weights that keeps the two training sums under
  * 2^63 to ~1e8 documents per slice — beyond that, lift them to
  * decimal(38,0) (same formula, wider lanes) or train on a fixed-size
  * systematic subsample ([[PrefixSum.systematicSample]]).
  */
object QualityModel {

  /** Feature scale (per-mille), label/weight/prediction scale (ppm),
    * feature dimension. */
  val FeatScale = 1000L
  val LabelScale = 1000000L
  val Dim = 5

  /** Integer per-mille text-shape features f0..f4, capped to
    * [0, 1000]: bias, stopword density, punctuation density, length
    * term, mean token length — the [[TextAnalysis.qualityScore]]
    * primitives lifted from deterministic doubles to exact ints —
    * plus the ppm label `y` from `labelCol` (0/1). */
  def features(docs: DataFrame, textCol: String,
      labelCol: String): DataFrame = {
    val text = col(textCol)
    docs
      .withColumn("__ntok", TextAnalysis.tokenCount(text).cast("long"))
      .withColumn("__t", greatest(col("__ntok"), lit(1L)))
      .withColumn("__nstop",
        TextAnalysis.stopwordCount(text).cast("long"))
      .withColumn("__npunct", TextAnalysis.punctCount(text).cast("long"))
      .withColumn("__nchar",
        length(regexp_replace(text, "\\s", "")).cast("long"))
      .withColumn("f0", lit(1000L))
      .withColumn("f1", expr("least(1000L, (__nstop * 10000L) div __t)"))
      .withColumn("f2", expr("least(1000L, (__npunct * 4000L) div __t)"))
      .withColumn("f3", expr("least(1000L, __ntok * 10L)"))
      .withColumn("f4", expr("least(1000L, (__nchar * 100L) div __t)"))
      .withColumn("y", col(labelCol).cast("long") * lit(LabelScale))
      .drop("__ntok", "__t", "__nstop", "__npunct", "__nchar")
  }

  /** ŷ in ppm from per-mille features and ppm-scaled weights — the
    * engines' shared truncating integer quotient. */
  private def predictionExpr(w: Array[Long]): Column =
    expr(w.zipWithIndex.map { case (wj, j) => s"${wj}L * f$j" }
      .mkString("(", " + ", s") div ${FeatScale}L"))

  /** Train `iters` full-batch GD steps from w = 0; returns the weight
    * history (element i = weights AFTER iteration i+1, each entry ppm
    * longs). Update: w_j ← w_j − ((Σ f_j·(ŷ−y)) div n) div lrDen —
    * effective learning rate 1000/lrDen on unit-scaled features. */
  def train(docs: DataFrame, textCol: String, labelCol: String,
      iters: Int, lrDen: Long): Seq[Array[Long]] = {
    require(iters >= 1, s"iters $iters")
    require(lrDen >= 1, s"lrDen $lrDen")
    val feats = features(docs, textCol, labelCol)
      .select((0 until Dim).map(j => col(s"f$j")) :+ col("y"): _*)
    val mat = Lifecycle.materializeToScratch(feats)
    try {
      val history = scala.collection.mutable.ArrayBuffer.empty[Array[Long]]
      var w = Array.fill(Dim)(0L)
      var i = 0
      while (i < iters) {
        val pred = predictionExpr(w)
        val aggs = (0 until Dim).map(j =>
          sum(col(s"f$j") * (pred - col("y"))).as(s"g$j")) :+
          count(lit(1L)).as("n")
        val row = mat.agg(aggs.head, aggs.tail: _*).head()
        val n = row.getLong(Dim)
        require(n > 0, "QualityModel.train: empty training input " +
          "(docs has no rows) — cannot take a gradient step")
        w = Array.tabulate(Dim)(j => w(j) - (row.getLong(j) / n) / lrDen)
        history += w.clone()
        i += 1
      }
      history.toSeq
    } finally Lifecycle.release(mat)
  }

  /** Score documents under a trained weight vector:
    * (input columns) + quality_ppm = ŷ. One scan, all codegen'd
    * literals. */
  def score(docs: DataFrame, textCol: String, w: Array[Long]): DataFrame = {
    require(w.length == Dim, s"dim ${w.length}")
    features(docs.withColumn("__lbl", lit(0L)), textCol, "__lbl")
      .withColumn("quality_ppm", predictionExpr(w))
      .drop(("__lbl" +: "y" +: (0 until Dim).map(j => s"f$j")): _*)
  }
}
