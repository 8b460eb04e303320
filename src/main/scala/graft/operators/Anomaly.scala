package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust per-key outlier detection — the data-quality gate that flags
  * corrupt values (price glitches, unit errors, scraper artifacts)
  * before a batch enters the training mix. The statistic is the
  * median/MAD rule: a value is anomalous when
  *
  *   |v − median(v)| > k · MAD,   MAD = median(|v − median(v)|)
  *
  * chosen over mean/stddev z-scores because both the center and the
  * spread have a 50% breakdown point: the outliers being hunted cannot
  * drag the threshold that is supposed to catch them (one 1e9 glitch
  * row inflates a stddev past usefulness; it moves the MAD not at all).
  *
  * Everything is computed in EXACT integer arithmetic on long inputs
  * (cents, token counts, byte sizes): medians are carried doubled
  * (`lo+hi` of the two middle order statistics — integral whether the
  * count is odd or even), deviations as `d = |2v − med2|` (= 2·|v−med|),
  * the MAD doubled again (`mad4 = 4·MAD`), and the flag test
  * `2·d > k·mad4` multiplies the rule by 4 — no float division, no
  * engine-specific interpolation anywhere, so the whole decision
  * replays bit-for-bit in any engine with integer order statistics.
  *
  * Scale shape: two rank passes (each one shuffle on the key — exact
  * order statistics sort each group, the right tool to ~10⁸ rows per
  * key; beyond that substitute [[Frequency.log2Histogram]] bracketing
  * or approx_percentile and accept the error bound) and two broadcast
  * joins of the per-key stats (|keys| rows) back to the fact stream.
  * Degenerate spread: when >half the values in a key are identical,
  * MAD = 0 and any deviation is flagged — the conventional reading of
  * the rule, documented rather than patched (callers wanting slack add
  * a floor to `mad4`).
  */
object Anomaly {

  /** Doubled median per key via rank arithmetic: value at rank
    * ⌊(n+1)/2⌋ plus value at rank ⌊(n+2)/2⌋ (1-indexed; equal for odd
    * n). Ties in the ordering are harmless — any row at the target
    * rank carries the same value. Output: (key, n, med2). */
  private def doubledMedian(df: DataFrame, keyCol: String, valCol: String,
      outCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(valCol))
    val wk = Window.partitionBy(col(keyCol))
    df.select(col(keyCol), col(valCol))
      .withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("__n", count(lit(1)).over(wk))
      .groupBy(col(keyCol))
      .agg(max(col("__n")).as("n"),
        (min(when(col("__rn") === expr("(__n + 1) div 2"), col(valCol))) +
          min(when(col("__rn") === expr("(__n + 2) div 2"), col(valCol))))
          .as(outCol))
  }

  /** Per-key robust stats + anomaly counts over a long-valued column:
    * (key, n, med2 = 2·median, mad4 = 4·MAD, n_anom, anom_sum).
    * `anom_sum` (the flagged values' exact sum) localizes whether the
    * flags are a few huge glitches or many small ones. */
  def madOutlierStats(df: DataFrame, keyCol: String, value: Column,
      k: Long): DataFrame = {
    val e = df.select(col(keyCol), value.as("__v"))
    val med = doubledMedian(e, keyCol, "__v", "med2")
    val dev = e.join(broadcast(med), keyCol)
      .withColumn("__d", abs(col("__v") * 2L - col("med2")))
    val mad = doubledMedian(dev.select(col(keyCol), col("__d")), keyCol,
      "__d", "mad4").drop("n")
    dev.join(broadcast(mad), keyCol)
      .groupBy(col(keyCol))
      .agg(max(col("n")).as("n"),
        max(col("med2")).as("med2"),
        max(col("mad4")).as("mad4"),
        sum(when(col("__d") * 2L > lit(k) * col("mad4"), 1L).otherwise(0L))
          .as("n_anom"),
        sum(when(col("__d") * 2L > lit(k) * col("mad4"), col("__v"))
          .otherwise(0L)).as("anom_sum"))
  }

  /** Row-level flags (the per-record form feeding a quarantine sink):
    * input rows + (med2, mad4, is_anom). */
  def madFlags(df: DataFrame, keyCol: String, value: Column,
      k: Long): DataFrame = {
    val e = df.withColumn("__v", value)
    val med = doubledMedian(e.select(col(keyCol), col("__v")), keyCol,
      "__v", "med2")
    val dev = e.join(broadcast(med.drop("n")), keyCol)
      .withColumn("__d", abs(col("__v") * 2L - col("med2")))
    val mad = doubledMedian(dev.select(col(keyCol), col("__d")), keyCol,
      "__d", "mad4").drop("n")
    dev.join(broadcast(mad), keyCol)
      .withColumn("is_anom", col("__d") * 2L > lit(k) * col("mad4"))
      .drop("__v", "__d")
  }
}
