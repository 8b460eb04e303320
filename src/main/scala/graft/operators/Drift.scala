package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift measurement between two cohorts (time windows,
  * data sources, pipeline versions) — the monitoring gate a continuous
  * training-data pipeline runs before a new crawl batch is allowed
  * into the mix. The statistic is total-variation distance over
  * [[Frequency.log2Histogram]] bins:
  *
  *   TVD = ½ Σ_bins | cnt_a/n_a − cnt_b/n_b |  ∈ [0, 1]
  *
  * computed EXACTLY in integer arithmetic:
  * Σ |cnt_a·n_b − cnt_b·n_a| is a 64-bit sum (order-free, so the
  * aggregation is partition-order-independent — a float Σ|p−q| is
  * not), divided once by 2·n_a·n_b at the end. Unlike KL/PSI there is
  * no log, no zero-bin epsilon, and no engine-specific libm in the
  * result. Each cohort contributes ≤65 bins per key, so the drift
  * check on two 100 TB cohorts shuffles KBs after the map-side
  * histogram combine.
  *
  * Overflow bound: cnt·n < 2^63 needs cohorts below ~3·10⁹ rows per
  * key; above that, pre-divide counts or lift the products to
  * DECIMAL(38,0) — the sum stays exact either way.
  */
object Drift {

  /** Per-key TVD between cohorts `a` and `b` over the log2-binned
    * value column. Keys present in only one cohort get TVD 1.0 (all
    * mass moved). Output: (key, n_a, n_b, tvd — 6 dp). */
  def tvdLog2(a: DataFrame, b: DataFrame, keyCol: String,
      valCol: String): DataFrame = {
    val ha = Frequency.log2Histogram(a, keyCol, valCol)
      .withColumnRenamed("cnt", "cnt_a")
    val hb = Frequency.log2Histogram(b, keyCol, valCol)
      .withColumnRenamed("cnt", "cnt_b")
    val joined = ha.join(hb, Seq(keyCol, "bin"), "full_outer")
      .select(col(keyCol), col("bin"),
        coalesce(col("cnt_a"), lit(0L)).as("cnt_a"),
        coalesce(col("cnt_b"), lit(0L)).as("cnt_b"))
    val wk = org.apache.spark.sql.expressions.Window.partitionBy(col(keyCol))
    joined
      .withColumn("n_a", sum(col("cnt_a")).over(wk))
      .withColumn("n_b", sum(col("cnt_b")).over(wk))
      .groupBy(col(keyCol), col("n_a"), col("n_b"))
      .agg(sum(abs(col("cnt_a") * col("n_b") - col("cnt_b") * col("n_a")))
        .as("__num"))
      .select(col(keyCol), col("n_a"), col("n_b"),
        when(col("n_a") === 0L || col("n_b") === 0L, lit(1.0))
          .otherwise(round(col("__num").cast("double") /
            (lit(2.0) * col("n_a").cast("double") * col("n_b").cast("double")),
            6)).as("tvd"))
  }
}
