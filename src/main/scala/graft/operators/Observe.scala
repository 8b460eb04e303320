package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Observation}

/** Zero-extra-pass pipeline metrics via `Dataset.observe`
  * (Catalyst's CollectMetrics node): the declared aggregates are
  * computed DURING whatever action consumes the frame — task-side
  * partial aggregation folded into the driver as tasks report — so at
  * 100 TB the scan-level row counts / null rates / sums that every
  * production pipeline wants logged cost ZERO extra scans, shuffles,
  * or jobs. The alternative (a separate `df.agg(...)` pass) re-reads
  * the entire input once per metric set.
  *
  * Semantics worth knowing (and spec-pinned):
  *   - CollectMetrics is a pushdown barrier: filters above it do NOT
  *     push below, so metrics observed on a scan describe the FULL
  *     scan even when downstream keeps 1% of rows. Place the observe
  *     where you want the measurement taken.
  *   - Only deterministic, distinct-free aggregates are accepted —
  *     exactly the mergeable-accumulator restriction any task-side
  *     metric system has.
  *   - Metrics materialize when an action runs; [[Observation.get]]
  *     blocks until then.
  */
object Observe {

  /** Attach named metrics to `df`. Returns the instrumented frame (use
    * it in place of `df` — same rows) and the [[Observation]] handle
    * whose `get` yields the metric map after the first action. */
  def profiled(df: DataFrame, metrics: (String, Column)*)
      : (DataFrame, Observation) = {
    require(metrics.nonEmpty, "profiled needs at least one metric")
    val obs = Observation()
    val named = metrics.map { case (n, c) => c.as(n) }
    (df.observe(obs, named.head, named.tail: _*), obs)
  }
}
