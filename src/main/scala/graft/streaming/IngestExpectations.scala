package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming ingest expectations — the DLT-style quality contract in
  * front of a training-data ingest ([[graft.operators.Validation]] ×
  * [[graft.operators.Observe]], composed on a live stream):
  *
  *  - every row is tested against a set of named EXPECTATIONS (boolean
  *    predicates; a NULL result counts as a violation, like SQL CHECK);
  *  - failing rows are ROUTED to a quarantine sink carrying the names
  *    of the expectations they failed — never dropped silently, so a
  *    bad upstream schema change is diagnosable from the quarantine
  *    instead of a row-count mystery;
  *  - clean rows continue to the main sink untouched;
  *  - per-micro-batch metrics (row count + one violation counter per
  *    expectation) ride the batch itself via `observe` — readable from
  *    `StreamingQueryProgress.observedMetrics` by an alerting hook,
  *    never a second pass over the data.
  *
  * Scale: [[annotate]] is one projected CASE per expectation (codegen,
  * no shuffle); the split is two filtered writes of each micro-batch.
  * The batch is cached for the two passes — cost ∝ batch, the same
  * contract as every foreachBatch sink in this package. The CLEAN side
  * — the full ingest volume — writes at the batch's own parallelism by
  * default (a `coalesce(1)` there would serialize every ingested byte
  * through one task's parquet encoder, capping throughput at one core
  * regardless of cluster size); only the expected-tiny quarantine side
  * defaults to a single file, and both are tunable per sink.
  */
object IngestExpectations {

  /** One named expectation: rows where `valid` is true (and only
    * those) pass. */
  final case class Expectation(name: String, valid: Column)

  val FailedCol = "__failed_expectations"

  /** Annotate each row with the array of expectation names it FAILS
    * (empty array = clean). NULL predicate results fail: an
    * expectation that cannot be evaluated has not been met. */
  def annotate(df: DataFrame, exps: Seq[Expectation]): DataFrame = {
    require(exps.nonEmpty && exps.map(_.name).distinct.size == exps.size,
      "expectations need at least one entry with distinct names")
    df.withColumn(FailedCol, array_compact(array(exps.map(e =>
      when(!coalesce(e.valid, lit(false)), lit(e.name))): _*)))
  }

  /** Per-batch observation columns: total rows + one violation count
    * per expectation, named `viol_<name>`. */
  def metricCols(exps: Seq[Expectation]): Seq[Column] =
    count(lit(1)).as("n_rows") +: exps.map(e =>
      sum(when(!coalesce(e.valid, lit(false)), 1L).otherwise(0L))
        .as(s"viol_${e.name}"))

  /** Attach the expectation gate to a streaming frame: clean rows
    * append to `cleanDir`, failing rows (annotated with their failed
    * expectation names) to `quarantineDir`, metrics to the query's
    * progress events. `label(batch)` stamps each written row — pass
    * the drain/step label for replay-gated tests, or a batch-id cast
    * for production lineage.
    *
    * Writer parallelism: `cleanParts`/`quarantineParts` cap the write
    * task count per sink (`None` = the batch's own partitioning). The
    * clean path defaults to full parallelism — it carries the entire
    * ingest volume; the quarantine defaults to one file per batch —
    * it is expected-tiny and read by humans. */
  def attach(stream: DataFrame, exps: Seq[Expectation],
      cleanDir: String, quarantineDir: String, checkpointDir: String,
      label: () => Int = () => 0,
      cleanParts: Option[Int] = None,
      quarantineParts: Option[Int] = Some(1)): StreamingQuery = {
    def capped(df: DataFrame, parts: Option[Int]): DataFrame =
      parts.fold(df)(df.coalesce)
    val observed = stream.observe("expectations", metricCols(exps).head,
      metricCols(exps).tail: _*)
    observed.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val ann = annotate(batch, exps)
          .withColumn("step", lit(label())).persist()
        try {
          capped(ann.filter(size(col(FailedCol)) > 0)
            .withColumn("failed", concat_ws(",", col(FailedCol)))
            .drop(FailedCol), quarantineParts)
            .write.mode("append").parquet(quarantineDir)
          capped(ann.filter(size(col(FailedCol)) === 0).drop(FailedCol),
            cleanParts)
            .write.mode("append").parquet(cleanDir)
        } finally ann.unpersist()
        ()
      }
      .start()
  }
}
