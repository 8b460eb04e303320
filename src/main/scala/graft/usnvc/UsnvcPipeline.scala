package graft.usnvc

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end USNVC pipeline: export dir → validated JSON documents +
  * change ledger. Replaces the reference's 2-stage lambda fan-out
  * (`usnvc.py:41-81`, one `preprocess_usnvc` re-scan PER ROW at
  * `usnvc.py:71`) with one batch plan evaluated once — the staging was
  * an artifact of the AWS harness, not of the semantics (SURVEY §2.1
  * S4, §4).
  */
object UsnvcPipeline {

  /** Optional unit cap mirroring the debug truncation the reference
    * shipped (P8, `usnvc.py:60-61`: root + 9 units). None = all units. */
  final case class Config(
      clock: String = "1970-01-01T00:00:00.000000",
      limit: Option[Int] = None)

  /** All documents (root ∪ units) as (source_data struct-or-json,
    * row_id). Unit and root docs have different shapes (the reference
    * root dict has 6 keys, `usnvc.py:223-234`), so the union happens in
    * JSON space. */
  def docsJson(spark: SparkSession, dir: String,
      config: Config = Config()): DataFrame = {
    val ctx = Preprocess(spark, dir)
    val units0 = DocAssembly.unitDocs(ctx, config.clock)
    val units = config.limit.map(units0.limit).getOrElse(units0)
    // level rides alongside as a partition column for the sink: doc
    // consumers that want one classification level read 1/16th of the
    // corpus via partition pruning instead of scanning all docs.
    val asJson = (df: DataFrame, level: Column) => df.select(
      to_json(struct(col("source_data"), col("row_id"))).as("doc"),
      col("row_id"),
      coalesce(level, lit("unknown")).as("level"))
    asJson(DocAssembly.rootDoc(ctx), lit("root"))
      .unionByName(asJson(units, col("source_data.Hierarchy.hierarchylevel")))
  }

  /** S3 validation (`README.md:35-46`): per-row error record, null when
    * the doc conforms to the full draft-07 output schema
    * (`README.md:48-174`) — required `source_data`/`row_id` plus the
    * typed optional `data`/`geometry`/`srid` sections. See
    * [[DocValidation.validateDoc]]. */
  def validated(docs: DataFrame): DataFrame =
    docs.select(col("doc"), col("row_id"), col("level"),
      DocValidation.validateDoc(col("doc")).as("error"))

  /** S6 change ledger (`usnvc.py:55-57,74-77`): one Initialize event
    * per unit and one Process event per document, as a side-output
    * frame (not on the data path). Field parity with the reference's
    * `log_change_event(id, name, desc, fn, source, result)`:
    * Initialize logs `source={}` and the preprocessed unit row as
    * `result` (`usnvc.py:55-57`); Process logs the unit-row payload as
    * `source` (the reference wraps it in a `{'index', 'row'}` staging
    * envelope — a lambda-harness artifact, collapsed here by design)
    * and the assembled document as `result` (`usnvc.py:74-77`). */
  def ledger(spark: SparkSession, dir: String,
      config: Config = Config()): DataFrame = {
    val ctx = Preprocess(spark, dir)
    val rowJson = ctx.nvcsUnits.select(
      col("element_global_id"),
      to_json(struct(ctx.nvcsUnits.columns.toIndexedSeq.map(col): _*))
        .as("__row_json"))
    val init = rowJson.select(
      col("element_global_id").cast("string").as("change_id"),
      lit("Initialize").as("change_name"),
      lit("Load the usnvc data into the engine").as("change_description"),
      lit("process_1").as("function_name"),
      lit("{}").as("source"),
      col("__row_json").as("result"))
    val proc = DocAssembly.unitDocs(ctx, config.clock)
      .join(rowJson,
        col("row_id") === col("element_global_id").cast("long").cast("string"),
        "left")
      .select(
        col("row_id").as("change_id"),
        lit("Process").as("change_name"),
        lit("Process usnvc data").as("change_description"),
        lit("process_2").as("function_name"),
        coalesce(col("__row_json"), lit("{}")).as("source"),
        to_json(col("source_data")).as("result"))
    init.unionByName(proc)
  }

  /** Incremental re-processing (SURVEY §2.7: "Structured Streaming
    * foreachBatch over a file source is sufficient"): a trigger
    * directory is watched for text files whose lines are export-dir
    * paths; each new path is processed by the batch pipeline into
    * `outRoot/<dirname>`. Exactly-once per trigger line via the
    * streaming checkpoint; the relational pipeline itself stays batch.
    */
  def incremental(spark: SparkSession, triggerDir: String, outRoot: String,
      checkpoint: String, config: Config = Config()): Unit = {
    val q = spark.readStream.textFile(triggerDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[String], _: Long) =>
        batch.collect().foreach { exportDir =>
          val name = new java.io.File(exportDir).getName
          run(spark, exportDir, s"$outRoot/$name", config)
        }
      }
      .start()
    q.awaitTermination()
  }

  /** Write validated docs (JSON lines `{source_data, row_id}`) and the
    * error sidecar. Null keys are omitted by the JSON writer, matching
    * the reference's NaN-key-dropping (SURVEY §1.2). */
  def run(spark: SparkSession, dir: String, outDir: String,
      config: Config = Config()): Unit = {
    val v = validated(docsJson(spark, dir, config)).cache()
    v.filter(col("error").isNull).select(col("doc"), col("level"))
      .write.mode("overwrite").partitionBy("level").text(s"$outDir/docs")
    v.filter(col("error").isNotNull).select(col("row_id"), col("error"))
      .write.mode("overwrite").json(s"$outDir/errors")
    v.unpersist()
  }
}
