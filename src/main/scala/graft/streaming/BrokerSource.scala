package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Broker-shaped streaming source adapter: the record schema is
  * EXACTLY what Spark's Kafka source (`readStream.format("kafka")`)
  * produces — opaque key/value bytes plus (topic, partition, offset,
  * timestamp, timestampType) metadata — so swapping this offline fake
  * for a real broker is a config change at the source line, and every
  * transform downstream of [[jsonEvents]] runs unchanged.
  *
  * The offline stand-in ([[readFakeBrokerStream]]) replays JSON-lines
  * event files through that schema: each line becomes one record whose
  * value is the raw line bytes, keyed and partitioned by user id (the
  * way a producer keyed on user would land events), offset = event id.
  * No broker exists in this sandbox — the adapter boundary, record
  * schema, decode step, and downstream parity are the real thing.
  *
  * Scale notes: the decode ([[jsonEvents]]) is scan-side (`from_json`
  * per record, no shuffle); source parallelism is governed by the
  * broker's partition count exactly as with real Kafka.
  */
object BrokerSource {

  /** Verbatim Spark-Kafka source schema. */
  val recordSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  /** Offline fake broker: JSON-lines event files under `dir` re-shaped
    * into broker records. Works as a stream (`readStream`) — swap this
    * call for `spark.readStream.format("kafka").option(...).load()` in
    * a real deployment; the returned schema is identical. */
  def readFakeBrokerStream(spark: SparkSession, dir: String,
      topic: String = "events", nPartitions: Int = 4): DataFrame = {
    val lines = spark.readStream.text(dir)
    wrapLines(lines, topic, nPartitions)
  }

  /** Batch twin over the same files (parity tests, backfills). */
  def readFakeBroker(spark: SparkSession, dir: String,
      topic: String = "events", nPartitions: Int = 4): DataFrame =
    wrapLines(spark.read.text(dir), topic, nPartitions)

  private def wrapLines(lines: DataFrame, topic: String,
      nPartitions: Int): DataFrame = {
    val e = from_json(col("value"), EventStreams.eventSchema)
    lines.select(
      encode(e.getField("user_id").cast("string"), "UTF-8").as("key"),
      encode(col("value"), "UTF-8").as("value"),
      lit(topic).as("topic"),
      pmod(e.getField("user_id"), lit(nPartitions)).cast("int").as("partition"),
      e.getField("event_id").as("offset"),
      e.getField("ts").as("timestamp"),
      lit(0).as("timestampType"))
  }

  /** The consumer decode step: broker records → typed events frame
    * (identical schema to [[EventStreams.readJsonStream]]). Works on
    * batch and streaming frames alike. */
  def jsonEvents(records: DataFrame): DataFrame =
    decodeJson(records, EventStreams.eventSchema)

  /** Generic fake broker over ANY JSON-lines table shape: records keyed
    * and partitioned by `keyField` (the way a producer keyed on it
    * would land them), offset = `offsetField`. Lets any entity stream —
    * documents into [[StreamingDedup]], CDC rows into
    * [[CdcTable]] — ride the verbatim broker record schema, so the
    * real-Kafka swap stays one source line for those pipelines too. */
  def readFakeBrokerStreamJson(spark: SparkSession, dir: String,
      schema: StructType, keyField: String, offsetField: String,
      topic: String = "records", nPartitions: Int = 4,
      options: Map[String, String] = Map.empty): DataFrame = {
    val lines = spark.readStream.options(options).text(dir)
    val e = from_json(col("value"), schema)
    lines.select(
      encode(e.getField(keyField).cast("string"), "UTF-8").as("key"),
      encode(col("value"), "UTF-8").as("value"),
      lit(topic).as("topic"),
      // key-hash partitioning (the way a real producer lands keyed
      // records): casting a string key to long would yield NULL
      // partitions; xxhash64 of NULL is its seed, so even a null key
      // gets a concrete partition
      pmod(xxhash64(e.getField(keyField).cast("string")),
        lit(nPartitions.toLong)).cast("int").as("partition"),
      e.getField(offsetField).cast("long").as("offset"),
      lit(java.sql.Timestamp.valueOf("2020-01-01 00:00:00"))
        .as("timestamp"),
      lit(0).as("timestampType"))
  }

  /** Generic consumer decode: broker records → the typed frame the
    * producer serialized. Batch and streaming alike. */
  def decodeJson(records: DataFrame, schema: StructType): DataFrame =
    records
      .select(from_json(col("value").cast("string"), schema).as("r"))
      .select(col("r.*"))

  /** [[EventStreams.runToMemory]] over the broker adapter: same
    * transform surface, broker-shaped source. */
  def runToMemory(spark: SparkSession, inputDir: String, name: String,
      transform: DataFrame => DataFrame,
      outputMode: org.apache.spark.sql.streaming.OutputMode =
        org.apache.spark.sql.streaming.OutputMode.Append()): DataFrame = {
    val q = transform(jsonEvents(readFakeBrokerStream(spark, inputDir)))
      .writeStream.format("memory").queryName(name)
      .outputMode(outputMode)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }
}
