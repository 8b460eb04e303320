package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Broker-adapter parity: the EXISTING streaming transforms must
  * produce identical results whether events arrive via the plain file
  * source ([[EventStreams.readJsonStream]]) or via the broker-shaped
  * adapter ([[BrokerSource]]) — proving a real-Kafka swap is a config
  * change at the source line, not a pipeline rewrite. */
class BrokerSourceSpec extends SparkSpec {
  import spark.implicits._

  private lazy val jsonDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("events_broker").toString
    Tables.events(spark, "/root/testdata/sf0.001")
      .coalesce(2).write.mode("overwrite").json(dir)
    dir
  }
  private lazy val batchEvents =
    spark.read.schema(EventStreams.eventSchema).json(jsonDir)

  test("broker records carry the verbatim Kafka source schema") {
    val rec = BrokerSource.readFakeBroker(spark, jsonDir)
    assert(rec.schema.map(f => (f.name, f.dataType)) ==
      BrokerSource.recordSchema.map(f => (f.name, f.dataType)))
    // offsets are unique within a partition (the broker invariant
    // consumers rely on)
    val n = rec.count()
    assert(rec.select(col("partition"), col("offset")).distinct().count() == n)
    assert(n == batchEvents.count())
  }

  test("decode step reproduces the typed event frame exactly") {
    val viaBroker = BrokerSource.jsonEvents(
      BrokerSource.readFakeBroker(spark, jsonDir))
    assert(viaBroker.schema == batchEvents.schema)
    assert(viaBroker.exceptAll(batchEvents).count() == 0)
    assert(batchEvents.exceptAll(viaBroker).count() == 0)
  }

  test("hourly counts over the adapter equal the file-source stream") {
    val broker = BrokerSource.runToMemory(spark, jsonDir, "bk_hourly",
      EventStreams.hourlyCounts, OutputMode.Complete())
      .as[(java.sql.Timestamp, String, Long, Long)].collect().toSet
    val file = EventStreams.runToMemory(spark, jsonDir, "fl_hourly",
      EventStreams.hourlyCounts, OutputMode.Complete())
      .as[(java.sql.Timestamp, String, Long, Long)].collect().toSet
    assert(broker == file)
    assert(broker.nonEmpty)
  }

  test("session windows over the adapter equal the file-source stream") {
    val broker = BrokerSource.runToMemory(spark, jsonDir, "bk_sessions",
      EventStreams.sessionWindows, OutputMode.Complete())
      .as[(java.sql.Timestamp, Long, Long, Long)].collect().toSet
    val file = EventStreams.runToMemory(spark, jsonDir, "fl_sessions",
      EventStreams.sessionWindows, OutputMode.Complete())
      .as[(java.sql.Timestamp, Long, Long, Long)].collect().toSet
    assert(broker == file)
    assert(broker.nonEmpty)
  }

  test("stream-static enrichment over the adapter equals the file-source stream") {
    val tiers = spark.range(0, 1000)
      .selectExpr("id AS user_id",
        "CASE pmod(id, 3) WHEN 0 THEN 'gold' WHEN 1 THEN 'silver' ELSE 'bronze' END AS tier")
    val broker = BrokerSource.runToMemory(spark, jsonDir, "bk_enriched",
      EventStreams.enrichedTotals(_, tiers), OutputMode.Complete())
      .as[(String, Long, Long)].collect().toSet
    val file = EventStreams.runToMemory(spark, jsonDir, "fl_enriched",
      EventStreams.enrichedTotals(_, tiers), OutputMode.Complete())
      .as[(String, Long, Long)].collect().toSet
    assert(broker == file)
  }

  test("string-keyed record shapes get non-null key-hash partitions") {
    // regression: partitioning by key.cast(long) sent every non-numeric
    // key to partition NULL, breaking the keyed-partitioning invariant
    val dir = java.nio.file.Files.createTempDirectory("bk_str").toString
    val lines = (0 until 24).map(i => s"""{"k":"user-${i % 8}","i":$i}""")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "r.json"),
      lines.mkString("\n").getBytes("UTF-8"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("i",
        org.apache.spark.sql.types.LongType)))
    val rec = BrokerSource.readFakeBrokerStreamJson(spark, dir, schema,
      keyField = "k", offsetField = "i")
    val q = rec.writeStream.format("memory").queryName("bk_strkey")
      .outputMode(OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val rows = spark.table("bk_strkey")
      .select(decode(col("key"), "UTF-8"), col("partition"))
      .as[(String, Option[Int])].collect()
    assert(rows.length == 24)
    assert(rows.forall { case (_, p) => p.exists(v => v >= 0 && v < 4) })
    // a producer's key hash is a function of the key alone
    assert(rows.groupBy(_._1).values
      .forall(_.map(_._2).distinct.size == 1))
  }

  test("keyed state (running user totals) over the adapter equals batch totals") {
    val updates = BrokerSource.runToMemory(spark, jsonDir, "bk_totals",
      df => EventStreams.runningUserTotals(
        df.as[EventStreams.Event]).toDF(),
      OutputMode.Update())
      .as[(Long, Long, Long)].collect()
    // update mode may emit per micro-batch; the FINAL state per user is
    // the row with the highest event count
    val finalTotals = updates.groupBy(_._1).map { case (_, rows) =>
      rows.maxBy(_._2)
    }.toSet
    val batch = batchEvents.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100, 0).cast("long")).as("total_cents"))
      .as[(Long, Long, Long)].collect().toSet
    assert(finalTotals == batch)
  }
}
