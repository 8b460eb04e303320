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
