package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class CdcTableSpec extends SparkSpec {
  import spark.implicits._

  test("change stream folds into generation-numbered snapshots") {
    val dir = java.nio.file.Files.createTempDirectory("cdc").toString
    val table = new CdcTable(spark, dir, keyCol = "k")
    table.publish(Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30))
      .toDF("k", "name", "v"))
    assert(table.generation == 0)

    implicit val sqlCtx = spark.sqlContext
    val changes = MemoryStream[(String, Long, String, Int)]
    val q = table.attach(changes.toDF().toDF("op", "k", "name", "v"))
    try {
      changes.addData(("delete", 2L, "b", 0), ("update", 3L, "c2", 33))
      q.processAllAvailable()
      assert(table.snapshot.as[(Long, String, Int)].collect().toSet ==
        Set((1L, "a", 10), (3L, "c2", 33)))

      changes.addData(("insert", 4L, "d", 40))
      q.processAllAvailable()
      assert(table.snapshot.as[(Long, String, Int)].collect().toSet ==
        Set((1L, "a", 10), (3L, "c2", 33), (4L, "d", 40)))
    } finally q.stop()

    // every generation remains readable (time travel / crash safety)
    assert(table.generation >= 2)
    val gen0 = spark.read.parquet(s"$dir/gen=0")
    assert(gen0.count() == 3)
  }

  test("co-maintained aggregate: maintain ≡ recompute over a batch stream") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("cdcagg").toString
    val t = new CdcAggTable(spark, dir, keyCol = "k", groupCol = "g",
      countCol = "n", sumCols = Seq("sv"))
    t.publish(Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L))
      .toDF("k", "g", "sv"))

    implicit val sqlCtx = spark.sqlContext
    val changes = MemoryStream[(String, Long, String, Long)]
    val q = t.attach(changes.toDF().toDF("op", "k", "g", "sv"))
    try {
      changes.addData(("delete", 1L, "", 0L), ("update", 3L, "c", 35L))
      q.processAllAvailable()
      changes.addData(("insert", 9L, "a", 90L), ("delete", 3L, "", 0L))
      q.processAllAvailable()
    } finally q.stop()

    val recomputed = t.table.snapshot.groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("sv")).as("sv"))
      .as[(String, Long, Long)].collect().toSet
    val maintained = t.aggSnapshot
      .as[(String, Long, Long)].collect().toSet
    assert(maintained === recomputed)
    assert(maintained === Set(("a", 2L, 110L))) // b/c died; a grew
  }
}
