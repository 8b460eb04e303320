package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Source/sink format breadth: the engine reads and writes every
  * columnar/text format Spark ships in-box — parquet (the contract
  * format), ORC, JSON lines, CSV — with schema and values intact, and
  * partitioned-parquet writes prune at the scan. The USNVC pipeline
  * covers the ISO-8859-1 TSV source; this spec covers the rest. */
class FormatsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, "alpha", 1.5, true), (2L, "beta", -2.25, false),
    (3L, "γδ unicode", 0.0, true))
    .toDF("id", "name", "score", "flag")

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("ORC round-trip preserves schema and rows") {
    val dir = tmp("orc")
    df.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    // file-format reads come back nullable — compare names and types
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      df.schema.map(f => (f.name, f.dataType)))
    assert(back.orderBy("id").collect().toSeq == df.orderBy("id").collect().toSeq)
  }

  test("JSON-lines round-trip preserves rows under an explicit schema") {
    val dir = tmp("json")
    df.write.mode("overwrite").json(dir)
    // schema pinned on read: JSON carries no types (inference would
    // widen 0.0 → long elsewhere); explicit StructType is the contract
    val back = spark.read.schema(df.schema).json(dir)
    assert(back.orderBy("id").collect().toSeq == df.orderBy("id").collect().toSeq)
  }

  test("CSV round-trip with header and explicit schema") {
    val dir = tmp("csv")
    df.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true").schema(df.schema).csv(dir)
    assert(back.orderBy("id").collect().toSeq == df.orderBy("id").collect().toSeq)
  }

  test("partitioned parquet write prunes partitions at the scan") {
    val dir = tmp("part")
    df.withColumn("part", pmod($"id", lit(2)))
      .write.mode("overwrite").partitionBy("part").parquet(dir)
    val scan = spark.read.parquet(dir).filter($"part" === 1)
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    assert(scan.select($"id").as[Long].collect().toSet == Set(1L, 3L))
  }

  test("parquet aggregate pushdown answers count/min/max from footer statistics") {
    // a 100 TB COUNT(*)/MIN/MAX should read row-group metadata, not
    // data pages — DS v2 does this when aggregatePushdown is on
    val dir = tmp("aggpush")
    df.write.mode("overwrite").parquet(dir)
    val saved = spark.conf.getOption("spark.sql.parquet.aggregatePushdown")
    val savedV1 = spark.conf.getOption("spark.sql.sources.useV1SourceList")
    try {
      spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
      // v2 path required for aggregate pushdown (v1 file source skips it)
      spark.conf.set("spark.sql.sources.useV1SourceList", "")
      val agg = spark.read.parquet(dir)
        .agg(count(lit(1)).as("n"), min($"id").as("lo"), max($"id").as("hi"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(plan.contains("PushedAggregation"), plan)
      assert("PushedAggregation: \\[\\]".r.findFirstIn(plan).isEmpty, plan)
      assert(agg.as[(Long, Long, Long)].head() == ((3L, 1L, 3L)))
    } finally {
      saved match {
        case Some(v) => spark.conf.set("spark.sql.parquet.aggregatePushdown", v)
        case None => spark.conf.unset("spark.sql.parquet.aggregatePushdown")
      }
      savedV1 match {
        case Some(v) => spark.conf.set("spark.sql.sources.useV1SourceList", v)
        case None => spark.conf.unset("spark.sql.sources.useV1SourceList")
      }
    }
  }
}
