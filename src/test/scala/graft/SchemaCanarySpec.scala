package graft

import java.io.{ByteArrayOutputStream, PrintStream}
import java.nio.file.{Files, Paths}

/** The canary must (a) pass on the driver's real testdata, (b) fire a
  * loud SCHEMA DRIFT stderr line on a mutated copy — proven here by
  * actually mutating one (the round-6 postmortem requirement). */
class SchemaCanarySpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("real testdata matches the pinned schemas") {
    assert(SchemaCanary.drift(spark, sf).isEmpty)
  }

  test("events.ts read path tolerates every pinned generation variant") {
    // the current generation: native micros timestamp
    val df = Tables.events(spark, sf)
    assert(df.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    assert(df.limit(5).count() == 5)
  }

  test("mutated testdata fires one drift line per mismatch, loudly") {
    import spark.implicits._
    val dir = Files.createTempDirectory("canary").toString
    Tables.names.foreach { t =>
      Files.copy(Paths.get(s"$sf/$t.parquet"), Paths.get(s"$dir/$t.parquet"))
    }
    // type drift: events.ts timestamp -> string
    Tables.events(spark, sf)
      .withColumn("ts", $"ts".cast("string"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    // missing column: documents loses n_chars; unexpected: gains extra
    Tables.documents(spark, sf).drop("n_chars")
      .withColumn("extra", org.apache.spark.sql.functions.lit(1))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val drift = SchemaCanary.drift(spark, dir)
    assert(drift.exists(m => m.contains("events.ts") && m.contains("string")))
    assert(drift.exists(_.contains("documents.n_chars")))
    assert(drift.exists(m => m.contains("documents.extra") && m.contains("UNEXPECTED")))
    assert(drift.size == 3, drift.mkString("; "))

    val buf = new ByteArrayOutputStream()
    val old = System.err
    try { System.setErr(new PrintStream(buf, true)); SchemaCanary.preflight(spark, dir) }
    finally System.setErr(old)
    val err = buf.toString
    assert(err.linesIterator.count(_.contains("SCHEMA DRIFT")) == 4) // 3 + summary
  }
}
