package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's testdata contract (TESTDATA.md): one parquet
  * file per table under an sf-dir. Centralized so every operator/query
  * reads through the same path (column pruning + filter pushdown reach the
  * parquet scan via Catalyst; nothing is cached here — callers decide).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Register every table as a temp view (SQL-surface entry point):
    * after this, `spark.sql` queries run against the same loaders —
    * one view per table, named as in TESTDATA.md. Registration is
    * fault-isolated per table: one unreadable/drifted table must not
    * take down queries that never touch it (a drifted events file once
    * broke q39, whose SQL reads only lineitem, because registration
    * eagerly analyzed every frame in one loop). */
  def registerViews(s: SparkSession, d: String): Unit =
    names.foreach { n =>
      try {
        val df = if (n == "events") events(s, d) else load(s, d, n)
        df.createOrReplaceTempView(n)
      } catch { case e: Throwable =>
        System.err.println(s"[tables] view '$n' not registered: ${e.getMessage}")
      }
    }

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** events.ts has drifted across testdata generations: early ones wrote
    * parquet TIMESTAMP(NANOS) (which Spark 4 only reads via the
    * nanos-as-long legacy flag), current ones write native micros
    * (surfacing as TIMESTAMP_NTZ). Branch on the *scanned* type so any
    * generation loads, always normalizing to TimestampType — sessions
    * run UTC, so the NTZ→LTZ cast is a pure reinterpretation and
    * matches DuckDB's native read bit-for-bit. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case TimestampType    => raw
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case LongType         => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case other => sys.error(
        s"events.ts: unsupported parquet type $other (expected timestamp or nanos-long)")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
