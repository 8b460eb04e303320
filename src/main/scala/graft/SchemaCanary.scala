package graft

import org.apache.spark.sql.SparkSession

/** Testdata schema preflight. A regenerated /root/testdata once changed
  * events.ts from TIMESTAMP(NANOS) to native micros and silently broke 16
  * queries and 20 tests — the failure surfaced only as missing correctness
  * rows and impossibly-fast bench times, which took a full judge session to
  * diagnose. This canary pins the expected column set and acceptable types
  * per table and turns that class of drift into one loud stderr line at the
  * top of every Verify/Bench run.
  *
  * The pin is deliberately tolerant of *known* generation variants (e.g.
  * events.ts as nanos-long, timestamp, or timestamp_ntz — all handled by
  * [[Tables.events]]) and strict about everything else: a renamed column,
  * a dropped column, or a new physical type fails the check.
  */
object SchemaCanary {

  private val ts = Set("timestamp", "timestamp_ntz")

  /** table -> ordered (column, acceptable Spark simpleString types). */
  val expected: Map[String, Seq[(String, Set[String])]] = Map(
    "region" -> Seq("r_regionkey" -> Set("int"), "r_name" -> Set("string")),
    "nation" -> Seq("n_nationkey" -> Set("int"), "n_name" -> Set("string"),
      "n_regionkey" -> Set("int")),
    "customer" -> Seq("c_custkey" -> Set("bigint"), "c_name" -> Set("string"),
      "c_nationkey" -> Set("int"), "c_acctbal" -> Set("double"),
      "c_mktsegment" -> Set("string")),
    "supplier" -> Seq("s_suppkey" -> Set("bigint"), "s_name" -> Set("string"),
      "s_nationkey" -> Set("int"), "s_acctbal" -> Set("double")),
    "part" -> Seq("p_partkey" -> Set("bigint"), "p_name" -> Set("string"),
      "p_brand" -> Set("string"), "p_type" -> Set("string"),
      "p_size" -> Set("int"), "p_retailprice" -> Set("double")),
    "orders" -> Seq("o_orderkey" -> Set("bigint"), "o_custkey" -> Set("bigint"),
      "o_orderstatus" -> Set("string"), "o_totalprice" -> Set("double"),
      "o_orderdate" -> (ts + "date"), "o_orderpriority" -> Set("string")),
    "lineitem" -> Seq("l_orderkey" -> Set("bigint"), "l_partkey" -> Set("bigint"),
      "l_suppkey" -> Set("bigint"), "l_linenumber" -> Set("int"),
      "l_quantity" -> Set("double"), "l_extendedprice" -> Set("double"),
      "l_discount" -> Set("double"), "l_tax" -> Set("double"),
      "l_returnflag" -> Set("string"), "l_linestatus" -> Set("string"),
      "l_shipdate" -> (ts + "date")),
    "events" -> Seq("event_id" -> Set("bigint"),
      "ts" -> (ts + "bigint"), // bigint = legacy TIMESTAMP(NANOS) via nanosAsLong
      "user_id" -> Set("bigint"), "event_type" -> Set("string"),
      "value" -> Set("double"), "props" -> Set("string")),
    "documents" -> Seq("doc_id" -> Set("bigint"), "text" -> Set("string"),
      "lang" -> Set("string"), "source" -> Set("string"),
      "n_chars" -> Set("bigint")),
    "embeddings" -> Seq("vec_id" -> Set("bigint"),
      "embedding" -> Set("array<float>"), "label" -> Set("int")))

  /** One human-readable drift line per mismatch across all tables;
    * empty = testdata matches the pin. Only reads parquet footers (no
    * data scan), so the preflight is milliseconds. */
  def drift(spark: SparkSession, sfDir: String): Seq[String] = {
    // same legacy flag Tables.events sets, so a nanos-generation file
    // scans as bigint instead of throwing at footer-read time
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Tables.names.flatMap { t =>
      val pin = expected(t)
      try {
        val actual = spark.read.parquet(s"$sfDir/$t.parquet").schema
        val got = actual.fields.map(f => f.name -> f.dataType.simpleString).toMap
        val pinNames = pin.map(_._1).toSet
        val missing = pin.collect { case (c, _) if !got.contains(c) =>
          s"$t.$c: MISSING (expected one of ${pin.toMap.apply(c).mkString("/")})" }
        val extra = actual.fieldNames.filterNot(pinNames).toSeq.map(c =>
          s"$t.$c: UNEXPECTED column of type ${got(c)}")
        val wrongType = pin.collect {
          case (c, ok) if got.contains(c) && !ok(got(c)) =>
            s"$t.$c: type ${got(c)} not in accepted {${ok.mkString(", ")}}" }
        missing ++ extra ++ wrongType
      } catch { case e: Throwable =>
        Seq(s"$t: UNREADABLE (${e.getMessage.linesIterator.next()})")
      }
    }
  }

  /** Verify/Bench preflight: print one loud SCHEMA DRIFT line per
    * mismatch to stderr and return whether the testdata is clean. Never
    * throws — queries over undrifted tables must still run and report. */
  def preflight(spark: SparkSession, sfDir: String): Boolean = {
    val d = drift(spark, sfDir)
    d.foreach(m => System.err.println(s"[canary] SCHEMA DRIFT: $m"))
    if (d.nonEmpty)
      System.err.println(s"[canary] SCHEMA DRIFT: $sfDir deviates from the " +
        s"pinned TESTDATA.md schemas in ${d.size} place(s) — fix Tables.scala " +
        "and SchemaCanary.expected before trusting this round's results")
    d.isEmpty
  }
}
