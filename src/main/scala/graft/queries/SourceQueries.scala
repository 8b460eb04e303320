package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** DataSource V2 coverage: the [[graft.sources.TsvTableProvider]]
  * connector proven end-to-end under the oracle gate — documents
  * columns exported to a sharded TSV directory, read back through the
  * custom source (typed schema + column pruning into the parser), and
  * aggregated; the oracle computes the same aggregate straight off the
  * parquet table, so any parsing/typing/pruning defect in the
  * connector breaks the hash. */
object SourceQueries {

  /** q172: parquet → TSV shards → graft-tsv scan → per-lang aggregate.
    * Only (lang, n_chars, source) survive pruning; doc_id is exported
    * but never parsed — the pruned-parse path is the one under test. */
  def tsvRoundtrip(s: SparkSession, d: String): DataFrame = {
    val dir = tempWorkDir("graft_tsv") + "/docs"
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .write.mode("overwrite")
      .option("sep", "\t").option("header", "true")
      // doubled-quote dialect, not the csv default backslash escape:
      // graft-tsv parses RFC 4180, so both sides must speak it if a
      // future lang/source value ever carries a quote or tab
      .option("quote", "\"").option("escape", "\"")
      .csv(dir)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("lang", StringType),
      StructField("source", StringType), StructField("n_chars", LongType)))
    s.read.format("graft-tsv").schema(schema)
      .option("charset", "UTF-8")
      .load(dir)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("chars_sum"),
        countDistinct(col("source")).as("n_sources"))
  }

  val tsvRoundtripSql: String =
    """SELECT lang, count(*) AS n_docs,
      |  (sum(n_chars))::BIGINT AS chars_sum,
      |  count(DISTINCT source) AS n_sources
      |FROM documents GROUP BY 1""".stripMargin

  /** q174: the connector's WRITE path under the gate — documents
    * exported through the graft-tsv DSv2 writer (task-temp +
    * driver-commit, QUOTE_MINIMAL encoding), read back through its
    * reader, and checksummed per lang INCLUDING a portable text hash
    * sum, so any byte lost or altered in the encode/decode roundtrip
    * breaks the hash against the parquet oracle. */
  def tsvWriteRoundtrip(s: SparkSession, d: String): DataFrame = {
    val dir = tempWorkDir("graft_tsv_w") + "/docs"
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("text"), col("n_chars"))
      .write.format("graft-tsv").mode("overwrite")
      .option("charset", "UTF-8").save(dir)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("lang", StringType),
      StructField("text", StringType), StructField("n_chars", LongType)))
    s.read.format("graft-tsv").schema(schema)
      .option("charset", "UTF-8").load(dir)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("chars_sum"),
        sum(pmod(graft.operators.Dedup.stringHash(col("text"),
          portable = true), lit(1000000007L))).as("text_hash_sum"))
  }

  val tsvWriteRoundtripSql: String =
    """SELECT lang, count(*) AS n_docs,
      |  (sum(n_chars))::BIGINT AS chars_sum,
      |  (sum(('0x'||substr(md5(text),1,15))::BIGINT % 1000000007))::BIGINT
      |    AS text_hash_sum
      |FROM documents GROUP BY 1""".stripMargin

  def all: Seq[Q] = Seq(
    Q("q172_dsv2_tsv_roundtrip", tsvRoundtrip, Some(tsvRoundtripSql)),
    Q("q174_dsv2_tsv_write", tsvWriteRoundtrip, Some(tsvWriteRoundtripSql)))
}
