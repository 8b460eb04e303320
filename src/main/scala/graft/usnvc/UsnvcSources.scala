package graft.usnvc

import org.apache.spark.sql.{DataFrame, SparkSession}

/** TSV sources for the USNVC export (SURVEY §2.1 S1/S2).
  *
  * The reference walks the input dir collecting `*.txt` into a
  * name→path map (`usnvc.py:100-104`) and reads each with
  * `pd.read_csv(sep='\t', encoding='ISO-8859-1')` (`usnvc.py:109-218`).
  * Here: same discovery (driver-side, cheap), but each file becomes a
  * lazily-scanned DataFrame with an explicit schema — Catalyst prunes
  * columns and pushes filters into the CSV scan, and a multi-part file
  * (or a directory of shards at real scale) parallelizes across
  * executors.
  */
object UsnvcSources {

  /** Recursive `*.txt` discovery: file name → absolute path. Later
    * occurrences win, matching `os.walk` overwrite semantics
    * (`usnvc.py:101-104`). A DIRECTORY named `*.txt` is yielded as one
    * table (its shard files scan in parallel) — the multi-part layout a
    * real-scale export lands in; `spark.read.csv` takes either form. */
  def discover(path: String): Map[String, String] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory && !f.getName.endsWith(".txt"))
        Option(f.listFiles()).toSeq.flatten.sortBy(_.getName).flatMap(walk)
      else Seq(f)
    walk(new java.io.File(path))
      .filter(_.getName.endsWith(".txt"))
      .map(f => f.getName -> f.getAbsolutePath)
      .toMap
  }

  /** One TSV table with its pinned schema. The reference reader is
    * pandas-default (quotechar '"', doubled-quote escaping) — mirror
    * that with escape='"' instead of Spark's backslash default. */
  def readTable(spark: SparkSession, file: String, path: String): DataFrame =
    spark.read
      .option("sep", "\t")
      .option("header", "true")
      .option("encoding", "ISO-8859-1")
      .option("escape", "\"")
      .option("mode", "PERMISSIVE")
      .schema(UsnvcSchemas.byFile(file))
      .csv(path)

  /** All discovered tables keyed by file name. */
  def readAll(spark: SparkSession, dir: String): Map[String, DataFrame] = {
    val files = discover(dir)
    UsnvcSchemas.byFile.keys.flatMap { name =>
      files.get(name).map(p => name -> readTable(spark, name, p))
    }.toMap
  }
}
