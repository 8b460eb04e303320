package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dump `.explain("formatted")` for named queries to files — the
  * before/after plan evidence for the optimization rounds
  * (plans/r14/<query>_{before,after}.txt). Usage:
  *   PlanDump <sfDir> <outDir> <suffix> <query> [query ...]
  * Writes <outDir>/<query>_<suffix>.txt. Queries run first (several
  * gates build on-disk state before returning their result frame), so
  * the dumped plan is the plan of the RETURNED frame, exactly what the
  * bench's noop sink executes.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, suffix, rest @ _*) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // the suite registers these lazily via whichever operator runs
    // first; a single-query dump must register them itself
    graft.functions.VectorFunctions.register(spark)
    graft.functions.BpeFunctions.register(spark)
    graft.functions.BloomFunctions.register(spark)
    new java.io.File(outDir).mkdirs()
    rest.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"),
        df.queryExecution.explainString(ExplainMode.fromString("formatted")))
      println(s"dumped $name")
    }
    spark.stop()
  }
}
