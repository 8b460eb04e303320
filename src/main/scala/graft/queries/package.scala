package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

package object queries {

  /** One registered operator/query: the Spark implementation plus (when the
    * semantics are ANSI-SQL-expressible) a DuckDB oracle over the same
    * parquet tables. `oracle = None` → driver records a rows-only check.
    *
    * `benchReps` is the timed-run count the bench harness uses (default 3,
    * medians beat local[32] noise — NOTES r3). The Structured-Streaming
    * family sets 1: their wall time is dominated by per-run harness fixed
    * cost (stream start, checkpoint dir, RocksDB state store, multi-drain
    * replay) that repeats identically every rep, so extra reps buy no
    * signal; the bench guards the single run against contention by
    * comparing it to the query's own warmup time (same fixed cost).
    */
  final case class Q(
      name: String,
      run: (SparkSession, String) => DataFrame,
      oracle: Option[String],
      benchReps: Int = 3)

  /** Exact money arithmetic: parquet doubles carry 2-decimal money values;
    * `cents` lifts them to exact longs so sums/orderings hash-match the
    * DuckDB oracle bit-for-bit (double summation order is engine- and
    * partition-order-dependent; long summation is exact). The SQL twin is
    * `CAST(round(x*100,0) AS BIGINT)`.
    */
  def cents(c: Column): Column = round(c * 100, 0).cast("long")

  /** Exact → double at the very end: one division of an exact long by a
    * constant is bit-deterministic in both engines. */
  def asDollars(sumCents: Column): Column = sumCents.cast("double") / 100.0

  def sqlCents(expr: String): String = s"CAST(round(($expr)*100,0) AS BIGINT)"

  /** Fresh durable-on-purpose working directory for queries that
    * exercise on-disk machinery (q82's dedup index, q83's IVF index),
    * deleted recursively at JVM exit. NOT under Lifecycle.scratchRoot —
    * those queries release scratch mid-run, and anything under the
    * scratch root would be reclaimed out from under them. One static
    * shutdown hook drains the queue: repeated invocations (bench runs
    * each query 4×; long-lived sessions more) must not accumulate one
    * hook Thread per call. */
  private val workDirs = new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()
  private lazy val workDirHook: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      workDirs.forEach { p =>
        try graft.operators.Lifecycle.deleteRecursively(p)
        catch { case _: Throwable => () }
      }))
  private[queries] def tempWorkDir(prefix: String): String = {
    workDirHook
    val p = java.nio.file.Files.createTempDirectory(prefix)
    workDirs.add(p)
    p.toString
  }
}
