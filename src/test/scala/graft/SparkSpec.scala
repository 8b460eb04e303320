package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for ScalaTest suites: one JVM-wide session
  * (getOrCreate) so suites don't pay repeated startup. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Spark 4.1's checkpoint-file checksumming deadlocks under load:
      // RocksDB upload tasks park forever in
      // ChecksumCancellableFSDataOutputStream.close awaiting checksum
      // futures (observed hanging StateTtlTimerSpec for 30+ min in a
      // long suite run). Corruption detection adds nothing on local
      // tmpfs checkpoints — off for tests.
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.functions.VectorFunctions.register(s)
    s
  }
}
