package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IngestExpectationsSpec extends SparkSpec {
  import spark.implicits._
  import IngestExpectations._

  private val exps = Seq(
    Expectation("pos", col("v") > 0),
    Expectation("small", col("v") < 100))

  test("annotate: multi-fail arrays; NULL predicate counts as violation") {
    val df = Seq((1L, Some(5)), (2L, Some(-1)), (3L, Some(500)),
      (4L, None)).toDF("id", "v")
    val got = annotate(df, exps)
      .select(col("id"), col(FailedCol))
      .as[(Long, Seq[String])].collect().toMap
    assert(got(1L) == Seq())
    assert(got(2L) == Seq("pos"))          // -1 fails pos, passes small
    assert(got(3L) == Seq("small"))
    assert(got(4L) == Seq("pos", "small")) // NULL fails BOTH
  }

  test("annotate: duplicate names refused") {
    intercept[IllegalArgumentException] {
      annotate(Seq((1L, 1)).toDF("id", "v"),
        Seq(Expectation("a", col("v") > 0), Expectation("a", col("v") < 9)))
    }
  }

  test("clean path writes at the batch's parallelism (no single-task " +
      "funnel); quarantine stays one file per batch") {
    val dir = java.nio.file.Files.createTempDirectory("ingexpp").toString
    val srcDir = s"$dir/in"
    // a multi-file arrival => a multi-partition micro-batch
    (1L to 40L).map(i => (i, if (i % 10 == 0) -1 else 1)).toDF("id", "v")
      .repartition(4).write.mode("append").json(srcDir)
    val q = attach(
      spark.readStream.schema("id LONG, v INT").json(srcDir),
      exps, s"$dir/clean", s"$dir/quar", s"$dir/ckpt")
    try q.processAllAvailable() finally q.stop()
    def parquetFiles(d: String) =
      new java.io.File(d).listFiles().count(_.getName.endsWith(".parquet"))
    // the ingest volume fanned out across write tasks...
    assert(parquetFiles(s"$dir/clean") > 1,
      "clean side must not serialize through one writer task")
    // ...the tiny quarantine did not
    assert(parquetFiles(s"$dir/quar") == 1)
    // and the routed CONTENTS are identical to the single-file protocol
    assert(spark.read.parquet(s"$dir/clean").select($"id")
      .as[Long].collect().toSet == (1L to 40L).filter(_ % 10 != 0).toSet)
    assert(spark.read.parquet(s"$dir/quar").select($"id", $"failed")
      .as[(Long, String)].collect().toSet ==
      (1L to 40L).filter(_ % 10 == 0).map((_, "pos")).toSet)
  }

  test("streaming: routing + per-batch observed metrics over a drain timeline") {
    val dir = java.nio.file.Files.createTempDirectory("ingexp").toString
    val srcDir = s"$dir/in"
    def arrive(rows: Seq[(Long, Int)]): Unit =
      rows.toDF("id", "v").coalesce(1).write.mode("append").json(srcDir)
    arrive(Seq((1L, 5), (2L, -1), (3L, 500)))
    val step = new java.util.concurrent.atomic.AtomicInteger(0)
    val q = attach(
      spark.readStream.schema("id LONG, v INT").json(srcDir),
      exps, s"$dir/clean", s"$dir/quar", s"$dir/ckpt", () => step.get())
    try {
      q.processAllAvailable()
      step.set(1)
      arrive(Seq((4L, 7), (5L, 0)))
      q.processAllAvailable()
    } finally q.stop()

    val clean = spark.read.parquet(s"$dir/clean")
      .select($"step", $"id").as[(Int, Long)].collect().toSet
    assert(clean == Set((0, 1L), (1, 4L)))
    val quar = spark.read.parquet(s"$dir/quar")
      .select($"step", $"id", $"failed").as[(Int, Long, String)]
      .collect().toSet
    assert(quar == Set((0, 2L, "pos"), (0, 3L, "small"), (1, 5L, "pos")))
    // metrics rode the micro-batches themselves (observe, no 2nd pass)
    val metrics = q.recentProgress.toSeq
      .filter(p => p.numInputRows > 0 &&
        p.observedMetrics.containsKey("expectations"))
      .map(_.observedMetrics.get("expectations"))
      .map(m => (m.getAs[Long]("n_rows"), m.getAs[Long]("viol_pos"),
        m.getAs[Long]("viol_small")))
    assert(metrics == Seq((3L, 1L, 1L), (2L, 1L, 0L)))
  }
}
