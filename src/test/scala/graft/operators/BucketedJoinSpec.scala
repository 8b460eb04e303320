package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

class BucketedJoinSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("bucketed").toString

  private def exchanges(df: DataFrame): Int = {
    df.collect() // settle AQE's final plan
    collectWithSubqueries(df.queryExecution.executedPlan) {
      case e: ShuffleExchangeLike => e
    }.size
  }

  test("co-bucketed tables join with zero exchanges; result equals plain join") {
    val fact = (1L to 500L).map(i => (i % 60, i)).toDF("k", "v")
    val dim = (0L until 60L).map(i => (i, s"d$i")).toDF("k", "name")
    val root = tmp()
    Layout.bucketedWrite(fact, "bspec_fact", "k", 8, s"$root/f")
    Layout.bucketedWrite(dim, "bspec_dim", "k", 8, s"$root/d")
    // broadcast off so the join must prove co-location, not hide it
    withBroadcastOff {
      val joined = spark.table("bspec_fact")
        .join(spark.table("bspec_dim"), "k")
      assert(exchanges(joined) == 0, joined.queryExecution.executedPlan)
      val expected = fact.join(dim, "k")
      assert(joined.exceptAll(expected).isEmpty &&
        expected.exceptAll(joined).isEmpty)
    }
  }

  test("negative control: one unbucketed side shuffles") {
    val fact = (1L to 500L).map(i => (i % 60, i)).toDF("k", "v")
    val dim = (0L until 60L).map(i => (i, s"d$i")).toDF("k", "name")
    val root = tmp()
    Layout.bucketedWrite(fact, "bspec_fact2", "k", 8, s"$root/f")
    withBroadcastOff {
      val joined = spark.table("bspec_fact2").join(dim, "k")
      assert(exchanges(joined) >= 1)
    }
  }

  test("bucketedWrite leaves one file per bucket") {
    val fact = (1L to 500L).map(i => (i % 60, i)).toDF("k", "v")
    val root = tmp()
    Layout.bucketedWrite(fact, "bspec_fact3", "k", 8, s"$root/f")
    val files = new java.io.File(s"$root/f").listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
    assert(files.length == 8, files.map(_.getName).mkString(", "))
  }

  private def withBroadcastOff[A](body: => A): A = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try body finally spark.conf.set(key, prev)
  }
}
