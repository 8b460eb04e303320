// temp probe (deleted after)
package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.DataMix
import graft.queries._
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $name: ${(System.nanoTime()-t0)/1e9}%.2f s"); r }
    val Seed = 42L
    def cents(c: org.apache.spark.sql.Column) = (c * 100).cast("long")
    val base = Tables.orders(spark, d)
      .select(col("o_orderkey"), col("o_orderstatus"),
        cents(col("o_totalprice")).as("price_cents"))
    val bkt = DataMix.hashBucket(col("o_orderkey"), Seed)
    def op(name: String) = lit(name).as("op")
    val feed1 = base.filter(bkt < 100000)
      .select(op("delete"), col("o_orderkey"), col("o_orderstatus"), col("price_cents"))
      .unionByName(base.filter(bkt >= 100000 && bkt < 200000)
        .select(op("update"), col("o_orderkey"), lit("U").as("o_orderstatus"), col("price_cents")))
      .unionByName(base.filter(bkt >= 200000 && bkt < 300000)
        .select(op("insert"), (col("o_orderkey") + 1000000000L).as("o_orderkey"),
          lit("N").as("o_orderstatus"), col("price_cents")))
    val feed2 = base.filter(bkt >= 300000 && bkt < 350000)
      .select(op("delete"), col("o_orderkey"), col("o_orderstatus"), col("price_cents"))
      .unionByName(base.filter(bkt >= 350000 && bkt < 400000)
        .select(op("update"), col("o_orderkey"), lit("V").as("o_orderstatus"), col("price_cents")))
    val dir = java.nio.file.Files.createTempDirectory("q114probe").toString
    val cdc = new graft.streaming.BucketedCdcTable(spark, dir, "o_orderkey", nBuckets = 8)
    t("publish") { cdc.publish(base) }
    t("applyBatch1") { cdc.applyBatch(feed1) }
    t("applyBatch2") { cdc.applyBatch(feed2) }
    t("read 3 snapshots + agg") {
      (0 to 2).map(g => cdc.snapshotAt(g).withColumn("gen", lit(g.toLong)))
        .reduce(_ unionByName _)
        .groupBy(col("gen"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"), sum(col("price_cents")).as("price_cents"))
        .write.format("noop").mode("overwrite").save()
    }
  }
}
// appended: file-count check
object PlanProbe2 {
  def main(args: Array[String]): Unit = {
    PlanProbe.main(args)
  }
}
