package graft

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage-level profiler (temporary; not part of the contract). */
object ProfileScratch {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"STAGE $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val docs = Tables.documents(spark, d)
    // warmup scan
    docs.count()

    val sh = Dedup.shingles(docs, "doc_id", "text", 3)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nSh = t("shingles (materialize persist)")(sh.count())
    println(s"  shingle rows: $nSh")

    val rare = sh.groupBy(col("shingle"))
      .agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= 50)
      .select(col("shingle"))
    val rareSh = sh.join(rare, "shingle")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nRare = t("rare shingles")(rareSh.count())
    println(s"  rare shingle rows: $nRare")

    val candidatePairs = rareSh.alias("a").join(rareSh.alias("b"),
        col("a.shingle") === col("b.shingle") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nCand = t("candidate pairs (self-join + distinct)")(candidatePairs.count())
    println(s"  candidate pairs: $nCand")

    val common = candidatePairs
      .join(sh.select(col("doc_id").as("id_a"), col("shingle")), "id_a")
      .join(sh.select(col("doc_id").as("id_b"), col("shingle")), Seq("id_b", "shingle"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("common"))
    t("common counts")(common.count())

    t("full q19")(
      graft.queries.DedupQueries.ngramJaccard(spark, d).count())

    t("full q20 minhash")(
      graft.queries.DedupQueries.minHashLsh(spark, d).count())

    spark.stop()
  }
}
