package graft.usnvc

import org.apache.spark.sql.SparkSession

/** Regenerates the golden-docs lock (`src/test/resources/usnvc/
  * golden_docs.jsonl`) from the CURRENT pipeline over the CURRENT
  * fixtures. Run ONLY when the fixture corpus is deliberately extended
  * (never to paper over an output drift), then REVIEW the diff doc by
  * doc before committing — the regenerated file becomes the byte-exact
  * contract UsnvcPipelineSpec enforces.
  *
  *   sbt "Test/runMain graft.usnvc.GoldenRegen /tmp/golden_docs.jsonl"
  */
object GoldenRegen {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/golden_docs.jsonl")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = Fixtures.writeTo(
      java.nio.file.Files.createTempDirectory("usnvc_golden"))
    val docs = UsnvcPipeline
      .docsJson(spark, dir, UsnvcPipeline.Config(clock = "2018-03-01T00:00:00"))
      .collect().map(r => r.getString(1).toLong -> r.getString(0))
      .sortBy(_._1)
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (docs.map(_._2).mkString("\n") + "\n").getBytes("UTF-8"))
    println(s"wrote ${docs.length} docs to $out")
    spark.stop()
  }
}
