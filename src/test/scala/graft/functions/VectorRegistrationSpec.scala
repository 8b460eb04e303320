package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.functions._

/** Fresh-session safety for every vector-operator entry point: each
  * must register the vector-dot expression ITSELF, not ride on some
  * earlier operator having registered it in the shared session. The
  * failure mode is nasty — an AnalysisException only when the operator
  * happens to run first, which the swallow-and-continue bench reported
  * as an impossibly fast time instead of an error (q81, round 5). Each
  * test drops the function first to simulate a fresh session. */
class VectorRegistrationSpec extends SparkSpec {
  import spark.implicits._

  private def dropDot(): Unit = {
    spark.sessionState.functionRegistry
      .dropFunction(FunctionIdentifier(VectorFunctions.dotName))
    spark.sessionState.functionRegistry
      .dropFunction(FunctionIdentifier(VectorFunctions.dotLongName))
  }

  private lazy val docs = Seq(
    (1L, "a b c d e f g h i j k l", "P1"),
    (2L, "m n o p q r s t u v w x", "P2")
  ).toDF("doc_id", "text", "payload")

  test("StreamingDedup.fusedBlocks self-registers") {
    dropDot()
    val blocks = graft.streaming.StreamingDedup.fusedBlocks(
      "doc_id", "text", "payload_bin", dim = 8)(
      docs.withColumn("payload_bin", encode(col("payload"), "UTF-8")))
    assert(blocks.count() > 0)
  }

  test("IvfIndex.build self-registers") {
    dropDot()
    val dir = java.nio.file.Files.createTempDirectory("ivf_reg").toString
    val corpus = spark.range(0, 20).select(col("id"),
      array((0 until 4).map(i => (col("id") + i).cast("float")): _*)
        .as("vec"), (col("id") % 2).as("cluster"))
    graft.operators.IvfIndex.build(corpus, "id", "vec", "cluster", dir)
    assert(spark.read.parquet(s"$dir/vectors").count() == 20)
  }

  test("Fusion.imageTextNearDupPairs self-registers") {
    dropDot()
    val pairs = graft.operators.Fusion.imageTextNearDupPairs(
      docs.withColumn("payload_bin", encode(col("payload"), "UTF-8")),
      "doc_id", "text", "payload_bin", dim = 8, minFused = 0.0)
    assert(pairs.count() >= 0)
  }

  test("Similarity entry points self-register") {
    dropDot()
    val emb = spark.range(0, 30).select(col("id"),
      array((0 until 4).map(i => ((col("id") + 1) * (i + 1)).cast("float")): _*)
        .as("vec"))
    val knn = graft.operators.Similarity.bruteForceTopK(
      emb, emb.limit(3), "id", "vec", k = 2)
    assert(knn.count() > 0)
  }

  test("Similarity.quantizedTopK self-registers, native dot equals HOF twin") {
    dropDot()
    val emb = spark.range(0, 30).select(col("id"),
      array((0 until 4).map(i =>
        (sin(col("id") * (i + 3))).cast("float")): _*).as("vec"))
    val knn = graft.operators.Similarity.quantizedTopK(
      emb, emb.limit(3), "id", "vec", k = 2)
    assert(knn.count() > 0)
    // exactness: the codegen'd integer dot is the HOF fold, bit for bit
    val qz = graft.operators.Similarity.scalarQuantize(emb, "id", "vec")
    val both = qz.alias("a").join(qz.alias("b"), col("a.id") < col("b.id"))
      .select(
        graft.operators.Similarity.quantizedDot(
          col("a.__qvec"), col("b.__qvec")).as("native"),
        graft.operators.Similarity.quantizedDotHof(
          col("a.__qvec"), col("b.__qvec")).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
  }
}
