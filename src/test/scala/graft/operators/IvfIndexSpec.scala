package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._

/** Persisted-IVF lifecycle: build → load → query must return exactly
  * the unindexed multi-probe result, and the probed query's scan must
  * actually prune unprobed cluster partitions. */
class IvfIndexSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  private lazy val indexPath = {
    val p = java.nio.file.Files.createTempDirectory("ivf_index").toString
    IvfIndex.build(Tables.embeddings(spark, d),
      "vec_id", "embedding", "label", p)
    p
  }

  test("index topK equals the unindexed multi-probe result") {
    val emb = Tables.embeddings(spark, d)
    val queries = emb.filter(col("vec_id") < 20)
    val expected = Similarity.ivfTopKProbed(emb, queries,
      "vec_id", "embedding", "label", k = 5, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      .toSet
    val idx = IvfIndex.load(spark, indexPath, "vec_id", "embedding", "label")
    val got = IvfIndex.topK(idx, queries, k = 5, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      .toSet
    assert(got == expected)
  }

  test("probed scan prunes unprobed cluster partitions") {
    val emb = Tables.embeddings(spark, d)
    // a single query with nprobe=2 can touch at most 2 of the 10 clusters
    val oneQuery = emb.filter(col("vec_id") === 0)
    val idx = IvfIndex.load(spark, indexPath, "vec_id", "embedding", "label")
    val plan = IvfIndex.topK(idx, oneQuery, k = 5, nprobe = 2)
      .queryExecution.executedPlan.toString()
    // the vectors scan must carry a literal partition filter on the
    // cluster col (plan prints it as `label#NNN IN (a,b)`)
    assert(plan.contains("PartitionFilters") &&
      "label#\\d+ IN \\(".r.findFirstIn(plan).isDefined,
      s"expected a literal cluster partition filter in:\n$plan")
  }

  test("topK leaves no cached frames behind (long-lived session safety)") {
    val emb = Tables.embeddings(spark, d)
    val queries = emb.filter(col("vec_id") < 20)
    val idx = IvfIndex.load(spark, indexPath, "vec_id", "embedding", "label")
    // delta-based: the test session is JVM-shared, so other suites'
    // (legitimately) persisted frames may already be registered
    val before = spark.sparkContext.getPersistentRDDs.keySet
    (1 to 3).foreach { _ =>
      IvfIndex.topK(idx, queries, k = 5, nprobe = 2).count()
    }
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"topK leaked cached RDDs: $leaked")
  }

  test("build precomputes norms so queries add no norm scan column") {
    val idx = IvfIndex.load(spark, indexPath, "vec_id", "embedding", "label")
    assert(idx.vectors.columns.contains("__norm"))
    val n = idx.vectors.filter(col("vec_id") === 0).select(col("__norm"))
      .collect().head.getDouble(0)
    assert(n > 0.0)
  }
}
