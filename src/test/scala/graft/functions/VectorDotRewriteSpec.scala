package graft.functions

import graft.SparkSpec
import graft.operators.Similarity
import org.apache.spark.sql.functions._

class VectorDotRewriteSpec extends SparkSpec {
  import spark.implicits._

  // parquet-backed so ConvertToLocalRelation can't constant-fold the
  // projection away before the rewrite is visible in the plan
  private def persisted(rows: Seq[(Array[Float], Array[Float])]) = {
    val dir = java.nio.file.Files.createTempDirectory("vdr").toString
    rows.toDF("a", "b").write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  private lazy val df = persisted(Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))))

  test("HOF dot-product fold rewrites to the codegen'd VectorDot") {
    val q = df.select(Similarity.dotHof($"a", $"b").as("d"))
    val opt = q.queryExecution.optimizedPlan.toString
    assert(opt.contains("graft_vector_dot"), opt)
    assert(q.as[Double].head() == 11.0)
  }

  test("deviating folds are left untouched") {
    // different zero → not a dot product; must not rewrite
    val fold = aggregate(
      zip_with($"a".cast("array<double>"), $"b".cast("array<double>"),
        (x, y) => x * y),
      lit(1.0), (acc, x) => acc + x)
    val q = df.select(fold.as("d"))
    assert(!q.queryExecution.optimizedPlan.toString
      .contains("graft_vector_dot"))
    assert(q.as[Double].head() == 12.0)
  }

  test("rewrite preserves null semantics on length mismatch") {
    val mismatched = persisted(Seq((Array(1.0f, 2.0f), Array(3.0f))))
    val q = mismatched.select(Similarity.dotHof($"a", $"b").as("d"))
    assert(q.queryExecution.optimizedPlan.toString
      .contains("graft_vector_dot"))
    assert(q.collect().head.isNullAt(0))
  }
}
