package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Empty-input robustness: a pipeline stage receiving zero rows (a
  * filter that matched nothing, an empty partition of a backfill) must
  * return an empty/identity result, never throw — iterative operators
  * with driver-side convergence checks are the risk surface. */
class EmptyInputSpec extends SparkSpec {
  import spark.implicits._

  private lazy val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
  private lazy val noEdges = Seq.empty[(Long, Long)].toDF("a", "b")

  test("connected components (both variants) on zero edges") {
    assert(Components.connectedComponents(noEdges, "a", "b").count() == 0)
    assert(Components.connectedComponentsStar(noEdges, "a", "b").count() == 0)
  }

  test("dedup pipelines on an empty corpus") {
    assert(Dedup.ngramJaccardPairs(noDocs, "doc_id", "text", 3, 0.5,
      Some(50)).count() == 0)
    assert(Dedup.minHashPairs(noDocs, "doc_id", "text").count() == 0)
    assert(Dedup.simHashPairs(noDocs, "doc_id", "text").count() == 0)
  }

  test("dropNearDuplicates with no pairs is identity") {
    val docs = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    assert(Components.dropNearDuplicates(docs, "doc_id", noEdges
      .toDF("id_a", "id_b")).count() == 2)
  }

  test("chunking, segment dedup, and hierarchy closure on empty input") {
    assert(Curation.chunk(noDocs, "doc_id", "text", 8, 8).count() == 0)
    val segs = Seq.empty[(Long, Long, String)]
      .toDF("doc_id", "chunk_idx", "chunk_text")
    assert(Curation.dedupSegments(segs, "doc_id", "chunk_idx",
      "chunk_text", " ").count() == 0)
    val noNodes = Seq.empty[(Long, Option[Long])].toDF("id", "parent")
    assert(Hierarchy.ancestorClosure(noNodes, "id", "parent").count() == 0)
  }

  test("upsert with empty changes is identity; empty base takes inserts") {
    val base = Seq((1L, "a")).toDF("k", "v")
    val noChanges = Seq.empty[(String, Long, String)].toDF("op", "k", "v")
    assert(Upsert.applyChanges(base, noChanges, "k").count() == 1)
    val emptyBase = Seq.empty[(Long, String)].toDF("k", "v")
    val ins = Seq(("insert", 2L, "b")).toDF("op", "k", "v")
    assert(Upsert.applyChanges(emptyBase, ins, "k").count() == 1)
  }
}
