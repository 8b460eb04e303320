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

  test("r7 additions on empty input: diff, anomaly, rank, ivm, prefix join") {
    val noKeyed = Seq.empty[(Long, String, Long)].toDF("k", "g", "sv")
    // diff of two empty snapshots, and empty-vs-nonempty
    assert(Diff.snapshotDiff(noKeyed, noKeyed, Seq("k")).count() == 0)
    val one = Seq((1L, "a", 10L)).toDF("k", "g", "sv")
    assert(Diff.snapshotDiff(noKeyed, one, Seq("k"))
      .select("status").as[String].collect().toSeq == Seq("added"))
    // anomaly stats over zero rows
    assert(Anomaly.madOutlierStats(noKeyed, "g", col("sv"), 5L).count() == 0)
    // pagerank over zero edges
    assert(GraphRank.pageRankScaled(noEdges.toDF("src", "dst"),
      "src", "dst", 3).count() == 0)
    // ivm with an empty feed is identity on the aggregate
    val agg0 = one.groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("sv")).as("sv"))
    val noFeed = Seq.empty[(String, Long, String, Long)]
      .toDF("op", "k", "g", "sv")
    assert(Ivm.maintainSumCountAgg(agg0, one, noFeed, "k", "op", "g",
      "n", Seq("sv")).as[(String, Long, Long)].collect().toSeq ==
      Seq(("a", 1L, 10L)))
    // prefix join over an empty corpus
    assert(Dedup.prefixJaccardPairs(noDocs, "doc_id", "text", 3,
      4L, 5L).count() == 0)
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
