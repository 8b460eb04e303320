package graft.streaming

import graft.SparkSpec
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Batch/stream parity for the document pipeline: the scan-side MinHash
  * signature must equal the aggregation-form signature bit-for-bit, and
  * the streaming stateful LSH bucket matcher must produce exactly the
  * batch self-join's candidate set — including across micro-batch
  * boundaries (state carries buckets between files). */
class DocStreamsSpec extends SparkSpec {

  private val corpus: Seq[(Long, String)] = Seq(
    1L -> "the quick brown fox jumps over the lazy dog and runs far away today",
    2L -> "the quick brown fox jumps over the lazy dog and runs far away now",
    3L -> "completely different content with nothing shared at all here folks",
    4L -> "the quick brown fox jumps over the lazy dog and runs far away today",
    5L -> "another unrelated document about spark query engines and shuffles",
    6L -> "another unrelated document about spark query engines and shuffling")

  private def docsDF = {
    import spark.implicits._
    corpus.toDF("doc_id", "text")
  }

  test("scan-side MinHash signature equals the aggregation-form signature") {
    val agg = Dedup.minHashSignatures(docsDF, "doc_id", "text",
      shingleN = 3, numHashes = 64, seed = 42L, portable = false)
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val scan = Dedup.withMinHashSignature(docsDF, "doc_id", "text",
      shingleN = 3, numHashes = 64, seed = 42L, portable = false)
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(agg.keySet == scan.keySet)
    agg.keySet.foreach(k => assert(agg(k) == scan(k), s"doc $k signature drifted"))
  }

  test("streaming LSH candidates == batch candidates, across micro-batches") {
    import spark.implicits._
    val batchPairs = Dedup.lshCandidatePairs(
      Dedup.minHashSignatures(docsDF, "doc_id", "text",
        shingleN = 3, numHashes = 64, seed = 42L, portable = false),
      "doc_id", bands = 16, rows = 4, portable = false)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batchPairs.nonEmpty) // fixture must actually exercise collisions
    assert(batchPairs.contains((1L, 4L))) // identical docs always collide

    // two files -> two micro-batches: docs 1-3 arrive first, then 4-6;
    // pair (1,4) spans the boundary and only exists if state carries over
    val dir = java.nio.file.Files.createTempDirectory("docstream")
    def write(name: String, rows: Seq[(Long, String)]): Unit =
      java.nio.file.Files.writeString(dir.resolve(name),
        rows.map { case (id, t) => s"""{"doc_id": $id, "text": "$t"}""" }
          .mkString("", "\n", "\n"))
    write("batch1.json", corpus.take(3))
    write("batch2.json", corpus.drop(3))

    val streamed = DocStreams.runToMemory(spark, dir.toString, "doc_cands",
      df => DocStreams.lshCandidates(DocStreams.banded(df)).toDF())
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batchPairs)
  }

  test("streaming repetition metrics equal the batch operator's") {
    import spark.implicits._
    val batch = DocStreams.repetitionStats(docsDF)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    val dir = java.nio.file.Files.createTempDirectory("docstream_rep")
    java.nio.file.Files.writeString(dir.resolve("all.json"),
      corpus.map { case (id, t) => s"""{"doc_id": $id, "text": "$t"}""" }
        .mkString("", "\n", "\n"))
    val streamed = DocStreams.runToMemory(spark, dir.toString, "doc_rep",
      df => DocStreams.repetitionStats(df))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(streamed == batch)
  }
}
