package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Persisted inverted index: driver-side hash parity with the Spark
  * expression (the routing contract), search semantics, append ≡
  * rebuild, crash-replay idempotency, and the pruned-scan plan shape. */
class InvertedIndexSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(rows: (Long, String)*) = rows.toDF("id", "text")

  test("driver-side portable hash matches the Spark expression") {
    val terms = Seq("merge", "vector", "stream", "a", "ü", "", "x y")
    val viaSpark = terms.toDF("t")
      .select(col("t"), Dedup.stringHash(col("t"), portable = true).as("h"))
      .as[(String, Long)].collect().toMap
    terms.foreach { t =>
      assert(InvertedIndex.portableHashLocal(t) === viaSpark(t), s"term '$t'")
    }
  }

  test("search ranks by matched terms, then summed tf, then id") {
    val dir = java.nio.file.Files.createTempDirectory("inv1").toString
    val c = corpus(
      1L -> "alpha beta alpha",     // 2 terms matched, tf 3
      2L -> "alpha alpha alpha",    // 1 term, tf 3
      3L -> "beta",                 // 1 term, tf 1
      4L -> "gamma delta")          // 0 matched
    InvertedIndex.build(c, "id", "text", nBuckets = 4, dir)
    val got = InvertedIndex.search(InvertedIndex.load(spark, dir),
      Seq("alpha", "beta"), k = 10)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 2L, 3L), (2L, 1L, 3L), (3L, 1L, 1L)))
  }

  test("build(A ∪ B) ≡ build(A); append(B)") {
    val a = corpus(1L -> "x y x", 2L -> "y z")
    val b = corpus(3L -> "x q", 4L -> "z z z")
    val dir1 = java.nio.file.Files.createTempDirectory("inv2a").toString
    val dir2 = java.nio.file.Files.createTempDirectory("inv2b").toString
    InvertedIndex.build(a.unionByName(b), "id", "text", 8, dir1)
    InvertedIndex.build(a, "id", "text", 8, dir2)
    InvertedIndex.append(spark, dir2, b, "id", "text")
    def dump(d: String) = InvertedIndex.load(spark, d).postings
      .select("term", "doc_id", "tf", "bucket")
      .as[(String, Long, Long, Int)].collect().toSet
    assert(dump(dir1) === dump(dir2))
  }

  test("a replayed append overwrites itself (idempotent)") {
    val dir = java.nio.file.Files.createTempDirectory("inv3").toString
    InvertedIndex.build(corpus(1L -> "a b"), "id", "text", 4, dir)
    val batch = corpus(2L -> "b c b")
    def dump() = InvertedIndex.load(spark, dir).postings
      .select("term", "doc_id", "tf", "bucket")
      .as[(String, Long, Long, Int)].collect().toSet
    val id = InvertedIndex.append(spark, dir, batch, "id", "text")
    val once = dump()
    // crash-replay: the same logical batch lands again under the SAME id
    InvertedIndex.append(spark, dir, batch, "id", "text", Some(id))
    val twice = dump()
    assert(once === twice)
    // a NEW batch id for genuinely new docs still appends
    assert(InvertedIndex.nextBatchId(spark, dir) === id + 1)
  }

  test("compactPostings: fold shadows covered batches, serving and " +
      "stats unchanged; vacuum sweeps one cycle later; ids never reissue") {
    val a = corpus(1L -> "x y x", 2L -> "y z")
    val b = corpus(3L -> "x q", 4L -> "z z z")
    val c = corpus(5L -> "q y")
    val dir = java.nio.file.Files.createTempDirectory("invc").toString
    InvertedIndex.build(a, "id", "text", 8, dir)
    InvertedIndex.append(spark, dir, b, "id", "text")
    def dump() = InvertedIndex.load(spark, dir).postings
      .select("term", "doc_id", "tf", "bucket")
      .as[(String, Long, Long, Int)].collect().toSet
    def stats() = InvertedIndex.load(spark, dir).stats
      .agg(sum($"n_docs"), sum($"tot_len"))
      .as[(Long, Long)].head()
    val (before, statsBefore) = (dump(), stats())

    InvertedIndex.compactPostings(spark, dir, upTo = 2L)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def batchDirs(): Int =
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/postings"))
        .count(st => st.isDirectory &&
          st.getPath.getName.startsWith("ingest_batch="))
    // mark-then-sweep: covered batches survive the fold pass (reader
    // grace), serving reads the fold and never double-counts
    assert(batchDirs() == 2)
    assert(dump() == before)
    assert(stats() == statsBefore)
    InvertedIndex.vacuum(spark, dir)
    assert(batchDirs() == 0)
    assert(dump() == before)
    assert(stats() == statsBefore)

    // ids resume ABOVE the boundary; append + search still equal a
    // one-shot rebuild over all three batches
    assert(InvertedIndex.nextBatchId(spark, dir) == 2L)
    InvertedIndex.append(spark, dir, c, "id", "text")
    val oneShot = java.nio.file.Files.createTempDirectory("invc2").toString
    InvertedIndex.build(a.unionByName(b).unionByName(c),
      "id", "text", 8, oneShot)
    def hits(d: String) = InvertedIndex.search(
      InvertedIndex.load(spark, d), Seq("x", "y", "q"), k = 10)
      .as[(Long, Long, Long)].collect().toSeq
    assert(hits(dir) == hits(oneShot))
    assert(InvertedIndex.load(spark, dir).stats
      .agg(sum($"n_docs")).as[Long].head() == 5L)

    // second fold covers fold + new increment; replayed call no-ops on
    // the publish and the superseded fold sweeps one cycle later
    InvertedIndex.compactPostings(spark, dir, upTo = 3L)
    InvertedIndex.compactPostings(spark, dir, upTo = 3L)
    assert(hits(dir) == hits(oneShot))
    InvertedIndex.vacuum(spark, dir)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/gen/gen=2")))
    assert(hits(dir) == hits(oneShot))
  }

  test("phrase search: consecutive positions only, overlaps counted, dup terms") {
    val dir = java.nio.file.Files.createTempDirectory("inv5").toString
    val c = corpus(
      1L -> "x y z x y",   // "x y" occurs at 0 and 3
      2L -> "x z y",       // both terms, never adjacent
      3L -> "y x",         // reversed — no match
      4L -> "a a a")       // dup-term phrase "a a" → 2 occurrences
    InvertedIndex.build(c, "id", "text", nBuckets = 4, dir)
    val idx = InvertedIndex.load(spark, dir)
    val xy = InvertedIndex.phraseSearch(idx, Seq("x", "y"), k = 10)
      .as[(Long, Int)].collect().toSet
    assert(xy === Set((1L, 2)))
    val aa = InvertedIndex.phraseSearch(idx, Seq("a", "a"), k = 10)
      .as[(Long, Int)].collect().toSet
    assert(aa === Set((4L, 2)))
    val xyz = InvertedIndex.phraseSearch(idx, Seq("x", "y", "z"), k = 10)
      .as[(Long, Int)].collect().toSet
    assert(xyz === Set((1L, 1)))
  }

  test("non-positional build: lean schema, search identical, phrase refused") {
    val dirP = java.nio.file.Files.createTempDirectory("inv6p").toString
    val dirN = java.nio.file.Files.createTempDirectory("inv6n").toString
    val c = corpus(1L -> "x y z x y", 2L -> "x z y", 3L -> "y x")
    InvertedIndex.build(c, "id", "text", nBuckets = 4, dirP)
    InvertedIndex.build(c, "id", "text", nBuckets = 4, dirN,
      positions = false)
    val p = InvertedIndex.load(spark, dirP)
    val n = InvertedIndex.load(spark, dirN)
    assert(p.positional && !n.positional)
    assert(!n.postings.columns.contains("positions"))
    // ranked lookup is mode-independent
    def hits(i: InvertedIndex.Index) =
      InvertedIndex.search(i, Seq("x", "y"), k = 10)
        .as[(Long, Long, Long)].collect().toSeq
    assert(hits(p) === hits(n))
    // appends inherit the recorded mode
    InvertedIndex.append(spark, dirN, corpus(9L -> "x q"), "id", "text")
    assert(!InvertedIndex.load(spark, dirN).postings.columns
      .contains("positions"))
    val e = intercept[IllegalArgumentException] {
      InvertedIndex.phraseSearch(n, Seq("x", "y"), k = 10)
    }
    assert(e.getMessage.contains("positional"))
  }

  test("bm25Search off the index ≡ Retrieval.bm25TopK from scratch") {
    val dir = java.nio.file.Files.createTempDirectory("inv7").toString
    val docs = (1L to 60L).map(i =>
      (i, s"alpha ${"beta " * (i % 5).toInt}gamma w$i doc"))
      .toDF("doc_id", "text")
    InvertedIndex.build(docs, "doc_id", "text", nBuckets = 8, dir,
      positions = false)
    val viaIndex = InvertedIndex.bm25Search(
        InvertedIndex.load(spark, dir), Seq("beta", "w7"), k = 10)
      .as[(Long, Long, Long)].collect().toSeq
    val scratch = Retrieval.bm25TopK(docs, "doc_id", "text",
        Seq("beta", "w7"), k = 10)
      .as[(Long, Long, Long)].collect().toSeq
    assert(viaIndex === scratch)
    // incremental: append must fold the new docs into df/stats too
    InvertedIndex.append(spark, dir,
      corpus(1000L -> "beta beta beta"), "id", "text")
    val after = InvertedIndex.bm25Search(
        InvertedIndex.load(spark, dir), Seq("beta", "w7"), k = 10)
      .as[(Long, Long, Long)].collect().toSeq
    val scratchAfter = Retrieval.bm25TopK(
        docs.unionByName(corpus(1000L -> "beta beta beta")
          .toDF("doc_id", "text")),
        "doc_id", "text", Seq("beta", "w7"), k = 10)
      .as[(Long, Long, Long)].collect().toSeq
    assert(after === scratchAfter)
  }

  test("search scan prunes non-probed bucket partitions") {
    val dir = java.nio.file.Files.createTempDirectory("inv4").toString
    val big = (1L to 200L).map(i => (i, s"term$i common")).toDF("id", "text")
    InvertedIndex.build(big, "id", "text", nBuckets = 16, dir)
    val plan = InvertedIndex.search(InvertedIndex.load(spark, dir),
      Seq("term7", "term8"), k = 5)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("PartitionFilters") &&
      "bucket#\\d+ (IN|=)".r.findFirstIn(plan).isDefined,
      s"expected a literal bucket partition filter in:\n$plan")
  }
}
