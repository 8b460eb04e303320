package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** IVF-PQ composite index: recall on clustered data (the corpus shape
  * the operator exists for), the frozen-model append contract, crash
  * replay, and the probed scan's partition pruning. */
class IvfPqSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  /** Planted-cluster corpus (ProfileScratch's "ann" generator shape):
    * center[c] + 1/10-amplitude per-id noise, 8 clusters, 64 dims.
    * Unlike the bench embeddings (residual energy ≈ 99% — no structure
    * for a coarse quantizer to explain), this is the clustered shape
    * where residual PQ's recall advantage must show. */
  private def clustered(n: Int): DataFrame =
    spark.range(n).select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)),
        j => (sin(pmod(col("id"), lit(8)) * lit(31) + j) +
          sin(col("id") * lit(131) + j * lit(17)) / lit(10))
          .cast("float")).as("embedding"))

  private def meanOverlap(exact: DataFrame, approx: DataFrame): Double = {
    val e = exact.select(col("query_id"), col("neighbor_id"))
    val a = approx.select(col("query_id").as("qq"),
      col("neighbor_id").as("qn"))
    val per = e.join(a,
        col("query_id") === col("qq") && col("neighbor_id") === col("qn"),
        "left")
      .groupBy(col("query_id")).agg(count(col("qn")).as("n"))
      .agg(avg(col("n"))).head.getDouble(0)
    per
  }

  test("residual PQ materially beats flat PQ on clustered data at the " +
      "same code bytes") {
    val corpus = clustered(320)
    val queries = corpus.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(corpus, queries,
      "vec_id", "embedding", k = 5)
    val flat = ProductQuant.pqTopK(corpus, queries, "vec_id", "embedding",
      m = 4, k = 16, topK = 5, lloydIters = 2)
    val path = java.nio.file.Files.createTempDirectory("ivfpq_recall").toString
    IvfPq.build(corpus, "vec_id", "embedding", kc = 8, coarseIters = 2,
      m = 4, k = 16, pqIters = 2, path)
    val ivfpq = IvfPq.topK(IvfPq.load(spark, path, "vec_id"), queries,
      "embedding", k = 5, nprobe = 8)
    val flatR = meanOverlap(exact, flat)
    val ivfR = meanOverlap(exact, ivfpq)
    info(f"mean top-5 overlap: flat=$flatR%.2f ivfpq=$ivfR%.2f")
    assert(ivfR > flatR + 1.0,
      f"expected material recall gain; flat=$flatR%.2f ivfpq=$ivfR%.2f")
  }

  test("append under the frozen model equals one-shot encoding of the " +
      "union") {
    val emb = Tables.embeddings(spark, d)
    val path = java.nio.file.Files.createTempDirectory("ivfpq_app").toString
    val half = 250L
    IvfPq.build(emb.filter(col("vec_id") < half), "vec_id", "embedding",
      kc = 8, coarseIters = 1, m = 4, k = 16, pqIters = 1, path)
    IvfPq.append(spark, path, emb.filter(col("vec_id") >= half),
      "vec_id", "embedding", IvfPq.nextBatchId(spark, path))
    val model = IvfPq.loadModel(spark, path)
    val expected = IvfPq.encodeAssigned(emb, "vec_id", "embedding", model)
      .collect().map(r => r.toSeq).toSet
    val got = IvfPq.load(spark, path, "vec_id").codes
      .select("vec_id", "cluster", "__c0", "__c1", "__c2", "__c3")
      .collect().map(r => r.toSeq).toSet
    assert(got == expected)
  }

  test("compactIncrements: fold + retention keep codes and stats exact; " +
      "covered dirs sweep one cycle later") {
    val emb = Tables.embeddings(spark, d)
    val path = java.nio.file.Files.createTempDirectory("ivfpq_fold").toString
    IvfPq.build(emb.filter(col("vec_id") < 250), "vec_id", "embedding",
      kc = 8, coarseIters = 1, m = 4, k = 16, pqIters = 1, path)
    IvfPq.append(spark, path, emb.filter(col("vec_id") >= 250),
      "vec_id", "embedding", 1L)
    def codes() = IvfPq.load(spark, path, "vec_id").codes
      .select("vec_id", "cluster", "__c0", "__c1", "__c2", "__c3")
      .collect().map(r => r.toSeq).toSet
    val before = codes()
    val statsBefore = IvfPq.loadStats(spark, path)
    IvfPq.compactIncrements(spark, path, upTo = 2L)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def batchDirs(): Int =
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$path/codes"))
        .count(st => st.isDirectory &&
          st.getPath.getName.startsWith("ingest_batch="))
    // grace window, then sweep; serving identical throughout
    assert(batchDirs() == 2)
    assert(codes() == before)
    IvfPq.vacuum(spark, path)
    assert(batchDirs() == 0)
    assert(codes() == before)
    assert(IvfPq.loadStats(spark, path) == statsBefore)
    // ids resume above the boundary; a post-fold append still composes
    assert(IvfPq.nextBatchId(spark, path) == 2L)
  }

  test("crashed-then-replayed append replaces its own torn output") {
    val emb = Tables.embeddings(spark, d)
    val path = java.nio.file.Files.createTempDirectory("ivfpq_crash").toString
    IvfPq.build(emb.filter(col("vec_id") < 250), "vec_id", "embedding",
      kc = 8, coarseIters = 1, m = 4, k = 16, pqIters = 1, path)
    val batch = emb.filter(col("vec_id") >= 250)
    val id = IvfPq.nextBatchId(spark, path)
    // simulate a torn first attempt: a partial cluster directory with
    // a stray file, no _SUCCESS
    val torn = new java.io.File(s"$path/codes/ingest_batch=$id/cluster=0")
    torn.mkdirs()
    java.nio.file.Files.writeString(
      torn.toPath.resolve("part-torn.parquet"), "garbage")
    IvfPq.append(spark, path, batch, "vec_id", "embedding", id)
    val total = IvfPq.load(spark, path, "vec_id").codes.count()
    assert(total == emb.count(), s"torn replay left $total rows")
  }

  test("probed topK prunes unprobed cluster partitions and repeats " +
      "identically") {
    val emb = Tables.embeddings(spark, d)
    val path = java.nio.file.Files.createTempDirectory("ivfpq_plan").toString
    IvfPq.build(emb, "vec_id", "embedding", kc = 8, coarseIters = 1,
      m = 4, k = 16, pqIters = 1, path)
    val idx = IvfPq.load(spark, path, "vec_id")
    val oneQuery = emb.filter(col("vec_id") === 0)
    val df = IvfPq.topK(idx, oneQuery, "embedding", k = 5, nprobe = 2)
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("PartitionFilters") &&
      "cluster#\\d+ IN \\(".r.findFirstIn(plan).isDefined,
      s"expected a literal cluster partition filter in:\n$plan")
    val r1 = df.collect().map(_.toSeq).toSet
    val r2 = IvfPq.topK(idx, oneQuery, "embedding", k = 5, nprobe = 2)
      .collect().map(_.toSeq).toSet
    assert(r1 == r2 && r1.nonEmpty)
  }

  test("cell stats persist at build/append; 10x corpus auto-grows the shortlist") {
    // base corpus: 200 vectors over 20 DISTINCT values -> cells shared,
    // mean population 10; the 10x self-union densifies every cell 10x
    // under the same trained model shape, so auto refine must scale
    def dupCorpus(copies: Int): DataFrame =
      spark.range(20L * copies).select(
        col("id").as("vec_id"),
        transform(sequence(lit(0), lit(63)),
          j => sin(pmod(col("id"), lit(20)) * lit(31) + j).cast("float"))
          .as("embedding"))
    val p1 = java.nio.file.Files.createTempDirectory("ivfpq_st1").toString
    IvfPq.build(dupCorpus(10), "vec_id", "embedding", kc = 4,
      coarseIters = 1, m = 4, k = 8, pqIters = 1, p1)
    val s1 = IvfPq.loadStats(spark, p1).get
    assert(s1.nVectors == 200L)
    // distinct vectors can legitimately SHARE a cell (nearby values
    // encode identically at m=4/k=8) — pin the bound, not the exact
    assert(s1.occupiedCells >= 1 && s1.occupiedCells <= 20L, s"$s1")
    val p10 = java.nio.file.Files.createTempDirectory("ivfpq_st10").toString
    IvfPq.build(dupCorpus(100), "vec_id", "embedding", kc = 4,
      coarseIters = 1, m = 4, k = 8, pqIters = 1, p10)
    val s10 = IvfPq.loadStats(spark, p10).get
    // same 20 distinct values -> same occupied cells at any duplication
    assert(s10.nVectors == 2000L && s10.occupiedCells == s1.occupiedCells)
    // the pin: 10x corpus -> 10x mean cell population -> ~10x refine
    val r1 = IvfPq.autoRefine(s1, 5)
    val r10 = IvfPq.autoRefine(s10, 5)
    val ratio = r10.toDouble / r1
    assert(ratio > 8.0 && ratio <= 11.0, s"refine $r1 -> $r10 (x$ratio)")
    // append keeps stats current (n grows, refine follows)
    IvfPq.append(spark, p1, dupCorpus(10)
      .withColumn("vec_id", col("vec_id") + 1000), "vec_id", "embedding",
      IvfPq.nextBatchId(spark, p1))
    val s1b = IvfPq.loadStats(spark, p1).get
    assert(s1b.nVectors == 400L)
    assert(IvfPq.autoRefine(s1b, 5) >= 2 * r1 - 1)
    // auto path end-to-end: refine unset resolves from stats
    val idx1 = IvfPq.load(spark, p1, "vec_id")
    val out = IvfPq.topKRefined(idx1, dupCorpus(10), dupCorpus(1),
      "embedding", k = 3, nprobe = 2)
    assert(out.count() > 0)
    // and a stats-less index fails auto with an actionable message
    val noStats = idx1.copy(stats = None)
    val e = intercept[IllegalArgumentException] {
      IvfPq.topKRefined(noStats, dupCorpus(10), dupCorpus(1),
        "embedding", k = 3, nprobe = 2)
    }
    assert(e.getMessage.contains("stats"))
  }
}
