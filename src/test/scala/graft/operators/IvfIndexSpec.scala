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

  test("shuffle probe shape returns the exact broadcast-shape result") {
    val emb = Tables.embeddings(spark, d)
    val queries = emb.filter(col("vec_id") < 20)
    val idx = IvfIndex.load(spark, indexPath, "vec_id", "embedding", "label")
    def rows(bp: Option[Boolean]) =
      IvfIndex.topK(idx, queries, k = 5, nprobe = 2, broadcastProbes = bp)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
        .toSet
    assert(rows(Some(false)) == rows(Some(true)))
  }

  test("large query set routes via shuffle join, not query-side broadcast") {
    val emb = Tables.embeddings(spark, d)
    val queries = emb.filter(col("vec_id") < 20)
    val idx = IvfIndex.load(spark, indexPath, "vec_id", "embedding", "label")
    // above-threshold query set (forced via the conf the auto path reads):
    // every broadcast left must be the medoid routing table (an
    // IdentityBroadcastMode cross-join build, which DPP may duplicate
    // into its pruning subquery) — the scoring join must shuffle on the
    // cluster key, so NO hashed (equi-join) broadcast may exist.
    val threshold = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.get(threshold)
    try {
      spark.conf.set(threshold, "1")
      val plan = IvfIndex.topK(idx, queries, k = 5, nprobe = 2)
        .queryExecution.executedPlan.toString()
      assert(!plan.contains("BroadcastHashJoin"),
        s"query side must not broadcast into the scoring join:\n$plan")
      val all = "BroadcastExchange".r.findAllIn(plan).size
      val medoid = "BroadcastExchange IdentityBroadcastMode".r.findAllIn(plan).size
      assert(all == medoid,
        s"expected only medoid-routing broadcasts, got $all vs $medoid in:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a shuffle join for the scoring side in:\n$plan")
    } finally spark.conf.set(threshold, saved)
    // below-threshold query set: the probed side must hash-broadcast
    val plan2 = IvfIndex.topK(idx, queries, k = 5, nprobe = 2)
      .queryExecution.executedPlan.toString()
    assert(plan2.contains("BroadcastHashJoin"),
      s"expected query-side broadcast below threshold in:\n$plan2")
  }

  test("knnGraph through the index equals knnGraphBlocked on the cluster") {
    val emb = Tables.embeddings(spark, d)
    val expected = Similarity.knnGraphBlocked(emb, "vec_id", "embedding",
        col("label"), k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      .toSet
    val idx = IvfIndex.load(spark, indexPath, "vec_id", "embedding", "label")
    val got = IvfIndex.knnGraph(idx, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      .toSet
    assert(got == expected)
    // corpus×corpus: neither side of the pair join may broadcast,
    // regardless of size (the nclusters-row block-count table is the
    // only legitimate broadcast — and it never carries vectors)
    val plan = IvfIndex.knnGraph(idx, k = 5)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("SortMergeJoin"),
      s"knnGraph's pair join must stay sort-merge:\n$plan")
    val broadcastsVectors = "BroadcastExchange[^\\n]*embedding".r
      .findFirstIn(plan).isDefined
    assert(!broadcastsVectors,
      s"knnGraph must never broadcast a corpus side:\n$plan")
  }

  test("knnGraph skew guard: sub-blocked hot cluster returns the exact graph") {
    // one hot cluster 10× the others: all of label 0..4's vectors are
    // collapsed into cluster 0, so the quadratic pair task for cluster 0
    // dominates — precisely the shape the sub-block guard targets
    val emb = Tables.embeddings(spark, d)
      .withColumn("label", when(col("label") < 5, 0).otherwise(col("label")))
    val p = java.nio.file.Files.createTempDirectory("ivf_skew").toString
    IvfIndex.build(emb, "vec_id", "embedding", "label", p)
    val idx = IvfIndex.load(spark, p, "vec_id", "embedding", "label")
    def graph(blockCap: Int) =
      IvfIndex.knnGraph(idx, k = 5, maxClusterBlock = blockCap)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
        .toSet
    val single = graph(Int.MaxValue) // B = 1 everywhere: the unguarded plan
    val hot = emb.filter(col("label") === 0).count().toInt
    assert(hot > 40, s"fixture needs a genuinely hot cluster, got $hot")
    val blocked = graph(blockCap = hot / 8) // forces B >= 8 on the hot cluster
    assert(blocked == single,
      "sub-blocked knnGraph must be pair-for-pair identical to the single-block plan")
    assert(single.nonEmpty)
  }

  test("build(A) + append(B) equals build(A ∪ B) for fixed medoids") {
    val emb = Tables.embeddings(spark, d)
    val a = emb.filter(col("vec_id") % 2 === 0)
    val b = emb.filter(col("vec_id") % 2 === 1)
    val inc = java.nio.file.Files.createTempDirectory("ivf_inc").toString
    IvfIndex.build(a, "vec_id", "embedding", "label", inc)
    IvfIndex.append(spark, inc, b, "vec_id", "embedding", "label",
      IvfIndex.nextBatchId(spark, inc))
    // vectors content identical (modulo the increment id, a layout
    // detail queries never see)
    def contents(p: String) = spark.read.parquet(s"$p/vectors")
      .select(col("vec_id"), col("label"), col("__norm"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    assert(contents(inc) == contents(indexPath))
    // fixed medoids: A held every label's min id half the time; make
    // the comparison exact by pinning both to the full-corpus medoids
    IvfIndex.refreshMedoids(spark, inc, "vec_id", "embedding", "label")
    val queries = emb.filter(col("vec_id") < 20)
    def rows(p: String) = IvfIndex.topK(
      IvfIndex.load(spark, p, "vec_id", "embedding", "label"),
      queries, k = 5, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      .toSet
    assert(rows(inc) == rows(indexPath))
  }

  test("compactIncrements: fold + retention keep serving exact; " +
      "covered dirs sweep one cycle later; ids never reissue") {
    val emb = Tables.embeddings(spark, d)
    val a = emb.filter(col("vec_id") % 3 === 0)
    val b = emb.filter(col("vec_id") % 3 === 1)
    val c = emb.filter(col("vec_id") % 3 === 2)
    val p = java.nio.file.Files.createTempDirectory("ivf_fold").toString
    IvfIndex.build(a, "vec_id", "embedding", "label", p)
    IvfIndex.append(spark, p, b, "vec_id", "embedding", "label", 1L)
    val queries = emb.filter(col("vec_id") < 20)
    def rows() = IvfIndex.topK(
      IvfIndex.load(spark, p, "vec_id", "embedding", "label"),
      queries, k = 5, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getDouble(3))).toSet
    val before = rows()
    IvfIndex.compactIncrements(spark, p, upTo = 2L, clusterCol = "label")
    val fs = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def batchDirs(): Int =
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$p/vectors"))
        .count(st => st.isDirectory &&
          st.getPath.getName.startsWith("ingest_batch="))
    // grace window: covered increments marked, not deleted; the fold
    // shadows them so serving never double-counts
    assert(batchDirs() == 2)
    assert(rows() == before)
    IvfIndex.vacuum(spark, p)
    assert(batchDirs() == 0)
    assert(rows() == before)
    // ids resume above the boundary; appends keep composing
    assert(IvfIndex.nextBatchId(spark, p) == 2L)
    IvfIndex.append(spark, p, c, "vec_id", "embedding", "label", 2L)
    assert(IvfIndex.load(spark, p, "vec_id", "embedding", "label")
      .vectors.count() == emb.count())
    // the full lifecycle still equals the one-shot build
    IvfIndex.refreshMedoids(spark, p, "vec_id", "embedding", "label")
    def rowsOf(path: String) = IvfIndex.topK(
      IvfIndex.load(spark, path, "vec_id", "embedding", "label"),
      queries, k = 5, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getDouble(3))).toSet
    assert(rowsOf(p) == rowsOf(indexPath))
  }

  test("a crashed append replays idempotently (torn increment overwritten)") {
    val emb = Tables.embeddings(spark, d)
    val a = emb.filter(col("vec_id") % 2 === 0)
    val b = emb.filter(col("vec_id") % 2 === 1)
    val inc = java.nio.file.Files.createTempDirectory("ivf_crash").toString
    IvfIndex.build(a, "vec_id", "embedding", "label", inc)
    val batchId = IvfIndex.nextBatchId(spark, inc)
    assert(batchId == 1L)
    // torn attempt: the crash landed after only part of the increment
    // was written (simulated as a half-batch write under the SAME id)
    IvfIndex.append(spark, inc, b.filter(col("vec_id") % 4 === 1),
      "vec_id", "embedding", "label", batchId)
    // replay after recovery: same batch id, full increment
    IvfIndex.append(spark, inc, b, "vec_id", "embedding", "label", batchId)
    assert(IvfIndex.nextBatchId(spark, inc) == 2L)
    val ids = spark.read.parquet(s"$inc/vectors").select("vec_id")
      .collect().map(_.getLong(0)).sorted
    val expect = emb.select("vec_id").collect().map(_.getLong(0)).sorted
    assert(ids.sameElements(expect),
      "replayed increment must fully replace its torn attempt")
  }

  test("routeToMedoids assigns each vector its nearest medoid's cluster") {
    val emb = Tables.embeddings(spark, d)
    val idx = IvfIndex.load(spark, indexPath, "vec_id", "embedding", "label")
    val routed = IvfIndex.routeToMedoids(idx,
      emb.filter(col("vec_id") < 50).drop("label"))
    assert(routed.columns.contains("label"))
    assert(routed.count() == 50) // one row per input vector, no fan-out
    // cross-check one vector against a driver-side nearest-medoid calc
    val medoids = idx.medoids.select("label", "__medoid_vec").collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
    def cos(x: Array[Float], y: Array[Float]): Double = {
      val dot = x.zip(y).map { case (p, q) => p.toDouble * q }.sum
      val nx = math.sqrt(x.map(v => v.toDouble * v).sum)
      val ny = math.sqrt(y.map(v => v.toDouble * v).sum)
      dot / (nx * ny)
    }
    val v0 = emb.filter(col("vec_id") === 7)
      .select("embedding").head.getSeq[Float](0).toArray
    val best = medoids.map { case (c, mv) =>
      (BigDecimal(cos(v0, mv)).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble, c)
    }.sortBy { case (s, c) => (-s, c) }.head._2
    val got = routed.filter(col("vec_id") === 7)
      .select("label").head.getInt(0)
    assert(got == best)
  }

  test("build precomputes norms so queries add no norm scan column") {
    val idx = IvfIndex.load(spark, indexPath, "vec_id", "embedding", "label")
    assert(idx.vectors.columns.contains("__norm"))
    val n = idx.vectors.filter(col("vec_id") === 0).select(col("__norm"))
      .collect().head.getDouble(0)
    assert(n > 0.0)
  }

  test("adaptiveClusterCount: sqrt(n) default, 10x corpus -> ~3.16x clusters") {
    import IvfIndex.adaptiveClusterCount
    assert(adaptiveClusterCount(0L) == 1)
    assert(adaptiveClusterCount(1000L) == 32)
    assert(adaptiveClusterCount(10000L) == 100)   // 10x -> 3.1x
    assert(adaptiveClusterCount(100000L) == 317)  // 10x -> 3.2x
    assert(adaptiveClusterCount(1000000L) == 1000)
    // the scale contract: ratio at any decade stays near sqrt(10)
    Seq(10000L, 1000000L, 100000000L).foreach { n =>
      val r = adaptiveClusterCount(n * 10).toDouble / adaptiveClusterCount(n)
      assert(r > 3.0 && r < 3.4, s"n=$n ratio=$r")
    }
  }

  test("buildUnsupervised default is adaptive and records the shape in meta") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_adm").toString
    val vs = spark.range(100).select(col("id").as("vec_id"),
      array((0 until 4).map(i => (rand(7 + i) * 2 - 1)): _*)
        .cast("array<double>").as("embedding"))
    IvfIndex.buildUnsupervised(vs, "vec_id", "embedding",
      iters = 2, path = dir)
    val meta = spark.read.parquet(s"$dir/meta").collect().head
    assert(meta.getAs[Long]("n_vectors") == 100L)
    assert(meta.getAs[Long]("n_clusters") == 10L) // ceil(sqrt(100))
    assert(meta.getAs[Boolean]("adaptive"))
    // explicit k still honored + recorded as non-adaptive
    val dir2 = java.nio.file.Files.createTempDirectory("ivf_adm2").toString
    IvfIndex.buildUnsupervised(vs, "vec_id", "embedding",
      iters = 2, path = dir2, k = 3)
    val meta2 = spark.read.parquet(s"$dir2/meta").collect().head
    assert(meta2.getAs[Long]("n_clusters") == 3L)
    assert(!meta2.getAs[Boolean]("adaptive"))
  }
}
