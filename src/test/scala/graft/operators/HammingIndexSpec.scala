package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Persisted binary-code index: lifecycle (build / append ≡ one-shot /
  * torn-append replay / meta), serving parity with the from-scratch
  * [[Similarity.hammingTopK]], the bounded-heap shortlist's tie
  * contract, multi-word (≥256-bit) codes, and the clustered
  * coarse∧binary ladder. */
class HammingIndexSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(n: Int, dim: Int, seed: Int): DataFrame = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i =>
      (i.toLong, Seq.fill(dim)(rnd.nextFloat() - 0.5f)))
      .toDF("vec_id", "embedding")
  }

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("hamix").toString

  test("build + load roundtrip: meta records dim/words, codes equal signBits") {
    val df = corpus(50, 130, seed = 1) // 3 words, last partial
    val path = tmp()
    HammingIndex.build(df, "vec_id", "embedding", dim = 130, path)
    val ix = HammingIndex.load(spark, path, "vec_id")
    assert(ix.dim == 130 && ix.words == 3 && ix.clusterCol.isEmpty)
    val expected = df.select(col("vec_id"),
      Similarity.signBits(col("embedding"), 130).as("__code"))
    assert(ix.codes.select("vec_id", "__code").exceptAll(expected).isEmpty &&
      expected.exceptAll(ix.codes.select("vec_id", "__code")).isEmpty)
  }

  test("append ≡ one-shot build; nextBatchId resumes from the directory") {
    val a = corpus(40, 64, seed = 2)
    val b = corpus(40, 64, seed = 3)
      .select((col("vec_id") + 100L).as("vec_id"), col("embedding"))
    val incPath = tmp(); val onePath = tmp()
    HammingIndex.build(a, "vec_id", "embedding", 64, incPath)
    assert(HammingIndex.nextBatchId(spark, incPath) == 1L)
    HammingIndex.append(spark, incPath, b, "vec_id", "embedding", 1L)
    assert(HammingIndex.nextBatchId(spark, incPath) == 2L)
    HammingIndex.build(a.unionByName(b), "vec_id", "embedding", 64, onePath)
    val inc = HammingIndex.load(spark, incPath, "vec_id")
      .codes.select("vec_id", "__code")
    val one = HammingIndex.load(spark, onePath, "vec_id")
      .codes.select("vec_id", "__code")
    assert(inc.exceptAll(one).isEmpty && one.exceptAll(inc).isEmpty)
  }

  test("a torn append is replaced by its replay (idempotent increments)") {
    val a = corpus(30, 64, seed = 4)
    val b = corpus(30, 64, seed = 5)
      .select((col("vec_id") + 100L).as("vec_id"), col("embedding"))
    val path = tmp()
    HammingIndex.build(a, "vec_id", "embedding", 64, path)
    // torn first attempt: half the batch landed, then the job died
    b.filter(col("vec_id") < 110).select(col("vec_id"),
        Similarity.signBits(col("embedding"), 64).as("__code"))
      .write.mode("overwrite").parquet(s"$path/codes/ingest_batch=1")
    // replay overwrites the torn increment completely (replay = true:
    // the caller is re-delivering its OWN id after a crash — the batch
    // default would refuse the already-present directory as a race)
    HammingIndex.append(spark, path, b, "vec_id", "embedding", 1L,
      replay = true)
    val got = HammingIndex.load(spark, path, "vec_id").codes
    assert(got.count() == 60)
    assert(got.filter(col("vec_id") >= 100).count() == 30)
  }

  test("topK off stored codes == Similarity.hammingTopK on the raw corpus") {
    val df = corpus(300, 64, seed = 6)
    val qs = df.filter(col("vec_id") < 8)
    val path = tmp()
    HammingIndex.build(df, "vec_id", "embedding", 64, path)
    val ix = HammingIndex.load(spark, path, "vec_id")
    val served = HammingIndex.topK(ix, df, qs, "embedding", k = 5,
      shortlist = 20)
    val scratch = Similarity.hammingTopK(df, qs, "vec_id", "embedding",
      dim = 64, k = 5, shortlist = 20)
    assert(served.exceptAll(scratch).isEmpty &&
      scratch.exceptAll(served).isEmpty)
  }

  test("heap shortlist == row_number window shortlist (tie contract)") {
    // identical vectors force hamming ties: the heap must keep the
    // SMALLEST ids, exactly like the window's (hamming ASC, id ASC)
    val base = Seq.fill(32)(0.4f) ++ Seq.fill(32)(-0.4f)
    val df = (0 until 40).map(i => (i.toLong, base)).toDF("vec_id", "embedding")
    val qs = df.filter(col("vec_id") === 0)
    val path = tmp()
    HammingIndex.build(df, "vec_id", "embedding", 64, path)
    val ix = HammingIndex.load(spark, path, "vec_id")
    val got = HammingIndex.topK(ix, df, qs, "embedding", k = 5,
        shortlist = 5)
      .select(col("neighbor_id")).as[Long].collect().sorted.toSeq
    // all hamming 0, all similarity 1.0: ids 1..5 (0 excluded as self)
    assert(got == Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("multi-word: 256-bit expanded codes — word 0 is the base code, topK parity") {
    val df = corpus(120, 64, seed = 7)
    val exp = df.select(col("vec_id"),
      Similarity.expandSignBlocks(col("embedding"), 64, 4).as("emb256"))
    // block 0 of the expansion is the identity: word 0 of the 256-bit
    // code equals the base 64-bit code
    val words = exp.join(df, "vec_id").select(
        Similarity.signBits(col("emb256"), 256).as("c256"),
        Similarity.signBits(col("embedding"), 64).as("c64"))
      .select(element_at(col("c256"), 1).as("w0"),
        element_at(col("c64"), 1).as("b0"),
        size(col("c256")).as("n"))
    assert(words.filter(col("w0") =!= col("b0")).isEmpty)
    assert(words.agg(max(col("n"))).head.getInt(0) == 4)
    // served multi-word topK == from-scratch hammingTopK at dim 256
    val qs = exp.filter(col("vec_id") < 5)
    val path = tmp()
    HammingIndex.build(exp, "vec_id", "emb256", 256, path)
    val ix = HammingIndex.load(spark, path, "vec_id")
    val served = HammingIndex.topK(ix, exp, qs, "emb256", k = 4,
      shortlist = 12)
    val scratch = Similarity.hammingTopK(exp, qs, "vec_id", "emb256",
      dim = 256, k = 4, shortlist = 12)
    assert(served.exceptAll(scratch).isEmpty &&
      scratch.exceptAll(served).isEmpty)
  }

  test("clustered ladder: topKProbed == whole-index topK when every cluster is probed") {
    val df = corpus(200, 64, seed = 8)
    graft.functions.VectorFunctions.register(spark)
    val centroids = ProductQuant.trainCodebooksLloyd(
      df, "vec_id", "embedding", m = 1, k = 4, iters = 2).head
    val assigned = Similarity.assignToCentroids(df, "embedding", centroids)
    val cPath = tmp(); val fPath = tmp()
    HammingIndex.build(assigned, "vec_id", "embedding", 64, cPath,
      clusterCol = Some("cluster"))
    HammingIndex.build(df, "vec_id", "embedding", 64, fPath)
    val cIx = HammingIndex.load(spark, cPath, "vec_id")
    assert(cIx.clusterCol.contains("cluster"))
    val qs = df.filter(col("vec_id") < 6)
    val probedAll = HammingIndex.topKProbed(cIx, df, qs, "embedding",
      centroids, k = 5, shortlist = 15, nprobe = 4)
    val flat = HammingIndex.topK(
      HammingIndex.load(spark, fPath, "vec_id"), df, qs, "embedding",
      k = 5, shortlist = 15)
    assert(probedAll.exceptAll(flat).isEmpty &&
      flat.exceptAll(probedAll).isEmpty)
    // nprobe=1 only sees the query's own cell: candidates all share
    // the query's cluster
    val one = HammingIndex.topKProbed(cIx, df, qs, "embedding",
      centroids, k = 5, shortlist = 15, nprobe = 1)
    val cl = assigned.select(col("vec_id"), col("cluster"))
    val joined = one.join(cl.withColumnRenamed("cluster", "qc"),
        one("query_id") === cl("vec_id")).drop("vec_id")
      .join(cl.withColumnRenamed("cluster", "nc"),
        col("neighbor_id") === cl("vec_id"))
    assert(joined.filter(col("qc") =!= col("nc")).isEmpty)
  }

  test("guards: clustered append needs the cluster column; probed needs a clustered index") {
    val df = corpus(30, 64, seed = 9)
    graft.functions.VectorFunctions.register(spark)
    val centroids = ProductQuant.trainCodebooksLloyd(
      df, "vec_id", "embedding", m = 1, k = 2, iters = 1).head
    val path = tmp()
    HammingIndex.build(Similarity.assignToCentroids(df, "embedding", centroids),
      "vec_id", "embedding", 64, path, clusterCol = Some("cluster"))
    val e = intercept[IllegalArgumentException] {
      HammingIndex.append(spark, path, df, "vec_id", "embedding", 1L)
    }
    assert(e.getMessage.contains("cluster"))
    val flatPath = tmp()
    HammingIndex.build(df, "vec_id", "embedding", 64, flatPath)
    val e2 = intercept[IllegalArgumentException] {
      HammingIndex.topKProbed(HammingIndex.load(spark, flatPath, "vec_id"),
        df, df.filter(col("vec_id") < 2), "embedding", centroids,
        k = 2, shortlist = 4, nprobe = 1)
    }
    assert(e2.getMessage.contains("cluster column"))
  }

  test("streaming maintenance ≡ one-shot build (file-source micro-batches)") {
    val base = corpus(30, 64, seed = 8)
    val b1 = corpus(30, 64, seed = 9)
      .select((col("vec_id") + 100L).as("vec_id"), col("embedding"))
    val b2 = corpus(30, 64, seed = 10)
      .select((col("vec_id") + 200L).as("vec_id"), col("embedding"))
    val root = tmp()
    val path = s"$root/ix"; val srcDir = s"$root/in"
    HammingIndex.build(base, "vec_id", "embedding", 64, path)
    b1.coalesce(1).write.mode("append").parquet(srcDir)
    val q = graft.streaming.StreamingHammingIndex.maintain(
      spark.readStream.schema(base.schema).parquet(srcDir),
      path, "vec_id", "embedding", s"$root/ckpt")
    try {
      q.processAllAvailable()
      b2.coalesce(1).write.mode("append").parquet(srcDir)
      q.processAllAvailable()
    } finally q.stop()
    val onePath = tmp()
    HammingIndex.build(base.unionByName(b1).unionByName(b2),
      "vec_id", "embedding", 64, onePath)
    val maintained = HammingIndex.load(spark, path, "vec_id")
      .codes.select("vec_id", "__code")
    val oneShot = HammingIndex.load(spark, onePath, "vec_id")
      .codes.select("vec_id", "__code")
    assert(maintained.exceptAll(oneShot).isEmpty &&
      oneShot.exceptAll(maintained).isEmpty)
    // the stream left ≥1 increments beyond the base and the cursor
    // resumes past all of them
    assert(HammingIndex.nextBatchId(spark, path) >= 2L)
  }

  test("compact: codes bit-identical, increments collapse to one, cursor resets") {
    val a = corpus(40, 64, seed = 11)
    val b = corpus(40, 64, seed = 12)
      .select((col("vec_id") + 100L).as("vec_id"), col("embedding"))
    val src = tmp(); val dst = s"${tmp()}/gen1"
    HammingIndex.build(a, "vec_id", "embedding", 64, src)
    HammingIndex.append(spark, src, b, "vec_id", "embedding", 1L)
    HammingIndex.compact(spark, src, dst)
    val before = HammingIndex.load(spark, src, "vec_id")
    val after = HammingIndex.load(spark, dst, "vec_id")
    assert(after.dim == before.dim && after.words == before.words &&
      after.clusterCol == before.clusterCol)
    val bc = before.codes.select("vec_id", "__code")
    val ac = after.codes.select("vec_id", "__code")
    assert(ac.exceptAll(bc).isEmpty && bc.exceptAll(ac).isEmpty)
    assert(HammingIndex.nextBatchId(spark, dst) == 1L) // one increment
    // appends resume on the compacted index
    val c = corpus(10, 64, seed = 13)
      .select((col("vec_id") + 200L).as("vec_id"), col("embedding"))
    HammingIndex.append(spark, dst, c, "vec_id", "embedding", 1L)
    assert(HammingIndex.load(spark, dst, "vec_id").codes.count() == 90)
  }

  test("compact preserves the cluster partitioning (probed serving intact)") {
    val df = corpus(60, 64, seed = 14)
      .withColumn("cluster", (col("vec_id") % 3).cast("int"))
    val src = tmp(); val dst = s"${tmp()}/gen1"
    HammingIndex.build(df, "vec_id", "embedding", 64, src, Some("cluster"))
    HammingIndex.compact(spark, src, dst)
    val ix = HammingIndex.load(spark, dst, "vec_id")
    assert(ix.clusterCol.contains("cluster"))
    // cluster dirs survive as partition directories (scan pruning works)
    val dirs = new java.io.File(s"$dst/codes/ingest_batch=0").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq == Seq("cluster=0", "cluster=1", "cluster=2"))
  }

  test("topKExcluding: full shortlist equals exact hardNegatives ranking") {
    val df = corpus(80, 64, seed = 16)
      .withColumn("label", (col("vec_id") % 5).cast("int"))
    val path = tmp()
    HammingIndex.build(df, "vec_id", "embedding", 64, path, Some("label"))
    val ix = HammingIndex.load(spark, path, "vec_id")
    val anchors = df.filter(col("vec_id") < 4)
    // shortlist >= corpus: the binary pass can't drop any candidate,
    // so the rerank must equal the exact operator row for row
    val viaIndex = HammingIndex.topKExcluding(ix, df, anchors,
      "embedding", k = 3, shortlist = 100)
      .select("query_id", "neighbor_id", "rank", "similarity")
    val exact = Similarity.hardNegatives(df, anchors,
      "vec_id", "embedding", "label", k = 3)
    assert(viaIndex.exceptAll(exact).isEmpty &&
      exact.exceptAll(viaIndex).isEmpty)
    // no same-label neighbor ever surfaces
    val labels = df.select(col("vec_id"), col("label"))
      .as[(Long, Int)].collect().toMap
    viaIndex.select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .foreach { case (q, n) => assert(labels(q) != labels(n)) }
    // flat (unclustered) index refuses loudly
    val flat = tmp()
    HammingIndex.build(df.drop("label"), "vec_id", "embedding", 64, flat)
    intercept[IllegalArgumentException] {
      HammingIndex.topKExcluding(HammingIndex.load(spark, flat, "vec_id"),
        df, anchors, "embedding", k = 3, shortlist = 10)
    }
  }

  test("compact refuses in-place") {
    val src = tmp()
    HammingIndex.build(corpus(5, 64, seed = 15), "vec_id", "embedding", 64, src)
    intercept[IllegalArgumentException] {
      HammingIndex.compact(spark, src, src)
    }
  }

  test("compactIncrements: in-place fold bounds dirs, serving unchanged") {
    val a = corpus(30, 64, seed = 20)
    def shifted(seed: Int, off: Long) = corpus(30, 64, seed)
      .select((col("vec_id") + off).as("vec_id"), col("embedding"))
    val path = tmp()
    HammingIndex.build(a, "vec_id", "embedding", 64, path)
    HammingIndex.append(spark, path, shifted(21, 100L), "vec_id",
      "embedding", 1L)
    HammingIndex.append(spark, path, shifted(22, 200L), "vec_id",
      "embedding", 2L)
    val before = HammingIndex.load(spark, path, "vec_id").codes
      .select("vec_id", "__code").collect().toSet

    HammingIndex.compactIncrements(spark, path, upTo = 3L)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def incDirs(): Int =
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$path/codes"))
        .count(st => st.isDirectory &&
          st.getPath.getName.startsWith("ingest_batch="))
    // mark-then-sweep: the fold pass MARKS the covered increments (one
    // janitor cycle of reader grace — they are shadowed, not deleted)
    assert(incDirs() == 3)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$path/gen/gen=3")))
    val after = HammingIndex.load(spark, path, "vec_id").codes
      .select("vec_id", "__code").collect().toSet
    assert(after == before)
    // the NEXT janitor tick physically reclaims them
    HammingIndex.vacuum(spark, path)
    assert(incDirs() == 0)
    assert(HammingIndex.load(spark, path, "vec_id").codes
      .select("vec_id", "__code").collect().toSet == before)

    // ids keep flowing after the fold: append resumes ABOVE the boundary
    assert(HammingIndex.nextBatchId(spark, path) == 3L)
    HammingIndex.append(spark, path, shifted(23, 300L), "vec_id",
      "embedding", 3L)
    assert(HammingIndex.load(spark, path, "vec_id").codes.count() == 120)

    // second fold covers the fold + the new increment; the superseded
    // fold survives one cycle (marked), then sweeps
    HammingIndex.compactIncrements(spark, path, upTo = 4L)
    assert(HammingIndex.load(spark, path, "vec_id").codes.count() == 120)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$path/gen/gen=3")))
    HammingIndex.vacuum(spark, path)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$path/gen/gen=3")))
    assert(HammingIndex.load(spark, path, "vec_id").codes.count() == 120)
  }

  test("vacuumscale: continuous maintain keeps index bytes bounded at " +
      "O(one corpus), never O(folds so far)") {
    // the r14 retention claim, measured: under continuous ingest +
    // periodic fold/sweep cycles, the tree's bytes at EVERY observation
    // stay within a small constant of one corpus copy — without the
    // sweep, each fold is a full copy of the data so far and the tree
    // would hold every superseded one (4 folds here ≈ 2.5 corpus
    // copies retained at the end, unboundedly more as ingest runs on)
    def du(p: java.io.File): Long =
      if (p.isFile) p.length()
      else Option(p.listFiles()).map(_.map(du).sum).getOrElse(0L)
    def batch(b: Int): DataFrame = corpus(30, 64, seed = 40 + b)
      .select((col("vec_id") + b * 100L).as("vec_id"), col("embedding"))
    val path = tmp()
    HammingIndex.build(batch(0), "vec_id", "embedding", 64, path)
    var maxBytes = 0L
    (1 until 12).foreach { b =>
      HammingIndex.append(spark, path, batch(b), "vec_id", "embedding",
        b.toLong)
      if (b % 3 == 0) {
        HammingIndex.compactIncrements(spark, path, upTo = b + 1L)
        HammingIndex.vacuum(spark, path) // the janitor tick
      }
      maxBytes = math.max(maxBytes, du(new java.io.File(path)))
    }
    HammingIndex.compactIncrements(spark, path, upTo = 12L)
    HammingIndex.vacuum(spark, path)
    // yardstick: a one-shot build over the same 360 vectors
    val oneShot = tmp()
    HammingIndex.build((0 until 12).map(batch).reduce(_ unionByName _),
      "vec_id", "embedding", 64, oneShot)
    val yard = du(new java.io.File(oneShot))
    val fin = du(new java.io.File(path))
    // serving intact, final bytes ~one copy, and even the worst
    // mid-run observation (fold + covered marks + fresh increments)
    // bounded by a grace-window constant — not by the fold count
    assert(HammingIndex.load(spark, path, "vec_id").codes.count() == 360)
    assert(fin <= 2 * yard, s"final bytes $fin vs one-shot $yard")
    assert(maxBytes <= 4 * yard,
      s"mid-run bytes $maxBytes grew past the grace-window bound " +
        s"(one-shot $yard)")
  }

  test("compactIncrements crash window: committed fold SHADOWS covered dirs") {
    val a = corpus(20, 64, seed = 24)
    val b = corpus(20, 64, seed = 25)
      .select((col("vec_id") + 100L).as("vec_id"), col("embedding"))
    val path = tmp()
    HammingIndex.build(a, "vec_id", "embedding", 64, path)
    HammingIndex.append(spark, path, b, "vec_id", "embedding", 1L)
    val expect = HammingIndex.load(spark, path, "vec_id").codes
      .select("vec_id", "__code").collect().toSet

    // simulate the crash BETWEEN the fold's commit and the covered
    // delete: publish the fold exactly as compactIncrements would,
    // leaving every covered increment directory in place
    val folded = spark.read.parquet(s"$path/codes").drop("ingest_batch")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(graft.operators.AtomicCommit
      .publishParquet(spark, s"$path/gen/gen=2") { tmp =>
        folded.write.mode("overwrite").parquet(tmp)
      })
    // the fold shadows the still-present increments: no double-serving
    val got = HammingIndex.load(spark, path, "vec_id").codes
    assert(got.count() == 40)
    assert(got.select("vec_id", "__code").collect().toSet == expect)
    // the replayed compaction no-ops on the publish, MARKS the covered
    // dirs, and the next janitor tick reclaims them
    HammingIndex.compactIncrements(spark, path, upTo = 2L)
    HammingIndex.vacuum(spark, path)
    assert(fs.listStatus(new org.apache.hadoop.fs.Path(s"$path/codes"))
      .count(st => st.isDirectory &&
        st.getPath.getName.startsWith("ingest_batch=")) == 0)
    assert(HammingIndex.load(spark, path, "vec_id").codes.count() == 40)
  }
}
