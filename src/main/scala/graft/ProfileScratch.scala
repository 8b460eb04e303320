package graft

import graft.operators.{Dedup, Hierarchy}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level profiling + scale-smoke harness (dev tool, not part of
  * the driver contract). Run with SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS:
  *
  *   sbt "runMain graft.ProfileScratch [dedup|closure|hashtax]"
  */
object ProfileScratch {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val what = args.headOption.getOrElse("dedup")

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"STAGE $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    what match {
      case "dedup" =>
        val docs = Tables.documents(spark, d)
        docs.count() // warm scan
        t("full q19 capped ngram")(
          queries.DedupQueries.ngramJaccard(spark, d).count())
        t("full q20 minhash portable")(
          queries.DedupQueries.minHashLsh(spark, d).count())
        t("full q21 simhash portable")(
          queries.DedupQueries.simHash(spark, d).count())

      case "hashtax" =>
        // quantify the portable-hash (md5-derived) tax vs xxhash64 fast
        // mode on the full MinHash+LSH pipeline at sf0.1
        val docs = Tables.documents(spark, d)
        docs.count()
        t("minHashPairs PORTABLE (oracle mode)")(
          Dedup.minHashPairs(docs, "doc_id", "text",
            shingleN = 3, numHashes = 64, bands = 16, minJaccard = 0.5,
            seed = 42L, portable = true).count())
        t("minHashPairs FAST (xxhash64, 100TB mode)")(
          Dedup.minHashPairs(docs, "doc_id", "text",
            shingleN = 3, numHashes = 64, bands = 16, minJaccard = 0.5,
            seed = 42L, portable = false).count())
        t("simHashPairs PORTABLE")(
          Dedup.simHashPairs(docs, "doc_id", "text",
            shingleN = 3, maxHamming = 3, portable = true).count())
        t("simHashPairs FAST")(
          Dedup.simHashPairs(docs, "doc_id", "text",
            shingleN = 3, maxHamming = 3, portable = false).count())

      case "dedup10x" =>
        // MinHash+LSH scaling check: 10× the sf0.1 corpus (50k docs)
        // via id-offset self-union. Linear-ish growth here means the
        // banded-candidate path holds; super-linear growth would mean
        // a hot bucket (the quadratic term) is back.
        val base = Tables.documents(spark, d)
          .select(col("doc_id"), col("text"))
        val docs10 = (0 until 10).map(i =>
          base.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"),
            col("text"))).reduce(_ union _)
          .repartition(32).persist()
        println(s"  corpus: ${docs10.count()} docs")
        t("minhash+LSH FAST at 10x sf0.1") {
          Dedup.minHashPairs(docs10, "doc_id", "text",
            shingleN = 3, numHashes = 64, bands = 16, minJaccard = 0.5,
            seed = 42L, portable = false).count()
        }
        t("simhash FAST at 10x sf0.1") {
          Dedup.simHashPairs(docs10, "doc_id", "text",
            shingleN = 3, maxHamming = 3, portable = false).count()
        }

      case "components" =>
        // Connected-components scale smoke: 1M edges over 500k nodes in
        // two shapes — near-dup-like (250k tiny cliques: diameter 1-2,
        // plain propagation's home turf) and adversarial (one 200k-node
        // chain: star contraction's reason to exist).
        import graft.operators.Components
        val cliques = spark.range(0, 1000000).select(
          (col("id") / 4).cast("long").as("a"),
          ((col("id") / 4).cast("long") * 4 + pmod(col("id"), lit(4))
            + lit(250000L)).as("b"))
          .repartition(32)
        cliques.persist().count()
        val c1 = t("propagation: 1M-edge clique soup") {
          Components.connectedComponents(cliques, "a", "b").count()
        }
        println(s"  labelled nodes: $c1")
        val c2 = t("star contraction: 1M-edge clique soup") {
          Components.connectedComponentsStar(cliques, "a", "b").count()
        }
        println(s"  labelled nodes: $c2")
        val chain = spark.range(1, 200000)
          .select(col("id").as("a"), (col("id") + 1).as("b"))
          .repartition(32)
        chain.persist().count()
        val c3 = t("star contraction: 200k-node chain (diameter 200k)") {
          Components.connectedComponentsStar(chain, "a", "b").count()
        }
        println(s"  labelled nodes: $c3 (propagation would need 200k rounds)")

      case "quantiles" =>
        // exact group percentiles: plain per-group sort vs the
        // (value, frequency) pre-aggregation, on the two shapes that
        // decide which to use — high duplication (distinct ≪ rows,
        // rewrite wins) and near-unique (rewrite is overhead)
        val n = 20000000L
        def timeBoth(label: String, nDistinct: Long): Unit = {
          val df = spark.range(0, n).select(
            (col("id") % 5).cast("string").as("g"),
            pmod(col("id") * 2654435761L, lit(nDistinct)).as("v"))
            .persist()
          df.count()
          t(s"$label plain percentile (sort ${n} rows/group)") {
            df.groupBy(col("g")).agg(count(lit(1)).as("n"),
              percentile(col("v"), lit(0.5)).as("p50")).count()
          }
          t(s"$label freq percentile (sort distinct=${nDistinct})") {
            df.groupBy(col("g"), col("v")).agg(count(lit(1)).as("f"))
              .groupBy(col("g")).agg(sum(col("f")).as("n"),
                percentile(col("v"), lit(0.5), col("f")).as("p50")).count()
          }
          df.unpersist()
        }
        timeBoth("high-dup", 2000L)
        timeBoth("near-unique", n / 2)

      case "sdedup" =>
        // Streaming-ingester scale smoke: N batches × M synthetic docs
        // (~25% cross-batch near-dup rate) through StreamingDedup.start
        // with auto-compaction every 5 batches. Reports wall, admitted
        // counts, and the index directory layout — the measured
        // evidence that a long-lived ingester's index stays bounded
        // (generations + a handful of live partitions) instead of one
        // parquet dir per micro-batch forever.
        val nBatches = args.lift(1).map(_.toInt).getOrElse(20)
        val perBatch = args.lift(2).map(_.toInt).getOrElse(20000)
        val root = java.nio.file.Files.createTempDirectory("sdedup_scale")
        val in = root.resolve("in"); val out = root.resolve("out")
        val ix = root.resolve("ix"); val cp = root.resolve("cp")
        java.nio.file.Files.createDirectories(in)
        // doc i of batch b duplicates doc i of batch 0 when i%4==0
        // (same text => same minhash bands, and batch 0's copy is the
        // ADMITTED one, so every later batch really probes the index);
        // others are unique prose
        t("generate input files") {
          (0 until nBatches).foreach { b =>
            val sb = new StringBuilder
            (0 until perBatch).foreach { i =>
              val id = b.toLong * perBatch + i
              val srcId = if (b > 0 && i % 4 == 0) i.toLong else id
              val words = (0 until 30)
                .map(w => s"w${(srcId * 31 + w * 7) % 999983}x$w")
                .mkString(" ")
              sb.append(s"""{"doc_id":$id,"text":"$words"}""").append('\n')
            }
            val p = in.resolve(f"batch$b%04d.json")
            java.nio.file.Files.write(p, sb.toString.getBytes("UTF-8"))
            p.toFile.setLastModified(1600000000000L + b * 60000L)
          }
        }
        val schema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("doc_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("text",
            org.apache.spark.sql.types.StringType)))
        t(s"ingest $nBatches batches x $perBatch docs (compactEvery=5)") {
          val stream = spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).json(in.toString)
          streaming.StreamingDedup.start(stream, "doc_id",
            streaming.StreamingDedup.minHashBlocks("doc_id", "text"),
            ix.toString, out.toString, cp.toString,
            compactEvery = Some(5)).awaitTermination()
        }
        val admitted = spark.read.parquet(out.toString).count()
        println(s"admitted $admitted / ${nBatches.toLong * perBatch} docs")
        val dirs = ix.toFile.list().filterNot(_.startsWith("_")).sorted
        println(s"index dirs (${dirs.length}): ${dirs.mkString(", ")}")
        val ixRows = streaming.StreamingDedup
          .readIndex(spark, ix.toString, Long.MaxValue).map(_.count())
        println(s"index rows: $ixRows")
        t("final full compaction")(
          streaming.StreamingDedup.compactIndex(spark, ix.toString))
        val dirs2 = ix.toFile.list().filterNot(_.startsWith("_")).sorted
        println(s"index dirs post-compact (${dirs2.length}): ${dirs2.mkString(", ")}")

      case "soak" =>
        // Multi-day-shaped soak of the auto-compacting ingester
        // (miniature spec: StreamingDedupSpec "soak: auto-compaction
        // keeps the index dir bounded across kill/restart cycles"):
        // 500+ micro-batches land in waves with a KILL (stream torn
        // down, checkpoint-recovery restart) between waves, compaction
        // every 10 batches. Reported per wave: index dir count — the
        // boundedness evidence — then a final novelty-equivalence check
        // against the single-shot batch fold over the whole corpus.
        val nBatches = args.lift(1).map(_.toInt).getOrElse(500)
        val perBatch = args.lift(2).map(_.toInt).getOrElse(200)
        val nWaves = args.lift(3).map(_.toInt).getOrElse(10)
        val root = java.nio.file.Files.createTempDirectory("soak_scale")
        val in = root.resolve("in"); val out = root.resolve("out")
        val ix = root.resolve("ix"); val cp = root.resolve("cp")
        java.nio.file.Files.createDirectories(in)
        // doc i of batch b re-sends batch (b-5)'s doc i when i%4==0 —
        // far enough back that after compaction the pair is always
        // index-vs-batch, so the probe path is really exercised
        def docJson(b: Int, i: Int): String = {
          val id = b.toLong * perBatch + i
          val src = if (b >= 5 && i % 4 == 0) (b - 5).toLong * perBatch + i
            else id
          val words = (0 until 25)
            .map(w => s"w${(src * 37 + w * 11) % 999983}x$w").mkString(" ")
          s"""{"doc_id":$id,"text":"$words"}"""
        }
        def landBatch(b: Int): Unit = {
          val rows = (0 until perBatch).map(i => docJson(b, i))
          val p = in.resolve(f"batch$b%05d.json")
          java.nio.file.Files.write(p, rows.mkString("\n").getBytes("UTF-8"))
          p.toFile.setLastModified(1600000000000L + b * 60000L)
        }
        val schema2 = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("doc_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("text",
            org.apache.spark.sql.types.StringType)))
        val perWave = nBatches / nWaves
        var maxDirs = 0
        (0 until nWaves).foreach { wave =>
          (wave * perWave until (wave + 1) * perWave).foreach(landBatch)
          t(s"wave $wave: ingest $perWave batches then kill") {
            val stream = spark.readStream.schema(schema2)
              .option("maxFilesPerTrigger", 1).json(in.toString)
            streaming.StreamingDedup.start(stream, "doc_id",
              streaming.StreamingDedup.minHashBlocks("doc_id", "text"),
              ix.toString, out.toString, cp.toString,
              compactEvery = Some(10)).awaitTermination()
          }
          val dirs = ix.toFile.list().count(!_.startsWith("_"))
          maxDirs = math.max(maxDirs, dirs)
          println(s"  index dirs after wave $wave: $dirs (max so far $maxDirs)")
        }
        val admitted = spark.read.parquet(out.toString)
          .select(col("doc_id"), col("ingest_batch").cast("int"))
        val admittedCount = admitted.count()
        println(s"admitted $admittedCount / ${nBatches.toLong * perBatch}; " +
          s"max index dirs $maxDirs over $nBatches batches " +
          s"(bound: gens ${nBatches / 10} + recent 10 + 1)")
        t("novelty equivalence vs single-shot fold") {
          val allDocs = spark.range(nBatches.toLong * perBatch).select(
            col("id").as("doc_id"),
            (col("id") / perBatch).cast("int").as("__b"),
            (col("id") % perBatch).cast("int").as("__i"))
          // regenerate the same texts engine-side
          val src = when(col("__b") >= 5 && col("__i") % 4 === 0,
            (col("__b") - 5).cast("long") * perBatch + col("__i"))
            .otherwise(col("doc_id"))
          val words = concat_ws(" ", (0 until 25).map(w =>
            concat(lit("w"), pmod(src * 37 + lit(w * 11), lit(999983))
              .cast("string"), lit(s"x$w"))): _*)
          val corpus = allDocs.select(col("doc_id"),
            words.as("text"), col("__b"))
          val fold = streaming.StreamingDedup.incrementalDedup(
            corpus, "doc_id", "text", col("__b"), nBatches = nBatches)
          val mismatch = fold.select(col("doc_id"), col("ingest_batch"))
            .exceptAll(admitted).count() +
            admitted.exceptAll(
              fold.select(col("doc_id"), col("ingest_batch"))).count()
          println(s"  fold-vs-ingester mismatch rows: $mismatch")
          require(mismatch == 0, "novelty decisions diverged from the fold")
        }

      case "fusionscale" =>
        // The q79 scale-cliff experiment: fused image-text near-dup
        // pairs at this sf-dir with the FIXED 8-bit image LSH (the q79
        // oracle pin — buckets saturate, candidates quadratic) vs the
        // ADAPTIVE width (buckets scale with n, candidates ~linear).
        // Reports wall + per-modality candidate counts.
        val docs = Tables.documents(spark, d).select(col("doc_id"),
          col("text"), encode(col("text"), "UTF-8").as("payload"))
        val n = docs.count()
        val adaptive = operators.Similarity.adaptiveHyperplaneBits(n)
        val (anh, ab, ar) = operators.Dedup.adaptiveBandShape(n)
        println(s"  corpus $n docs; adaptive image width = $adaptive bits; " +
          s"adaptive text shape = $ab bands x $ar rows ($anh hashes)")
        // (tag, nBits, numHashes, bands, cap): the q79 oracle pin (fixed
        // everything), image-only adaptivity (the r7 state), full text+
        // image adaptivity (the default path), and default + bucket cap.
        Seq(("fixed8 4x4 (q79 pin)", 8, 16, 4, -1),
            (s"img-adaptive$adaptive 4x4", -1, 16, 4, -1),
            (s"full-adaptive", -1, -1, -1, -1),
            (s"full-adaptive cap256", -1, -1, -1, 0)).foreach {
          case (tag, bits, nh, bnd, cap) =>
            t(s"fusion pairs, $tag") {
              val out = operators.Fusion.imageTextNearDupPairs(docs,
                "doc_id", "text", "payload", dim = 16, shingleN = 3,
                numHashes = nh, bands = bnd, nBits = bits, minFused = 0.6,
                seed = 42L, planeSeed = 7L, portable = true,
                maxTextBucket = cap)
              println(s"  -> ${out.count()} fused pairs")
              operators.Lifecycle.release(out)
            }
        }

      case "bpescale" =>
        // Production-depth BPE: driver-side trainer (one corpus scan +
        // bounded vocab collect, then in-memory merge loop) at 1k+
        // merges, vs the per-merge-job distributed loop's cost model
        // (one Spark job + parquet generation PER MERGE — fine at 8,
        // catastrophic at 32k). Then the constant-codegen tokenizer
        // over the corpus at that depth. Reports merges/sec + tokens.
        val nM = args.lift(1).map(_.toInt).getOrElse(1000)
        val docs = Tables.documents(spark, d).select(col("doc_id"), col("text"))
        val nDocs = docs.count()
        var merges: Seq[operators.Bpe.Merge] = Nil
        t(s"trainMergesLocal($nM) on $nDocs docs") {
          merges = operators.Bpe.trainMergesLocal(docs, "text", nM)
        }
        println(f"  learned ${merges.size} merges")
        val t0 = System.nanoTime()
        val m2 = operators.Bpe.trainMergesLocal(docs, "text", nM)
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"  repeat: ${m2.size} merges in $secs%.2f s = ${m2.size / secs}%.0f merges/sec (incl. corpus scan + vocab collect)")
        t(s"applyMergesFast at ${merges.size} merges") {
          val toks = operators.Bpe.applyMergesFast(docs, "doc_id", "text", merges)
            .select(sum(size(col("tokens"))))
          println(s"  total tokens: ${toks.head.getLong(0)}")
        }
        // 8-merge distributed baseline for the per-merge job cost
        t("trainMerges(8) distributed (per-merge-job baseline)") {
          operators.Bpe.trainMerges(docs, "text", 8)
        }
        // The sf corpus's synthetic vocab exhausts after ~90 merges, so
        // production DEPTH is measured on a 50k-word Zipf vocabulary of
        // 18-char words (the in-memory loop is corpus-independent once
        // the vocab is collected — this is exactly its input shape).
        val rnd = new scala.util.Random(11)
        val alphabet = "abcdefghijklmnopqrstuvwxyz"
        val synth = Seq.tabulate(50000) { i =>
          val w = Seq.fill(18)(alphabet(rnd.nextInt(
            4 + rnd.nextInt(22)))).mkString
          (w, (50000L / (i + 1)) + 1)
        }
        val deep = args.lift(2).map(_.toInt).getOrElse(4000)
        val t1 = System.nanoTime()
        val md = operators.Bpe.trainMergesFromCounts(synth, deep)
        val s2 = (System.nanoTime() - t1) / 1e9
        println(f"  synth 50k-word vocab: ${md.size} merges in $s2%.2f s = ${md.size / s2}%.0f merges/sec")

      case "bloomscale" =>
        // Bloom-pruned anti-join smoke: a corpus-sized on-disk index vs
        // a small ingest batch (the incremental-dedup membership shape).
        // The plain anti-join shuffles ALL index rows; the bloom path
        // shuffles ~fpp·|index| + matches. Reports both walls plus the
        // measured pruned-index row count (the shuffle-volume proxy).
        val nIndex = args.lift(1).map(_.toLong).getOrElse(20_000_000L)
        val nBatch = args.lift(2).map(_.toLong).getOrElse(20_000L)
        val ixDir = java.nio.file.Files
          .createTempDirectory("bloomscale").toString
        t(s"write index ($nIndex rows)") {
          spark.range(nIndex)
            .select(md5(concat(lit("doc"), col("id"))).as("fp"))
            .write.mode("overwrite").parquet(ixDir)
        }
        val index = spark.read.parquet(ixDir)
        // half the batch overlaps the index, half is novel
        val batch = spark.range(nBatch).select(
          when(col("id") % 2 === 0, md5(concat(lit("doc"), col("id"))))
            .otherwise(md5(concat(lit("new"), col("id")))).as("fp"))
          .cache()
        batch.count()
        val plain = t("plain left_anti") {
          batch.join(index, Seq("fp"), "left_anti").count()
        }
        val bloomed = t("bloomPrunedAntiJoin (fpp 0.01)") {
          operators.Dedup.bloomPrunedAntiJoin(batch, index, "fp").count()
        }
        assert(plain == bloomed, s"mismatch: $plain vs $bloomed")
        graft.functions.BloomFunctions.register(spark)
        val bytes = graft.functions.BloomFunctions
          .buildHashedBloom(batch, "fp", nBatch, 0.01)
        val pruned = t("pruned-index row count") {
          index.filter(graft.functions.BloomFunctions
            .mightContainHashed(bytes, col("fp"))).count()
        }
        println(f"  index rows $nIndex -> pruned $pruned " +
          f"(${pruned.toDouble / nIndex * 100}%.2f%% would shuffle; " +
          f"bloom ${bytes.length / 1024} KiB)")
        operators.Lifecycle.deleteRecursively(java.nio.file.Paths.get(ixDir))

      case "knnskew" =>
        // Skew-guard smoke for IvfIndex.knnGraph: a corpus whose
        // cluster sizes are deliberately lopsided (one cluster holds
        // `hotFrac` of all vectors; the rest spread evenly) — the shape
        // where the unguarded partition-local self-join makes one task
        // do ~(hot/median)^2 of the median task's work. Reported:
        // wall with the guard OFF (maxClusterBlock = MaxValue, the r5
        // plan) vs ON (default cap), plus the max/median task-time
        // spread of the pair-join stage from Spark's task metrics —
        // the boundedness evidence the round-6 verdict asked for.
        val n = args.lift(1).map(_.toLong).getOrElse(200000L)
        val nclusters = args.lift(2).map(_.toInt).getOrElse(64)
        val hotFrac = args.lift(3).map(_.toDouble).getOrElse(0.25)
        val dim = 32
        val root = java.nio.file.Files.createTempDirectory("knn_skew")
        val hotN = (n * hotFrac).toLong
        val corpus = spark.range(n).select(
          col("id").as("vec_id"),
          when(col("id") < hotN, 0)
            .otherwise(pmod(col("id"), lit(nclusters - 1)).cast("int") + 1)
            .as("label"),
          transform(sequence(lit(0), lit(dim - 1)),
            j => (sin(col("id") * lit(131) + j * lit(17)))
              .cast("float")).as("embedding"))
        val ixPath = root.resolve("ivf").toString
        t(s"build skewed index: $n vecs, hot cluster = $hotN") {
          operators.IvfIndex.build(corpus, "vec_id", "embedding",
            "label", ixPath)
        }
        val index = operators.IvfIndex.load(spark, ixPath, "vec_id",
          "embedding", "label")
        // task-time spread listener: collect per-task run times of the
        // heaviest stage for each variant
        def runWithSpread(tag: String, cap: Int): Unit = {
          val times = scala.collection.mutable.ArrayBuffer.empty[Long]
          val listener = new org.apache.spark.scheduler.SparkListener {
            override def onTaskEnd(
                e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
              synchronized { times += e.taskInfo.duration }
          }
          spark.sparkContext.addSparkListener(listener)
          try t(s"knnGraph $tag") {
            operators.IvfIndex.knnGraph(index, k = 10,
              maxClusterBlock = cap).write.format("noop")
              .mode("overwrite").save()
          } finally spark.sparkContext.removeSparkListener(listener)
          val sorted = times.sorted
          if (sorted.nonEmpty) {
            val med = sorted(sorted.size / 2)
            println(s"  $tag tasks=${sorted.size} median=${med}ms " +
              s"max=${sorted.last}ms spread=${sorted.last.toDouble / math.max(med, 1)}")
          }
        }
        runWithSpread("guard OFF (single block)", Int.MaxValue)
        runWithSpread("guard ON  (cap 2048)", 2048)

      case "ann" =>
        // ANN-at-scale smoke: N synthetic 64-d embeddings with planted
        // cluster structure (center[c] + per-id noise) → IvfIndex.build
        // (partitioned-by-cluster corpus + medoid routing table) →
        // probed top-k at increasing nprobe. The evidence: build cost,
        // and probe wall tracking nprobe/nclusters (partition pruning
        // makes the scan fraction, not the corpus, the cost driver).
        val n = args.lift(1).map(_.toLong).getOrElse(1000000L)
        val nclusters = args.lift(2).map(_.toInt).getOrElse(256)
        val dim = 64
        val root = java.nio.file.Files.createTempDirectory("ann_scale")
        val corpus = spark.range(n).select(
          col("id").as("vec_id"),
          pmod(col("id"), lit(nclusters)).cast("int").as("label"),
          transform(sequence(lit(0), lit(dim - 1)),
            j => (sin(pmod(col("id"), lit(nclusters)) * lit(31) + j) +
              sin(col("id") * lit(131) + j * lit(17)) / lit(10))
              .cast("float")).as("embedding"))
        val ixPath = root.resolve("ivf").toString
        t(s"build IVF index: $n vecs x ${dim}d, $nclusters clusters") {
          operators.IvfIndex.build(corpus, "vec_id", "embedding",
            "label", ixPath)
        }
        val index = operators.IvfIndex.load(spark, ixPath, "vec_id",
          "embedding", "label")
        // cluster-LOCAL query batch (all from cluster 0): the probed
        // union stays ~nprobe clusters, so the wall measures the
        // partition-pruned scan fraction. A vec_id<1000 batch would
        // touch every cluster and never prune regardless of nprobe.
        val queries = corpus
          .filter(pmod(col("vec_id"), lit(nclusters)) === 0)
          .filter(col("vec_id") < 1000L * nclusters)
        Seq(1, 4, 16).foreach { nprobe =>
          val rows = t(s"topK k=10 nprobe=$nprobe (1000 cluster-local queries)") {
            operators.IvfIndex.topK(index, queries, k = 10,
              nprobe = nprobe).count()
          }
          println(s"  -> $rows result rows")
        }

      case "pqscale" =>
        // PQ-at-scale smoke: N synthetic 64-d embeddings → train
        // first-k codebooks, encode the whole corpus (scan-side
        // projection — the claim under test is that encoding is a
        // flat per-row cost with NO shuffle), then ADC top-10 for a
        // broadcast query batch. Evidence: encode wall linear in N,
        // topK wall linear in N (corpus scan) + constant LUT work.
        val n = args.lift(1).map(_.toLong).getOrElse(1000000L)
        val dim = 64
        val corpus = spark.range(n).select(
          col("id").as("vec_id"),
          transform(sequence(lit(0), lit(dim - 1)),
            j => (sin(pmod(col("id"), lit(256)) * lit(31) + j) +
              sin(col("id") * lit(131) + j * lit(17)) / lit(10))
              .cast("float")).as("embedding"))
        val books = t(s"train codebooks (m=8, k=256) over $n vecs") {
          operators.ProductQuant.trainCodebooks(corpus, "vec_id",
            "embedding", m = 8, k = 256)
        }
        Seq(n / 10, n).foreach { sz =>
          t(s"encode $sz vecs (m=8, k=256)") {
            operators.ProductQuant.encode(
                corpus.filter(col("vec_id") < sz),
                "vec_id", "embedding", books)
              .write.format("noop").mode("overwrite").save()
          }
        }
        val rows = t("ADC topK k=10, 10 queries, full corpus") {
          operators.ProductQuant.pqTopK(corpus,
            corpus.filter(col("vec_id") < 10), "vec_id", "embedding",
            m = 8, k = 256, topK = 10).count()
        }
        println(s"  -> $rows result rows")

      case "bpetrain" =>
        // BPE induction throughput: merges/sec over the sf-dir
        // documents corpus — one corpus scan builds word counts, then
        // each merge is a vocab-sized pair count + 1-row collect +
        // substitution, so the loop cost is vocabulary-, not
        // corpus-bound.
        val nMerges = args.lift(1).map(_.toInt).getOrElse(32)
        val docs = Tables.documents(spark, d)
        docs.count()
        val t0 = System.nanoTime()
        val ms = operators.Bpe.trainMerges(docs, "text", nMerges)
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"STAGE bpe train ${ms.size} merges: $secs%.2f s " +
          f"(${ms.size / secs}%.2f merges/sec)")
        println("  merges: " +
          ms.map(m => s"${m.lhs}+${m.rhs}:${m.pair_cnt}").mkString(", "))

      case "bloomjoin" =>
        // Runtime-filter shape: dim too big to broadcast (5M keys),
        // fact 50M rows at ~1% match rate -> SMJ shuffles all 50M
        // without the bloom, ~matches with it. args(1) = fact rows.
        import graft.operators.JoinPrune
        val n = args.lift(1).map(_.toLong).getOrElse(50000000L)
        val dimKeys = 5000000L
        // dim keys live in [0, 5e9) sparsely; fact keys uniform over
        // [0, 5e9) -> ~0.1% natural match rate
        val dim = spark.range(dimKeys)
          .select((col("id") * 1000L).as("k"), col("id").as("payload"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val fact = spark.range(n)
          .select(pmod(xxhash64(col("id")), lit(dimKeys * 1000L)).as("k"),
            (col("id") % 97).as("v"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        println(s"  dim=${dim.count()} fact=${fact.count()}")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        try {
          val plainN = t("plain SMJ join")(
            fact.join(dim, Seq("k")).agg(count(lit(1))).head().getLong(0))
          val bloom = t("bloom build (5M keys)")(
            graft.functions.BloomFunctions.buildHashedBloom(
              dim, "k", dimKeys, 0.01))
          println(s"  bloom bytes: ${bloom.length}")
          graft.functions.BloomFunctions.register(spark)
          val survivors = t("fact prefilter alone")(
            fact.filter(graft.functions.BloomFunctions
              .mightContainHashed(bloom, col("k"))).count())
          println(s"  survivors: $survivors of $n")
          val bloomN = t("bloom-pruned join end-to-end")(
            JoinPrune.bloomFilteredJoin(fact, dim, "k",
              expectedDimKeys = Some(dimKeys))
              .agg(count(lit(1))).head().getLong(0))
          println(s"  rows: plain=$plainN bloom=$bloomN (must match)")
        } finally {
          spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
          spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
          dim.unpersist(); fact.unpersist()
        }

      case "topk" =>
        // Window row_number vs mergeable TopKRows Aggregator at scale:
        // N rows (args(1), default 20M) over 1000 groups, k=5.
        // MEASURED: they tie (2.79s vs 2.54s at 20M) — Spark >=3.5's
        // WindowGroupLimit bounds the window path's shuffle too; the
        // Aggregator's value is composability, not raw speed.
        import graft.functions.TopKAgg
        val n = args.lift(1).map(_.toLong).getOrElse(20000000L)
        val src = spark.range(n).select(
          pmod(col("id"), lit(1000)).as("g"), col("id").as("rid"),
          xxhash64(col("id")).as("v"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        println(s"  rows: ${src.count()}")
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("g")).orderBy(col("v").desc, col("rid"))
        val viaWindow = t(s"window row_number top-5 of $n")(
          src.withColumn("rk", row_number().over(w))
            .filter(col("rk") <= 5).count())
        val viaAgg = t(s"TopKRows aggregator top-5 of $n")(
          src.groupBy(col("g"))
            .agg(TopKAgg.topK(col("rid"), col("v"), 5).as("top"))
            .select(posexplode(col("top"))).count())
        println(s"  rows kept: window=$viaWindow agg=$viaAgg (must match)")
        src.unpersist()

      case "hllscale" =>
        // HLL at cardinalities the sf-dirs can't produce: N distinct
        // keys (args(1), default 50M) through registers + estimate,
        // plus a 16-shard merge. The claims under test: one pass,
        // map-side combined (shuffle rows <= groups * 1024), flat
        // driver, and the 1.04/sqrt(1024) error band at real N.
        import graft.operators.Hll
        val n = args.lift(1).map(_.toLong).getOrElse(50000000L)
        val src = spark.range(n).select(
          concat(lit("k"), col("id")).as("k"),
          pmod(col("id"), lit(4)).as("g"))
        val regs = Hll.registers(src, col("k"), Seq("g"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val nRegs = t(s"registers over $n keys")(regs.count())
        println(s"  register rows: $nRegs (<= 4*1024)")
        val est = t("estimate")(
          Hll.estimate(regs, Seq("g"))
            .select(col("g"), col("est_raw")).collect())
        est.sortBy(_.getLong(0)).foreach { r =>
          val per = n / 4
          val err = (r.getLong(1) - per) * 100.0 / per
          println(f"  g=${r.getLong(0)} est=${r.getLong(1)} exact=$per err=$err%.2f%%")
        }
        val sharded = t("16-shard build + merge")(
          Hll.merge((0 until 16).map(p =>
            Hll.registers(src.filter(pmod(xxhash64(col("k")), lit(16)) === p),
              col("k"), Seq("g"))): _*))
        println(s"  merge == one-pass: ${
          sharded.exceptAll(regs).isEmpty && regs.exceptAll(sharded).isEmpty}")
        regs.unpersist()

      case "overlapscale" =>
        // KMV overlap at cardinalities where the sketch matters: two
        // N-item corpora (args(1), default 50M) with a known 1/3
        // Jaccard, per 4 groups. The claims under test: one map-side-
        // combined aggregation per side (k longs per group reach the
        // driver-free join), and the 1/sqrt(k) error band at real N.
        import graft.operators.Overlap
        val n = args.lift(1).map(_.toLong).getOrElse(50000000L)
        val k = args.lift(2).map(_.toInt).getOrElse(1024)
        def corpus(lo: Long, hi: Long) = spark.range(lo, hi).select(
          pmod(col("id"), lit(4)).cast("string").as("g"),
          // uniform 60-bit item hash (a non-wrapping multiplier is NOT
          // uniform over [0,2^60) and collapses the estimator — the
          // OverlapSpec lesson; ANSI mode also rejects wrapping
          // multiplies, so use the codegen'd xxhash64)
          shiftrightunsigned(xxhash64(col("id")), 4).as("h"))
        // A = [0, n), B = [n/2, 3n/2): |A∩B| = n/2, |A∪B| = 3n/2, J = 1/3
        val est = t(s"kmvOverlap over 2x$n items, k=$k")(
          Overlap.kmvOverlap(corpus(0, n), corpus(n / 2, n + n / 2),
            "g", "h", k).collect())
        est.sortBy(_.getString(0)).foreach { r =>
          val j = r.getAs[Double]("jaccard_est")
          println(f"  g=${r.getString(0)} est_union=${r.getAs[Double]("est_union")}%.0f " +
            f"est_int=${r.getAs[Double]("est_intersection")}%.0f " +
            f"jaccard=$j%.4f (true 0.3333, err ${(j - 1.0 / 3) * 300}%.2f%%)")
        }

      case "hamscale" =>
        // Binary-quantized ANN at corpus scale: N 64-dim vectors
        // (args(1), default 1M), 20 queries, k=10. The claims under
        // test: the codes-only candidate pass beats the float
        // brute-force wall (needs the STATIC popcount chain — the HOF
        // form ran interpreted at 7x the brute-force wall), and the
        // shortlist recall is usable ON DIRECTIONALLY CLUSTERED data:
        // members of a cluster share a base direction (±1 per dim) plus
        // small noise, so they agree on most SIGN bits — the structure
        // 1-bit codes can see. (A magnitude-dominant corpus with random
        // signs is adversarial by construction: sign quantization
        // erases magnitude, recall measured 0.07 on that shape.)
        import graft.operators.Similarity
        val n = args.lift(1).map(_.toLong).getOrElse(1000000L)
        val shortlist = args.lift(2).map(_.toInt).getOrElse(100)
        val cluster = pmod(col("id"), lit(256L)) // 256 directions
        val vecs = spark.range(n).select(col("id"),
          transform(sequence(lit(0), lit(63)), i =>
            (when(pmod(xxhash64(cluster, i), lit(2L)) === 0L, 1.0)
              .otherwise(-1.0) +
              lit(1.3) * (pmod(xxhash64(col("id"), i), lit(20001L)) - 10000L)
                .cast("double") / 10000.0).cast("float")).as("embedding"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        println(s"  corpus: ${vecs.count()} vectors")
        val queries = vecs.filter(col("id") < 20)
        val exact = t(s"bruteForceTopK @$n")(
          Similarity.bruteForceTopK(vecs, queries, "id", "embedding", k = 10)
            .collect())
        // sub-stage diagnosis: codes scan alone, then the full path
        t(s"signBits scan @$n")(
          vecs.select(Similarity.signBits(col("embedding"), 64).as("c"))
            .agg(sum(bit_count(element_at(col("c"), 1)))).head())
        val pairPass =
          vecs.select(col("id"), Similarity.signBits(col("embedding"), 64).as("c"))
            .join(broadcast(queries.select(col("id").as("qid"),
              Similarity.signBits(col("embedding"), 64).as("qc"))),
              col("qid") =!= col("id"))
            .select(Similarity.hammingDist(col("qc"), col("c"), 1).as("h"))
            .agg(sum(col("h")))
        t(s"hamming pair pass @$n")(pairPass.head())
        // variant: codes MATERIALIZED before the join — separates
        // per-left-row projection cost from per-pair cost
        val codesMat = vecs.select(col("id"),
          Similarity.signBits(col("embedding"), 64).as("c")).localCheckpoint()
        val pairPass2 = codesMat
          .join(broadcast(queries.select(col("id").as("qid"),
            Similarity.signBits(col("embedding"), 64).as("qc"))),
            col("qid") =!= col("id"))
          .select(Similarity.hammingDist(col("qc"), col("c"), 1).as("h"))
          .agg(sum(col("h")))
        t(s"hamming pair pass, materialized codes @$n")(pairPass2.head())
        operators.Lifecycle.releaseLocalCheckpoint(codesMat)
        val ham = t(s"hammingTopK @$n shortlist=$shortlist")(
          Similarity.hammingTopK(vecs, queries, "id", "embedding",
            dim = 64, k = 10, shortlist = shortlist).collect())
        val exactSet = exact.map(r => (r.getLong(0), r.getLong(1))).toSet
        val overlap = ham.count(r => exactSet.contains((r.getLong(0), r.getLong(1))))
        println(f"  recall@10 vs exact: ${overlap / (20.0 * 10)}%.3f " +
          f"(shortlist scans 1/32 of the vector bytes)")
        // STEADY STATE: the same serve off a PERSISTED HammingIndex —
        // the code build/materialization is amortized into the index,
        // so a query pays only codes scan + heap shortlist + rerank.
        // One cold serve (includes parquet footer reads) + two warm.
        val ixPath = java.nio.file.Files
          .createTempDirectory("hamix_scale").toString
        t(s"HammingIndex.build @$n")(
          operators.HammingIndex.build(vecs, "id", "embedding", 64, ixPath))
        val ix = operators.HammingIndex.load(spark, ixPath, "id")
        (1 to 3).foreach { r =>
          val served = t(s"HammingIndex.topK @$n serve$r")(
            operators.HammingIndex.topK(ix, vecs, queries, "embedding",
              k = 10, shortlist = shortlist).collect())
          if (r == 1) {
            val so = served.count(x =>
              exactSet.contains((x.getLong(0), x.getLong(1))))
            println(f"  served recall@10 vs exact: ${so / (20.0 * 10)}%.3f")
          }
        }
        vecs.unpersist()
        operators.Lifecycle.deleteRecursively(
          java.nio.file.Paths.get(ixPath))

      case "asofscale" =>
        // Native AsOfJoinExec (single merge pass) vs composed
        // union+window backward as-of at scale: N left + N right rows
        // (args(1), default 20M each) over N/200 keys. Equality gate:
        // matched-row count + sum of matched ts (ties resolve to the
        // same ts value in both formulations, so the checksum is
        // determined even where the matched row id is not).
        import graft.operators.AsOfJoin
        import graft.plans.AsOfJoinNative
        val n = args.lift(1).map(_.toLong).getOrElse(20000000L)
        val keys = math.max(n / 200, 1L)
        val lSrc = spark.range(n).select(
          col("id").as("lid"), pmod(xxhash64(col("id")), lit(keys)).as("key"),
          timestamp_micros(pmod(xxhash64(col("id"), lit(1)), lit(86400000000L))).as("ts"))
        val rSrc = spark.range(n).select(
          col("id").as("rid"), pmod(xxhash64(col("id"), lit(2)), lit(keys)).as("key"),
          timestamp_micros(pmod(xxhash64(col("id"), lit(3)), lit(86400000000L))).as("ts"),
          xxhash64(col("id"), lit(4)).as("payload"))
        def check(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
          val r = df.agg(
            count(col("asof_ts")).as("matched"),
            coalesce(sum(unix_micros(col("asof_ts"))), lit(0L)).as("sum_ts"))
            .head()
          (r.getLong(0), r.getLong(1))
        }
        // run1 of each carries JVM/JIT warmup (measured: native cold run
        // was 25.6s vs 4.3s steady) — compare the run2 numbers.
        var viaNative: (Long, Long) = null
        var viaWindow: (Long, Long) = null
        for (i <- 1 to 2) {
          viaNative = t(s"native AsOfJoinExec $n x $n run$i")(
            check(AsOfJoinNative.backward(lSrc, rSrc, Seq("key"), "ts", "ts")))
          viaWindow = t(s"composed union+window $n x $n run$i")(
            check(AsOfJoin.backward(lSrc, rSrc, Seq("key"), "ts", "ts")))
        }
        println(s"  native=$viaNative composed=$viaWindow (must match)")
        require(viaNative == viaWindow, "native != composed")

      case "asofbcast" =>
        // r13: broadcast-right as-of at the dimension-right shape —
        // N left rows (default 20M) against a ~1k-row timeline. The
        // merge exec shuffles+sorts the whole left side for a right
        // side that fits in one broadcast block; the broadcast exec
        // probes left IN PLACE. Equality-gated like asofscale.
        import graft.plans.AsOfJoinNative
        val n = args.lift(1).map(_.toLong).getOrElse(20000000L)
        val rN = args.lift(2).map(_.toLong).getOrElse(1000L)
        val keys = 16L
        val lSrc = spark.range(n).select(
          col("id").as("lid"), pmod(xxhash64(col("id")), lit(keys)).as("key"),
          timestamp_micros(pmod(xxhash64(col("id"), lit(1)), lit(86400000000L))).as("ts"))
        val rSrc = spark.range(rN).select(
          col("id").as("rid"), pmod(xxhash64(col("id"), lit(2)), lit(keys)).as("key"),
          timestamp_micros(pmod(xxhash64(col("id"), lit(3)), lit(86400000000L))).as("ts"),
          xxhash64(col("id"), lit(4)).as("payload"))
        def check(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
          val r = df.agg(
            count(col("asof_ts")).as("matched"),
            coalesce(sum(unix_micros(col("asof_ts"))), lit(0L)).as("sum_ts"))
            .head()
          (r.getLong(0), r.getLong(1))
        }
        var viaBcast: (Long, Long) = null
        var viaMerge: (Long, Long) = null
        for (i <- 1 to 2) {
          viaBcast = t(s"broadcast asof $n x $rN run$i")(
            check(AsOfJoinNative.backward(lSrc, rSrc, Seq("key"), "ts", "ts",
              broadcastRight = true)))
          viaMerge = t(s"merge asof $n x $rN run$i")(
            check(AsOfJoinNative.backward(lSrc, rSrc, Seq("key"), "ts", "ts")))
        }
        println(s"  broadcast=$viaBcast merge=$viaMerge (must match)")
        require(viaBcast == viaMerge, "broadcast != merge")

      case "asofdebug" =>
        import graft.operators.AsOfJoin
        import graft.plans.AsOfJoinNative
        val n = args.lift(1).map(_.toLong).getOrElse(20000000L)
        val keys = math.max(n / 200, 1L)
        val lSrc = spark.range(n).select(
          col("id").as("lid"), pmod(xxhash64(col("id")), lit(keys)).as("key"),
          timestamp_micros(pmod(xxhash64(col("id"), lit(1)), lit(86400000000L))).as("ts"))
        val rSrc = spark.range(n).select(
          col("id").as("rid"), pmod(xxhash64(col("id"), lit(2)), lit(keys)).as("key"),
          timestamp_micros(pmod(xxhash64(col("id"), lit(3)), lit(86400000000L))).as("ts"),
          xxhash64(col("id"), lit(4)).as("payload"))
        // baseline: just shuffle+sort both sides, no merge
        t("shuffle+sort left only")(
          lSrc.repartition(col("key")).sortWithinPartitions("key", "ts")
            .select(count(lit(1))).head())
        t("shuffle+sort right only")(
          rSrc.repartition(col("key")).sortWithinPartitions("key", "ts")
            .select(count(lit(1))).head())
        val nat = AsOfJoinNative.backward(lSrc, rSrc, Seq("key"), "ts", "ts")
        nat.explain("formatted")
        for (i <- 1 to 2)
          t(s"native run$i")(nat.agg(count(col("asof_ts"))).head())
        val comp = AsOfJoin.backward(lSrc, rSrc, Seq("key"), "ts", "ts")
        for (i <- 1 to 2)
          t(s"composed run$i")(comp.agg(count(col("asof_ts"))).head())

      case "normdefer" =>
        // Does the BNLJ per-pair deferral (hamscale finding) also tax
        // bruteForceTopK's per-row norms? Pass A: norms projected below
        // the join (the operator's shape). Pass B: norms materialized.
        import graft.operators.{Lifecycle, Similarity}
        graft.functions.VectorFunctions.register(spark)
        val n = args.lift(1).map(_.toLong).getOrElse(1000000L)
        val vecs = spark.range(n).select(col("id"),
          transform(sequence(lit(0), lit(63)), i =>
            ((pmod(xxhash64(col("id"), i), lit(20001L)) - 10000L)
              .cast("double") / 10000.0).cast("float")).as("embedding"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        println(s"  corpus: ${vecs.count()} vectors")
        val qs = broadcast(vecs.filter(col("id") < 20).select(
          col("id").as("qid"), col("embedding").as("qv"),
          Similarity.norm(col("embedding")).as("qn")))
        def score(c: org.apache.spark.sql.DataFrame) = c
          .join(qs, col("qid") =!= col("id"))
          .select((Similarity.dot(col("qv"), col("embedding")) /
            (col("qn") * col("cn"))).as("s"))
          .agg(sum(col("s"))).head()
        val plain = vecs.select(col("id"), col("embedding"),
          Similarity.norm(col("embedding")).as("cn"))
        t(s"pair scoring, norms below join @$n")(score(plain))
        val mat = Lifecycle.materializeToScratch(plain)
        t(s"pair scoring, norms materialized @$n")(score(mat))
        vecs.unpersist()

      case "pcascale" =>
        // PCA Gram pass at corpus scale: N 64-dim vectors (args(1),
        // default 1M). The claims under test: fit is ONE aggregation
        // (map-side combined 17KB buffers), wall linear in N, and the
        // recovered axis matches the planted anisotropy.
        import graft.operators.Pca
        val n = args.lift(1).map(_.toLong).getOrElse(1000000L)
        val vecs = spark.range(n).select(col("id"),
          transform(sequence(lit(0), lit(63)), i =>
            (when(i === 5, 3.0).otherwise(0.03) *
              (pmod(xxhash64(col("id"), i), lit(20001L)) - 10000L)
                .cast("double") / 10000.0).cast("float")).as("embedding"))
        val m = t(s"Pca.fit over $n x64")(
          Pca.fit(vecs, "embedding", d = 64, nComponents = 2, iters = 30))
        println(f"  ev1=${m.eigenvalues(0)}%.4f ev2=${m.eigenvalues(1)}%.4f " +
          f"v1[6]=${m.components(0)(5)}%.4f (planted axis 5)")

      case "lmscale" =>
        // Bigram LM at corpus scale: N synthetic docs (args(1), default
        // 2M) of 40 tokens from a 50k-word zipf-ish vocab, trained on
        // the 20% slice, scored end-to-end. The claims under test: the
        // two count joins + per-doc aggregate survive 80M scoring
        // bigrams, and throughput is join-bound, not driver-bound.
        import graft.operators.BigramLm
        val n = args.lift(1).map(_.toLong).getOrElse(2000000L)
        val words = 50000L
        // doc text: 40 words; squaring a uniform draw skews the vocab
        // toward low ids (a crude zipf stand-in with realistic reuse)
        val docs = spark.range(n).select(col("id").as("doc_id"),
          concat_ws(" ", (0 until 40).map { i =>
            val u = pmod(xxhash64(col("id") * 40 + i), lit(words))
            // u² div words: exact in doubles (u² < 2^53)
            concat(lit("w"), floor((u * u) / lit(words)).cast("long"))
          }: _*).as("text"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        println(s"  docs: ${docs.count()}")
        val scored = t(s"train(20%) + score $n docs")(
          BigramLm.scoreDocs(docs,
            docs.filter(pmod(col("doc_id"), lit(5)) === 0),
            "doc_id", "text")
            .agg(count(lit(1)), avg(col("avg_nll_milli"))).collect())
        println(s"  scored: ${scored.mkString}")
        docs.unpersist()

      case "timertie" =>
        // Boundary pin for q151's oracle: does a timer whose expiry
        // EQUALS the watermark fire? Arm user 1's timer at exactly
        // 10:01:00.000 (event 10:00:00 + 60s gap); a user-2 event at
        // 10:01:10.000 with a 10s delay puts the watermark at exactly
        // 10:01:00.000. If user 1 emits before the far-future flush,
        // the comparison is `expiry <= watermark`; if only after, `<`.
        import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
        import org.apache.spark.sql.streaming.Trigger
        import graft.streaming.EventStreams
        import spark.implicits._
        spark.conf.set("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        implicit val sqlCtx = spark.sqlContext
        val in = MemoryStream[EventStreams.Event]
        def ev(id: Long, t: String, user: Long) = EventStreams.Event(
          id, java.sql.Timestamp.valueOf(t), user, "click", 1.0, "{}")
        val q = EventStreams.timerSessions(
            in.toDS().withWatermark("ts", "10 seconds"), gapMs = 60000L)
          .writeStream.format("memory").queryName("timer_tie")
          .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
        try {
          in.addData(ev(1, "2026-01-01 10:00:00", 1))
          q.processAllAvailable()
          in.addData(ev(2, "2026-01-01 10:01:10", 2))
          q.processAllAvailable()
          val atTie = spark.table("timer_tie")
            .as[EventStreams.SessionSummary].collect().toList
          println(s"at exact tie (wm == expiry): $atTie")
          in.addData(ev(3, "2026-01-01 12:00:00", 3))
          q.processAllAvailable()
          val after = spark.table("timer_tie")
            .as[EventStreams.SessionSummary].collect().toList
          println(s"after flush: $after")
          println(if (atTie.exists(_.user_id == 1L))
            "VERDICT: expiry <= watermark fires (ties FIRE)"
          else "VERDICT: expiry < watermark fires (ties HOLD)")
        } finally q.stop()

      case "timerscratch" =>
        // Microscope on transformWithState event-time timer mechanics:
        // which micro-batch (data vs no-data) fires timers, and how
        // emissions attribute to file-timeline drains — the empirical
        // basis for q151's oracle.
        import org.apache.spark.sql.{Dataset, Row}
        import graft.streaming.EventStreams
        val events = Tables.events(spark, d)
          .select(col("event_id"), col("ts"), col("user_id"),
            col("event_type"), col("value"), col("props"))
        val half = events
          .agg((min(unix_micros(col("ts"))) +
            ((max(unix_micros(col("ts"))) - min(unix_micros(col("ts")))) / 2)
              .cast("long")).as("h")).head().getLong(0)
        val gmax = events.agg(max(unix_micros(col("ts")))).head().getLong(0)
        println(s"half=$half gmax=$gmax")
        val dir = java.nio.file.Files
          .createTempDirectory("graft_timerscratch_").toString
        val srcDir = s"$dir/in"
        def arrive(df: org.apache.spark.sql.DataFrame): Unit =
          df.coalesce(1).write.mode("append")
            .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
            .json(srcDir)
        arrive(events.filter(unix_micros(col("ts")) <= half))
        val drain = new java.util.concurrent.atomic.AtomicInteger(0)
        import spark.implicits._
        spark.conf.set("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        val query = EventStreams.timerSessions(
            EventStreams.readJsonStream(spark, srcDir)
              .withWatermark("ts", "1 hour").as[EventStreams.Event],
            gapMs = 30L * 60 * 1000)
          .writeStream.outputMode("append")
          .option("checkpointLocation", s"$dir/ckpt")
          .foreachBatch { (emitted: Dataset[EventStreams.SessionSummary],
              batchId: Long) =>
            val rows = emitted.collect()
            println(s"DRAIN ${drain.get()} batch $batchId: " +
              s"${rows.length} emitted" +
              (if (rows.nonEmpty)
                 rows.sortBy(_.user_id).take(8).mkString(" [", ", ", "…]")
               else ""))
          }
          .start()
        try {
          query.processAllAvailable()
          drain.incrementAndGet()
          arrive(events.filter(unix_micros(col("ts")) > half))
          query.processAllAvailable()
          drain.incrementAndGet()
          arrive(spark.range(1).select(lit(999999L).as("event_id"),
            timestamp_micros(lit(gmax + 7L * 86400000000L)).as("ts"),
            lit(999999L).as("user_id"), lit("flush").as("event_type"),
            lit(0.0).as("value"), lit("{}").as("props")))
          query.processAllAvailable()
          drain.incrementAndGet()
          arrive(spark.range(1).select(lit(999998L).as("event_id"),
            timestamp_micros(lit(gmax + 14L * 86400000000L)).as("ts"),
            lit(999998L).as("user_id"), lit("flush").as("event_type"),
            lit(0.0).as("value"), lit("{}").as("props")))
          query.processAllAvailable()
        } finally query.stop()
        println("done; per-user session count sanity follows")

      case "ivfpqdebug" =>
        // One-query microscope on the ivfpqscale pipeline: where does
        // recall leak — routing, encoding, or ADC ranking?
        val n = args.lift(1).map(_.toLong).getOrElse(20000L)
        val nclusters = args.lift(2).map(_.toInt).getOrElse(16)
        val (pqM, pqK) = (8, 256)
        val dim = 64
        val groupSize = 20
        val grp = expr(s"id div $groupSize")
        def u(salt: Int, key: org.apache.spark.sql.Column,
            j: org.apache.spark.sql.Column) =
          (pmod(xxhash64(lit(salt), key, j), lit(2001)) - lit(1000))
            .cast("double") / lit(1000.0)
        val corpus = spark.range(n).select(
          col("id").as("vec_id"),
          transform(sequence(lit(0), lit(dim - 1)),
            j => (u(1, pmod(grp, lit(nclusters)), j) +
              u(2, grp, j) / lit(8) +
              u(3, col("id"), j) / lit(64))
              .cast("float")).as("embedding")).cache()
        val (cs, ps) = (math.max(1L, n / nclusters), math.max(1L, n / pqK))
        val model = operators.IvfPq.train(corpus, "vec_id", "embedding",
          kc = nclusters, coarseIters = 1, m = pqM, k = pqK, pqIters = 1,
          coarseSeedStride = cs, pqSeedStride = ps)
        val assigned = operators.IvfPq.residuals(
          corpus, "vec_id", "embedding", model.centroids)
          .select(col("vec_id"), col("cluster"))
        println("cluster of 0 and mates 1..19, + counts:")
        assigned.filter(col("vec_id") < 20).orderBy("vec_id").show(20)
        val enc = operators.IvfPq.encodeAssigned(
          corpus, "vec_id", "embedding", model)
        println("codes of 0 and mates 1..19:")
        enc.filter(col("vec_id") < 20).orderBy("vec_id").show(20, false)
        val q = corpus.filter(col("vec_id") === 0)
        println("exact top-10:")
        operators.Similarity.bruteForceTopK(corpus, q, "vec_id",
          "embedding", k = 10).orderBy("rank").show(10)
        val path = java.nio.file.Files.createTempDirectory("ivfpq_dbg")
          .resolve("i").toString
        operators.IvfPq.build(corpus, "vec_id", "embedding",
          kc = nclusters, coarseIters = 1, m = pqM, k = pqK, pqIters = 1,
          path, coarseSeedStride = cs, pqSeedStride = ps)
        val idx = operators.IvfPq.load(spark, path, "vec_id")
        println("ADC top-20 (nprobe=half):")
        operators.IvfPq.topK(idx, q, "embedding", k = 20,
          nprobe = math.max(4, nclusters / 8)).orderBy("rank").show(20)
        // replicate the ivfpqscale overlap measurement per query
        val queries20 = corpus.filter(
          pmod(col("vec_id"), lit(groupSize)) === 0 &&
            col("vec_id") < 20 * groupSize)
        val e20 = operators.Similarity.bruteForceTopK(corpus, queries20,
            "vec_id", "embedding", k = 10)
          .select(col("query_id"), col("neighbor_id"))
        val a20 = operators.IvfPq.topK(idx, queries20, "embedding",
          k = 10, nprobe = math.max(4, nclusters / 8))
        println("per-query overlap of ADC top-10 with exact top-10:")
        e20.join(a20.select(col("query_id").as("qq"),
              col("neighbor_id").as("qn")),
            col("query_id") === col("qq") &&
              col("neighbor_id") === col("qn"), "left")
          .groupBy(col("query_id")).agg(count(col("qn")).as("nc"))
          .orderBy("query_id").show(20)

      case "ivfpqscale" =>
        // IVF-PQ at scale: N vectors with PLANTED LOCAL STRUCTURE →
        // IvfPq.build (coarse train + residual encode, codes
        // partitioned by cluster) → recall vs the exact top-10 for 20
        // queries, with flat PQ at the SAME m/k code budget side by
        // side. The corpus is 3-scale: coarse cluster center (the IVF
        // routing signal) + a per-GROUP offset at 1/8 amplitude
        // (groups of 20 members — each point's true neighborhood) +
        // 1/64 per-member jitter. A purely-iid corpus is the WRONG
        // measurement at 1M: nearest-neighbor distances concentrate
        // (top-10 of 15k iid in-cluster points are no closer than
        // rank-1000), so every quantizer scores 0.00 — measured here
        // for both variants at m=4/k=16 AND m=8/k=256. Real embedding
        // spaces have low intrinsic dimension locally; the planted
        // groups model that, and make recall measure the OPERATOR
        // (residual books resolve group offsets that flat books spend
        // on cluster centers), not distance concentration.
        val n = args.lift(1).map(_.toLong).getOrElse(1000000L)
        val nclusters = args.lift(2).map(_.toInt).getOrElse(64)
        // 8 bytes/vector (m=8, k=256) by default — the production PQ
        // budget
        val pqM = args.lift(3).map(_.toInt).getOrElse(8)
        val pqK = args.lift(4).map(_.toInt).getOrElse(256)
        val pqIters = args.lift(5).map(_.toInt).getOrElse(1)
        val refine = args.lift(6).map(_.toInt).getOrElse(10)
        // components are HASH-uniform, not sin(linear): sin(g·131+…)
        // aliases — 272·131 mod 2π ≈ 0.015, so "distinct" groups 0 and
        // 272 collided at cos 1.0000 (and clusters 0/15 likewise),
        // which put alias-twins in every true top-10 at separations
        // below any quantizer's resolution. xxhash64 avalanche has no
        // rational-angle structure, so neighborhoods are genuinely
        // distinct at every scale.
        val dim = 64
        val groupSize = 20
        val grp = expr(s"id div $groupSize")
        def u(salt: Int, key: org.apache.spark.sql.Column,
            j: org.apache.spark.sql.Column) =
          (pmod(xxhash64(lit(salt), key, j), lit(2001)) - lit(1000))
            .cast("double") / lit(1000.0)
        val corpus = spark.range(n).select(
          col("id").as("vec_id"),
          transform(sequence(lit(0), lit(dim - 1)),
            j => (u(1, pmod(grp, lit(nclusters)), j) +
              u(2, grp, j) / lit(8) +
              u(3, col("id"), j) / lit(64))
              .cast("float")).as("embedding"))
        val path = java.nio.file.Files.createTempDirectory("ivfpq_scale")
          .resolve("ivfpq").toString
        // strided seeding (≈ n/k): first-k seeds cover only the first
        // ~k/groupSize neighborhoods on id-correlated data and the
        // codebook starts degenerate — measured 0.00 overlap for both
        // variants at both 16-bit and 64-bit codes before the stride
        val (cStride, pStride) =
          (math.max(1L, n / nclusters), math.max(1L, n / pqK))
        t(s"IvfPq.build: $n vecs, kc=$nclusters (1 Lloyd), m=$pqM k=$pqK " +
            s"($pqIters Lloyd), strides=$cStride/$pStride") {
          operators.IvfPq.build(corpus, "vec_id", "embedding",
            kc = nclusters, coarseIters = 1, m = pqM, k = pqK,
            pqIters = pqIters,
            path, coarseSeedStride = cStride, pqSeedStride = pStride)
        }
        val idx = operators.IvfPq.load(spark, path, "vec_id")
        // one member from each of 20 DISTINCT groups (ids 0, 20, …,
        // 380): a query's true top-10 are its 19 group-mates
        val queries = corpus.filter(
          pmod(col("vec_id"), lit(groupSize)) === 0 &&
            col("vec_id") < 20 * groupSize)
        def overlap(approx: org.apache.spark.sql.DataFrame): Double = {
          val e = operators.Similarity.bruteForceTopK(corpus, queries,
              "vec_id", "embedding", k = 10)
            .select(col("query_id"), col("neighbor_id"))
          e.join(approx.select(col("query_id").as("qq"),
                col("neighbor_id").as("qn")),
              col("query_id") === col("qq") &&
                col("neighbor_id") === col("qn"), "left")
            .groupBy(col("query_id")).agg(count(col("qn")).as("nc"))
            .agg(avg(col("nc"))).head.getDouble(0)
        }
        val probe = math.max(4, nclusters / 8)
        val ivfTop = t(s"IvfPq.topK k=10 nprobe=$probe (20 queries)") {
          operators.IvfPq.topK(idx, queries, "embedding", k = 10,
            nprobe = probe)
        }
        val ivfRecall = t("recall IVF-PQ vs exact (incl. exact scan)") {
          overlap(ivfTop)
        }
        val refRecall = t(s"recall IVF-PQ + exact refine x$refine vs exact") {
          overlap(operators.IvfPq.topKRefined(idx, corpus, queries,
            "embedding", k = 10, nprobe = probe, refine = refine))
        }
        val flatRecall = t("recall flat PQ (same m/k + stride) vs exact") {
          overlap(operators.ProductQuant.pqTopK(corpus, queries,
            "vec_id", "embedding", m = pqM, k = pqK, topK = 10,
            lloydIters = pqIters, seedStride = pStride))
        }
        println(f"  -> mean top-10 overlap: ivfpq=$ivfRecall%.2f " +
          f"refined=$refRecall%.2f flat=$flatRecall%.2f " +
          f"(n=$n, kc=$nclusters, m=$pqM, k=$pqK, iters=$pqIters, " +
          f"refine=$refine, nprobe=$probe)")

      case "invscale" =>
        // Inverted-index-at-scale smoke: N synthetic 30-token docs over
        // a 100k-term vocabulary → build the bucket-partitioned index,
        // then measure a 3-term search at N/10 and N, against the
        // no-index baseline (BM25's full tokenize-scan-score at N).
        // Claims under test: build is linear; search reads only probed
        // buckets (wall ≈ probed fraction of the index, far under the
        // full-scan baseline); results equal between sizes where the
        // smaller corpus is a prefix.
        val n = args.lift(1).map(_.toLong).getOrElse(1000000L)
        def docsOf(sz: Long) = spark.range(sz).select(
          col("id").as("doc_id"),
          concat_ws(" ", transform(sequence(lit(0), lit(29)),
            j => concat(lit("w"),
              pmod(col("id") * 31L + j * 7L, lit(100000L))))).as("text"))
        val terms = Seq("w123", "w456", "w789")
        def dirBytesOf(path: String): Long = {
          val p = new org.apache.hadoop.fs.Path(path)
          p.getFileSystem(spark.sessionState.newHadoopConf())
            .getContentSummary(p).getLength
        }
        Seq(n / 10, n).foreach { sz =>
          Seq(true, false).foreach { positional =>
            val mode = if (positional) "positional" else "lean"
            val dir = java.nio.file.Files
              .createTempDirectory(s"invscale_$sz").toString
            t(s"build $mode index over $sz docs (64 buckets)") {
              operators.InvertedIndex.build(docsOf(sz), "doc_id", "text",
                nBuckets = 64, dir, positions = positional)
            }
            println(f"  -> $mode index: ${dirBytesOf(dir)}%,d bytes")
            val idx = operators.InvertedIndex.load(spark, dir)
            val rows = t(s"search 3 terms @$sz ($mode)") {
              operators.InvertedIndex.search(idx, terms, k = 20).count()
            }
            println(s"  -> $rows hits @$sz")
            operators.Lifecycle.deleteRecursively(
              java.nio.file.Paths.get(dir))
          }
        }
        t(s"no-index baseline: bm25TopK full scan @$n") {
          operators.Retrieval.bm25TopK(docsOf(n), "doc_id", "text",
            terms, k = 20).count()
        }

      case "gensf1" =>
        // sf1.0 dataset for the order-of-magnitude bench step: 10
        // id-shifted copies of every sf0.1 table, written as parquet the
        // full Bench suite runs against unmodified
        // (SPARK_GRAFT_SF_DIR=<out>). Shift rules keep the data SHAPED
        // like a bigger sf, not like 10 overlaid clones:
        //  - every key domain shifts by copy*(max+1), consistently
        //    across fact/dim references, so join fan-outs stay 1:1;
        //  - document tokens get a per-copy suffix, so cross-copy text
        //    similarity is zero and the dup-RATE (what dedup cost
        //    scales with) matches sf0.1 instead of every doc gaining 9
        //    identical twins;
        //  - embeddings get a per-copy deterministic Rademacher sign
        //    flip — an orthogonal transform, so intra-copy cosines (and
        //    per-cluster ANN structure) are preserved EXACTLY while
        //    cross-copy cosines land near 0;
        //  - event timestamps are untouched: same window range at 10×
        //    density is what a 10× traffic year looks like.
        val copies = args.lift(1).map(_.toInt).getOrElse(10)
        val outDir = args.lift(2).getOrElse("/tmp/graft_sf1.0")
        def maxOf(tbl: String, c: String): Long =
          spark.read.parquet(s"$d/$tbl.parquet")
            .agg(max(col(c))).head.getLong(0) + 1
        val (ordU, custU, suppU, partU) = (maxOf("orders", "o_orderkey"),
          maxOf("customer", "c_custkey"), maxOf("supplier", "s_suppkey"),
          maxOf("part", "p_partkey"))
        val (docU, vecU) = (maxOf("documents", "doc_id"),
          maxOf("embeddings", "vec_id"))
        val (evU, userU) = (maxOf("events", "event_id"),
          maxOf("events", "user_id"))
        def scaled(tbl: String, files: Int)(
            shift: (org.apache.spark.sql.DataFrame, Int) =>
              org.apache.spark.sql.DataFrame): Unit = {
          val base = spark.read.parquet(s"$d/$tbl.parquet")
          val out = (0 until copies).map(i => shift(base, i))
            .reduce(_ unionByName _)
          t(s"write $tbl x$copies") {
            out.repartition(files)
              .write.mode("overwrite").parquet(s"$outDir/$tbl.parquet")
          }
        }
        def bump(c: String, unit: Long, i: Int) =
          (col(c) + lit(unit * i)).as(c)
        scaled("region", 1)((df, _) => df)
        scaled("nation", 1)((df, _) => df)
        scaled("customer", 8)((df, i) =>
          df.withColumn("c_custkey", bump("c_custkey", custU, i)))
        scaled("supplier", 4)((df, i) =>
          df.withColumn("s_suppkey", bump("s_suppkey", suppU, i)))
        scaled("part", 8)((df, i) =>
          df.withColumn("p_partkey", bump("p_partkey", partU, i)))
        scaled("orders", 16)((df, i) => df
          .withColumn("o_orderkey", bump("o_orderkey", ordU, i))
          .withColumn("o_custkey", bump("o_custkey", custU, i)))
        scaled("lineitem", 32)((df, i) => df
          .withColumn("l_orderkey", bump("l_orderkey", ordU, i))
          .withColumn("l_partkey", bump("l_partkey", partU, i))
          .withColumn("l_suppkey", bump("l_suppkey", suppU, i)))
        scaled("events", 32)((df, i) => df
          .withColumn("event_id", bump("event_id", evU, i))
          .withColumn("user_id", bump("user_id", userU, i)))
        scaled("documents", 32) { (df, i) =>
          val text =
            if (i == 0) col("text")
            else concat_ws(" ", transform(split(col("text"), " "),
              tok => concat(tok, lit(s"~$i"))))
          df.withColumn("doc_id", bump("doc_id", docU, i))
            .withColumn("text", text)
            .withColumn("n_chars", length(col("text")).cast("long"))
        }
        val dim = spark.read.parquet(s"$d/embeddings.parquet")
          .select(size(col("embedding"))).head.getInt(0)
        scaled("embeddings", 16) { (df, i) =>
          val signs = array((0 until dim).map { j =>
            val s = if (i == 0) 1f
              else if ((scala.util.hashing.MurmurHash3
                .productHash((i, j)) & 1) == 0) 1f else -1f
            lit(s)
          }: _*)
          df.withColumn("vec_id", bump("vec_id", vecU, i))
            .withColumn("embedding",
              zip_with(col("embedding"), signs,
                (v, s) => (v * s).cast("float")))
        }
        Seq("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings").foreach { tbl =>
          println(s"  $tbl: " +
            spark.read.parquet(s"$outDir/$tbl.parquet").count() + " rows")
        }

      case "cdcscale" =>
        // The r7-verdict measurement: per-batch WRITE VOLUME of the
        // bucketed CDC table must track the batch, not the table.
        // Base = sf0.1 orders ×10 (≈15M rows); batches touch ~1k keys.
        // Printed: bytes written per generation for flat vs bucketed,
        // and the bucketed/flat ratio (expect ≈ touchedBuckets/nBuckets).
        val copies = args.lift(1).map(_.toInt).getOrElse(10)
        val nBuckets = args.lift(2).map(_.toInt).getOrElse(1024)
        val ord = spark.read.parquet(s"$d/orders.parquet")
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        val maxKey = ord.agg(max(col("o_orderkey"))).head.getLong(0) + 1
        val big = (0 until copies).map(i => ord.withColumn("o_orderkey",
          col("o_orderkey") + lit(maxKey * i))).reduce(_ unionByName _)
        def dirBytes(path: String): Long = {
          val p = new org.apache.hadoop.fs.Path(path)
          val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
          if (!fs.exists(p)) 0L
          else fs.getContentSummary(p).getLength
        }
        def batchOf(lo: Long, n: Long) = big
          .filter(col("o_orderkey") >= lo && col("o_orderkey") < lo + n)
          .select(lit("update").as("op"), col("o_orderkey"),
            lit("U").as("o_orderstatus"), col("o_totalprice"))
        val bktDir = java.nio.file.Files
          .createTempDirectory("cdcscale_bkt").toString
        val flatDir = java.nio.file.Files
          .createTempDirectory("cdcscale_flat").toString
        val bkt = new streaming.BucketedCdcTable(
          spark, bktDir, "o_orderkey", nBuckets)
        t(s"bucketed publish ${copies}x orders")(bkt.publish(big))
        val flat = new streaming.CdcTable(spark, flatDir, "o_orderkey")
        t("flat publish")(flat.publish(big))
        val baseBytes = dirBytes(s"$bktDir/data/gen=0")
        println(f"base snapshot: $baseBytes%,d bytes, $nBuckets buckets")
        Seq(100L, 1000L, 10000L).zipWithIndex.foreach { case (n, i) =>
          val g = i + 1
          val b = batchOf(1000L + 20000L * i, n)
          t(s"bucketed batch $g ($n keys)")(bkt.applyBatch(b))
          t(s"flat batch $g ($n keys)")(flat.applyBatch(b))
          val bw = dirBytes(s"$bktDir/data/gen=$g")
          val fw = dirBytes(s"$flatDir/gen=$g")
          // touched buckets is the scale-transferable number: write
          // volume = touched × bucketBytes, and at production sizes a
          // bucket is a ~256 MB file, so parquet footer overhead (which
          // dominates these 28 KB toy buckets) vanishes
          val touched = spark.read
            .parquet(s"$bktDir/manifest/gen=$g")
            .filter(col("data_gen") === g).count()
          println(f"batch $g%d ($n%,d keys): touched $touched%,d/" +
            f"$nBuckets%,d buckets (${touched.toDouble / nBuckets}%.4f), " +
            f"bucketed wrote $bw%,d B, flat wrote $fw%,d B, " +
            f"ratio ${bw.toDouble / fw}%.4f")
        }
        println(s"bucketed snapshot rows: ${bkt.snapshot.count()}")

      case "vacuumscale" =>
        // r13: bytes-on-disk under CONTINUOUS ingest must be BOUNDED
        // with retention and grow linearly without. Two identical
        // bucketed CDC tables fold the same update batches; one runs
        // vacuum(retainLast) every `every` batches. Printed: total
        // table bytes after each janitor cycle for both, and the final
        // ratio. Snapshot equality at the end pins that the janitor
        // never touched a retained row.
        val nBatches = args.lift(1).map(_.toInt).getOrElse(24)
        val every = args.lift(2).map(_.toInt).getOrElse(4)
        val retain = args.lift(3).map(_.toInt).getOrElse(6)
        val ord = spark.read.parquet(s"$d/orders.parquet")
          .select(col("o_orderkey"), col("o_orderstatus"),
            col("o_totalprice"))
        def dirBytes(path: String): Long = {
          val p = new org.apache.hadoop.fs.Path(path)
          val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
          if (!fs.exists(p)) 0L else fs.getContentSummary(p).getLength
        }
        val vacDir = java.nio.file.Files
          .createTempDirectory("vacscale_vac").toString
        val ctlDir = java.nio.file.Files
          .createTempDirectory("vacscale_ctl").toString
        val vac = new streaming.BucketedCdcTable(
          spark, vacDir, "o_orderkey", nBuckets = 64)
        val ctl = new streaming.BucketedCdcTable(
          spark, ctlDir, "o_orderkey", nBuckets = 64)
        t("publish both")(Seq(vac, ctl).foreach(_.publish(ord)))
        (1 to nBatches).foreach { i =>
          val b = ord
            .filter(col("o_orderkey") % 1000L >= (i * 37) % 1000L &&
              col("o_orderkey") % 1000L < (i * 37) % 1000L + 10L)
            .select(lit("update").as("op"), col("o_orderkey"),
              lit(s"U$i").as("o_orderstatus"), col("o_totalprice"))
          vac.applyBatch(b); ctl.applyBatch(b)
          if (i % every == 0) {
            vac.vacuum(retain)
            println(f"after batch $i%3d: vacuumed ${dirBytes(vacDir)}%,13d B" +
              f" (floor ${vac.retentionFloor}%3d)   " +
              f"control ${dirBytes(ctlDir)}%,13d B")
          }
        }
        vac.vacuum(retain) // final sweep of the last mark
        val vb = dirBytes(vacDir); val cb = dirBytes(ctlDir)
        println(f"final: vacuumed $vb%,d B vs control $cb%,d B " +
          f"(${vb.toDouble / cb}%.3f of unbounded)")
        val a = vac.snapshot.orderBy("o_orderkey").collect()
        val c2 = ctl.snapshot.orderBy("o_orderkey").collect()
        println(s"snapshots equal: ${a.sameElements(c2)} (${a.length} rows)")

      case "sdedupscale" =>
        // Scale smoke for the incremental-dedup family under the
        // RECORDED ADAPTIVE shape (verdict r10 #4): the q82 on-disk
        // ingest (4 batches, index probe, mid-run compaction) on the
        // documents table of the given dir, blocking shape sized from
        // the corpus count at index creation. Run at sf0.1 and
        // /tmp/graft_sf1.0 and compare walls (target: <=~8x at 10x).
        import graft.streaming.StreamingDedup
        val docs = Tables.documents(spark, d)
        val nDocs = docs.count() // also the warm scan
        (1 to 2).foreach { rep =>
          val root = java.nio.file.Files
            .createTempDirectory("sdedupscale").toString
          val ix = s"$root/ix"; val out = s"$root/out"
          val shape = StreamingDedup.createTextIndex(spark, ix, nDocs,
            portable = true)
          if (rep == 1) println(s"  n=$nDocs adaptive shape: $shape")
          val blocks = StreamingDedup.textBlocks(spark, ix, "doc_id", "text")
          t(s"ingest 4 batches @$nDocs rep$rep") {
            (0 until 4).foreach { k =>
              val batch = docs.filter(pmod(col("doc_id"), lit(4)) === k)
              val (novel, novelBlocks) = StreamingDedup.processBatch(batch,
                StreamingDedup.readIndex(spark, ix, k), "doc_id", blocks)
              novel.write.mode("overwrite").parquet(s"$out/ingest_batch=$k")
              novelBlocks.write.mode("overwrite")
                .parquet(s"$ix/ingest_batch=$k")
              operators.Lifecycle.release(novelBlocks)
              if (k == 2) StreamingDedup.compactIndex(spark, ix)
            }
          }
          println(s"  admitted: " +
            StreamingDedup.readCorpus(spark, out).get.count())
          operators.Lifecycle.deleteRecursively(
            java.nio.file.Paths.get(root))
        }

      case "q86prof" =>
        // Stage-level timing of q86_retracted_dedup (the r10->r11
        // regression hunt): same code as DedupQueries.retractedDedupQ,
        // t() around every stage.
        import graft.streaming.StreamingDedup
        val docs = Tables.documents(spark, d)
        docs.count() // warm scan
        val root = java.nio.file.Files.createTempDirectory("q86prof").toString
        val ix = s"$root/ix"; val out = s"$root/out"
        val blocks: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
          StreamingDedup.minHashBlocks("doc_id", "text",
            shingleN = 3, numHashes = 16, bands = 4, seed = 42L,
            portable = true)
        (0 until 4).foreach { k =>
          if (k == 3) {
            val takedown = t("readCorpus for takedown")(
              StreamingDedup.readCorpus(spark, out).get
                .filter(pmod(col("doc_id"), lit(10)) === 1)
                .select(col("doc_id")))
            t("retract ix")(StreamingDedup.retract(spark, ix, takedown, "doc_id"))
            t("retract out")(StreamingDedup.retract(spark, out, takedown, "doc_id"))
            t("compactIndex")(StreamingDedup.compactIndex(spark, ix))
          }
          val batch = docs.filter(pmod(col("doc_id"), lit(4)) === k)
          val ixDf = t(s"readIndex b$k")(StreamingDedup.readIndex(spark, ix, k))
          val (novel, novelBlocks) = StreamingDedup.processBatch(batch,
            ixDf, "doc_id", blocks)
          t(s"write novel b$k")(novel.write.mode("overwrite")
            .parquet(s"$out/ingest_batch=$k"))
          t(s"write blocks b$k")(novelBlocks.write.mode("overwrite")
            .parquet(s"$ix/ingest_batch=$k"))
          graft.operators.Lifecycle.release(novelBlocks)
        }
        t("compactOutput")(StreamingDedup.compactOutput(spark, out))
        t("final readCorpus+count")(println(
          StreamingDedup.readCorpus(spark, out).get.count()))

      case "cpuq" =>
        // CPU-demand profile of named queries: wall time AND process CPU
        // time per run — cpu/wall ≈ effective parallelism. A query whose
        // ratio saturates the core count is the one a CPU-quota-throttled
        // environment inflates most (the r11 driver-bench q20 forensics).
        val osBean = java.lang.management.ManagementFactory
          .getOperatingSystemMXBean
          .asInstanceOf[com.sun.management.OperatingSystemMXBean]
        val names = args.drop(1)
        names.foreach { n => // warmup
          SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
            .write.format("noop").mode("overwrite").save()
        }
        names.foreach { n =>
          (1 to 2).foreach { rep =>
            val c0 = osBean.getProcessCpuTime
            val t0 = System.nanoTime()
            SparkEntry.queries(n)(spark, d)
              .write.format("noop").mode("overwrite").save()
            val wall = (System.nanoTime() - t0) / 1e9
            val cpu = (osBean.getProcessCpuTime - c0) / 1e9
            println(f"CPUQ $n rep$rep wall=$wall%.2f s cpu=$cpu%.2f s " +
              f"parallel=${cpu / wall}%.1fx")
          }
        }

      case "jobs" =>
        // Per-JOB breakdown of a named query (UI is disabled, so this is
        // the local stand-in for the Jobs page): one warmup at sf0.001,
        // then one run at $SPARK_GRAFT_SF_DIR with a listener recording
        // each job's wall time, task count, summed task time and call
        // site — where a lifecycle query's many small actions actually
        // spend their seconds.
        val name = args(1)
        val fn = SparkEntry.queries(name)
        fn(spark, "/root/testdata/sf0.001")
          .write.format("noop").mode("overwrite").save()
        case class J(id: Int, site: String, wall: Double, tasks: Int,
          taskSec: Double)
        val jobs = scala.collection.mutable.ArrayBuffer.empty[J]
        val starts = scala.collection.mutable.Map[Int, (String, Long)]()
        val stageToJob = scala.collection.mutable.Map[Int, Int]()
        val taskAgg = scala.collection.mutable.Map[Int, (Int, Double)]()
        val listener = new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(
              e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
            synchronized {
              val site = Option(e.properties)
                .flatMap(p => Option(p.getProperty("callSite.short")))
                .getOrElse("?")
              starts(e.jobId) = (site, System.nanoTime())
              e.stageIds.foreach(sid => stageToJob(sid) = e.jobId)
            }
          override def onTaskEnd(
              e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
            synchronized {
              stageToJob.get(e.stageId).foreach { jid =>
                val (n, s) = taskAgg.getOrElse(jid, (0, 0.0))
                taskAgg(jid) = (n + 1, s + e.taskInfo.duration / 1e3)
              }
            }
          override def onJobEnd(
              e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
            synchronized {
              starts.remove(e.jobId).foreach { case (site, t0) =>
                val (n, s) = taskAgg.getOrElse(e.jobId, (0, 0.0))
                jobs += J(e.jobId, site, (System.nanoTime() - t0) / 1e9, n, s)
              }
            }
        }
        spark.sparkContext.addSparkListener(listener)
        val t0 = System.nanoTime()
        fn(spark, d).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(1500) // listener bus drain
        spark.sparkContext.removeSparkListener(listener)
        val byJob = jobs.sortBy(_.id)
        byJob.foreach { j =>
          println(f"JOB ${j.id}%3d wall=${j.wall}%6.2fs tasks=${j.tasks}%4d " +
            f"taskSec=${j.taskSec}%7.2f  ${j.site}")
        }
        println(f"TOTAL $name wall=$wall%.2f s jobs=${byJob.size} " +
          f"jobWallSum=${byJob.map(_.wall).sum}%.2f " +
          f"taskSecSum=${byJob.map(_.taskSec).sum}%.2f")

      case "query" =>
        // Generic single-query profiler: warmup at sf0.001, then two
        // timed noop-sink runs at $SPARK_GRAFT_SF_DIR.
        val name = args(1)
        val fn = SparkEntry.queries(name)
        def run(dir: String): Unit =
          fn(spark, dir).write.format("noop").mode("overwrite").save()
        t(s"$name warmup sf0.001")(run("/root/testdata/sf0.001"))
        t(s"$name @$d run1")(run(d))
        t(s"$name @$d run2")(run(d))

      case "usnvc1m" =>
        // USNVC fidelity at 100×: a synthetic export with N units
        // (depth-16 chains, descriptions with entity chains, a link
        // table per unit) written as SHARDED TSVs — the layout a real
        // large export lands in — then the full pipeline end-to-end.
        // Pins: wall-time, docs==units+1, zero validation errors,
        // broadcast dims staying broadcast, level-partitioned sink.
        import graft.usnvc.UsnvcPipeline
        val n = args.lift(1).map(_.toLong).getOrElse(1000000L)
        val root = java.nio.file.Files.createTempDirectory("usnvc_scale").toString
        val levels = Seq("Class", "Subclass", "Formation", "Division",
          "Macrogroup", "Group", "Alliance", "Association",
          "Cultural Class", "Cultural Subclass", "Cultural Formation",
          "Cultural Subformation", "Cultural Group", "Cultural Subgroup",
          "Cultural Type", "Cultural Subtype")
        def writeTsv(df: org.apache.spark.sql.DataFrame, name: String): Unit =
          df.write.option("sep", "\t").option("header", "true")
            .option("encoding", "ISO-8859-1").option("escape", "\"")
            .mode("overwrite").csv(s"$root/$name")
        def writeSmall(name: String, rows: Seq[Seq[String]]): Unit =
          java.nio.file.Files.write(
            java.nio.file.Paths.get(root, name),
            rows.map(_.mkString("\t")).mkString("", "\n", "\n")
              .getBytes(java.nio.charset.Charset.forName("ISO-8859-1")))
        t(s"generate $n-unit export") {
          val base = spark.range(0, n).select(col("id").as("i"),
            (col("id") + 2000000L).as("egid")).repartition(32)
          val li = pmod(col("i"), lit(16))
          writeTsv(base.select(
            col("egid").cast("string").as("element_global_id"),
            when(li === 0, lit(null).cast("string"))
              .otherwise((col("egid") - 1).cast("string")).as("parent_id"),
            (pmod(col("i"), lit(2)) + 1).cast("int").as("classif_confidence_id"),
            concat(lit("DB"), col("egid")).as("databasecode"),
            concat(lit("CC"), col("i")).as("classificationcode"),
            concat(lit("Species "), col("egid")).as("scientificname"),
            concat(lit("<i>Species "), col("egid"), lit("</i>"))
              .as("formattedscientificname"),
            when(pmod(col("i"), lit(7)) === 0, lit(null).cast("string"))
              .otherwise(concat(lit("Translated &amp; "), col("egid")))
              .as("translatedname"),
            when(pmod(col("i"), lit(10)) === 0, lit(null).cast("string"))
              .otherwise(concat(lit("Colloquial "), col("egid")))
              .as("colloquialname"),
            element_at(array(levels.map(lit): _*), (li + 1).cast("int"))
              .as("hierarchylevel"),
            (li + 1).cast("string").as("d_classification_level_id"),
            col("i").cast("string").as("unitsort"),
            lit("").as("parentkey"), lit("").as("parentname")), "unit.txt")
          val blankDesc = Seq("rationale", "classificationcomments",
            "othercomments", "similarnvctypescomments", "physiognomy",
            "floristics", "dynamics", "environment", "spatialpattern",
            "subnations", "omernikecoregions", "plotsummary", "plottypal",
            "plotarchived", "plotconsistency", "plotsize", "plotmethods",
            "confidencecomments", "grankreviewdate", "grankauthor",
            "grankreasons", "lineage", "synonymy", "primaryconceptsource",
            "descriptionauthor", "acknowledgements")
          writeTsv(base.select(Seq(
            col("egid").cast("string").as("element_global_id"),
            concat(lit("Concept &amp;lt;sentence&amp;gt; "), col("egid"))
              .as("typeconceptsentence"),
            concat(lit("Concept &amp; "), col("egid")).as("typeconcept"),
            lit("Has &lt;canopy&gt;").as("diagnosticcharacteristics"),
            lit("US, CA?").as("nations"),
            lit("42").as("tncecoregions"),
            lit("7").as("federallands"),
            lit("12").as("plotcount"),
            lit("G5").as("grank"),
            lit("2018-03-01").as("versiondate"),
            concat(lit("Range "), col("egid")).as("range")) ++
            blankDesc.map(c => lit("").as(c)): _*), "unitDescription.txt")
          writeTsv(base.select(
            col("egid").cast("string").as("element_global_id"),
            lit("r1").as("reference_id")), "UnitXReference.txt")
          writeTsv(base.filter(li === 7).select(
            col("egid").cast("string").as("element_global_id"),
            lit("10").as("subnation_id"),
            lit("1").as("d_curr_presence_absence_id"),
            lit("1").as("d_dist_confidence_id")), "UnitXSubnation.txt")
          writeSmall("d_classif_confidence.txt", Seq(
            Seq("D_CLASSIF_CONFIDENCE_ID", "CLASSIF_CONFIDENCE_DESC",
              "DISPLAY_ORDER", "STATUS"),
            Seq("1", "High", "1", "Y"), Seq("2", "Moderate", "2", "Y")))
          writeSmall("d_curr_presence_absence.txt", Seq(
            Seq("D_CURR_PRESENCE_ABSENCE_ID", "CURR_PRESENCE_ABSENCE_DESC",
              "CURR_PRESENCE_ABSENCE_CD"),
            Seq("1", "Present", "P")))
          writeSmall("d_dist_confidence.txt", Seq(
            Seq("D_DIST_CONFIDENCE_ID", "DIST_CONFIDENCE_CD",
              "DIST_CONFIDENCE_DESC"),
            Seq("1", "C", "Confident")))
          writeSmall("d_subnation.txt", Seq(
            Seq("subnation_id", "iso_nation_cd", "subnation_code",
              "subnation_name"),
            Seq("10", "US", "MA", "Massachusetts")))
          writeSmall("reference.txt", Seq(
            Seq("reference_id", "shortcitation", "fullcitation"),
            Seq("r1", "Smith 1990", "Smith, J. 1990. Forests.")))
          // ecoregion links: every 3rd unit in 1994, every 5th in 2007
          writeTsv(base.filter(pmod(col("i"), lit(3)) === 0).select(
            col("egid").cast("string").as("element_global_id"),
            lit("500").as("usfs_ecoregion_id"),
            lit("1").as("d_occurrence_status_id")), "UnitXEcoregionUsfs1994.txt")
          writeTsv(base.filter(pmod(col("i"), lit(5)) === 0).select(
            col("egid").cast("string").as("element_global_id"),
            lit("700").as("usfs_ecoregion_2007_id"),
            lit("1").as("d_occurrence_status_id")), "UnitXEcoregionUsfs2007.txt")
          // similar-unit links point at the chain neighbor
          writeTsv(base.filter(li === 7).select(
            col("egid").cast("string").as("element_global_id"),
            (col("egid") - 1).cast("string").as("simglobal_id"),
            lit("Similar &amp; related").as("simnote"),
            concat(lit("G"), col("i")).as("simelcode"),
            concat(lit("Similar "), col("egid")).as("simname"),
            lit("Standard").as("simusstatus"),
            lit("6").as("simlevelid")), "UnitXSimilarUnit.txt")
          writeTsv(base.filter(pmod(col("i"), lit(11)) === 0).select(
            col("egid").cast("string").as("element_global_id"),
            (col("egid") + n).cast("string").as("predecessor_id"),
            concat(lit("OLD"), col("i")).as("predecessorcode"),
            concat(lit("Old Assoc "), col("i")).as("predecessorname"),
            concat(lit("Acer old "), col("i")).as("predecessorsciname"),
            lit("Old Swamp").as("predecessorcolloquialname"),
            lit("2000-01-01").as("lineagedate"),
            lit("split").as("lineagenote"),
            lit("Panel").as("lineageauthorizedby")), "unitPredecessor.txt")
          writeTsv(base.filter(pmod(col("i"), lit(13)) === 0).select(
            col("egid").cast("string").as("element_global_id"),
            concat(lit("Old Name "), col("i")).as("obsoletename"),
            lit("renamed").as("obsoletenote"),
            lit("2001-01-01").as("obsoletedate"),
            lit("Panel").as("obsoleteauthority")), "unitObsoleteName.txt")
          writeTsv(base.filter(pmod(col("i"), lit(17)) === 0).select(
            col("egid").cast("string").as("element_global_id"),
            concat(lit("X"), col("i")).as("obsoleteparentcode"),
            lit("Old Div").as("obsoletedivision"),
            lit("Old Parent").as("obsoleteparentname"),
            lit("moved").as("obsoletenote"),
            lit("2002-02-02").as("obsoletedate"),
            lit("Panel").as("obsoleteauthority")), "unitObsoleteParent.txt")
          writeSmall("d_occurrence_status.txt", Seq(
            Seq("D_OCCURRENCE_STATUS_ID", "OCCURRENCE_STATUS_CD",
              "OCCURRENCE_STATUS_DESC"),
            Seq("1", "C", "Confirmed")))
          writeSmall("d_usfs_ecoregion1994.txt", Seq(
            Seq("USFS_ECOREGION_ID", "PARENT_USFS_ECOREGION_ID",
              "D_USFS_ECOREGION_LEVEL_ID", "USFS_ECOREGION_NAME",
              "USFS_ECOREGION_CLASS_CD", "USFS_ECOREGION_CONCAT_CD"),
            Seq("500", "", "1", "Adirondack", "M212", "M212")))
          writeSmall("d_usfs_ecoregion2007.txt", Seq(
            Seq("usfs_ecoregion_2007_id", "parent_usfs_ecoregion_2007_id",
              "d_usfs_ecoregion_level_id", "usfs_ecoregion_2007_name",
              "usfs_ecoregion_2007_concat_cd"),
            Seq("700", "", "1", "Northeastern Mixed", "211")))
        }
        val outDir = s"$root/__out"
        t(s"UsnvcPipeline.run $n units end-to-end") {
          UsnvcPipeline.run(spark, root, outDir)
        }
        val docs = spark.read.text(s"$outDir/docs").count()
        val errs = try spark.read.json(s"$outDir/errors").count()
          catch { case _: Throwable => 0L }
        println(s"  docs written: $docs (expect ${n + 1}), errors: $errs")
        val plan = UsnvcPipeline.docsJson(spark, root)
          .queryExecution.executedPlan.toString()
        println(s"  broadcast dim joins: ${"BroadcastHashJoin".r.findAllIn(plan).size}")
        val levelsOnDisk = new java.io.File(s"$outDir/docs").listFiles()
          .count(_.getName.startsWith("level="))
        println(s"  level partitions in sink: $levelsOnDisk")

      case "closure" =>
        // USNVC-shaped scale smoke: 100k units in 6 250 chains of depth
        // 16 (the reference taxonomy's max depth). Pins closure
        // wall-time and proves plan size stays linear in depth.
        import spark.implicits._
        val n = 100000L
        val chains = 6250L // n / 16 -> depth-16 chains
        val nodes = spark.range(1, n + 1).select(
          col("id"),
          when(col("id") <= chains, lit(null).cast("long"))
            .otherwise(col("id") - chains).as("parent"))
          .repartition(32)
        nodes.persist().count()
        val closure = t("iterative closure 100k nodes depth 16") {
          val c = Hierarchy.ancestorClosure(nodes, "id", "parent",
            maxDepth = 32, broadcastEdges = true)
          c.count()
        }
        println(s"  closure rows: $closure (expect ${chains * 16 * 15 / 2})")
        val paths = t("ancestorPaths fold") {
          Hierarchy.ancestorPaths(nodes, "id", "parent", 32).count()
        }
        println(s"  nodes with ancestors: $paths (expect ${n - chains})")
        t("recursive-CTE closure 100k nodes") {
          Hierarchy.ancestorClosureSql(nodes, "id", "parent", 32).count()
        }
    }
    spark.stop()
  }
}
