package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Incremental-dedup invariants: the streaming ingester and the batch
  * fold share one per-batch step, so their admitted sets must be
  * IDENTICAL when the micro-batches line up with the fold's batch
  * assignment; recovery replays must be idempotent (partition
  * overwrite, index filtered to committed batches); and nothing may
  * stay pinned (the operators are Lifecycle-eager). */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  /** 4 batches keyed doc_id % 4. Within-corpus duplicates: text is
    * identical for ids in the same dup group, so they collide on ALL
    * bands; distinct texts share no shingles. Groups span batches to
    * exercise the index path, and batch 2 holds a within-batch pair. */
  private def mkDocs: Seq[(Long, String)] = {
    def t(tag: Long) = (0 until 12).map(i => s"w${tag}x$i").mkString(" ")
    Seq(
      0L -> t(100), 4L -> t(100), 9L -> t(100), // group A: batches 0,0-dup,1-dup... (0,4)->b0, 9->b1
      1L -> t(200), 7L -> t(200),               // group B: b1 keeps 1? 1->b1, 7->b3 dup
      2L -> t(300), 6L -> t(300),               // group C: within-batch pair in b2 (2,6)
      3L -> t(400), 5L -> t(401), 8L -> t(402), // singletons
      10L -> t(403), 11L -> t(404))
  }

  /** One file per fold batch; distinct mtimes pin the file-source pickup
    * order so micro-batch k == fold batch k. */
  private def writeBatchFiles(dir: String, ks: Range = 0 until 4): Unit =
    ks.foreach { k =>
      val rows = mkDocs.filter(_._1 % 4 == k)
        .map { case (id, tx) => s"""{"doc_id":$id,"text":"$tx"}""" }
      val p = java.nio.file.Paths.get(dir, f"batch$k%02d.json")
      java.nio.file.Files.write(p, rows.mkString("\n").getBytes("UTF-8"))
      p.toFile.setLastModified(1600000000000L + k * 60000L)
    }

  private def foldResult: Set[(Long, Int)] = {
    val docs = mkDocs.toDF("doc_id", "text")
    StreamingDedup.incrementalDedup(docs, "doc_id", "text",
      pmod(col("doc_id"), lit(4)).cast("int"), nBatches = 4)
      .as[(Long, Int)].collect().toSet
  }

  test("batch fold admits first-seen docs only (hand-checked corpus)") {
    val got = foldResult
    // group A: 0 admitted (b0), 4 dup-within-b0, 9 dup-vs-index (b1)
    // group B: 1 admitted (b1), 7 dup-vs-index (b3)
    // group C: 2 admitted (b2), 6 dup-within-b2
    // singletons all admitted
    val expect = Set(0L -> 0, 1L -> 1, 2L -> 2, 3L -> 3, 5L -> 1,
      8L -> 0, 10L -> 2, 11L -> 3)
    assert(got == expect)
  }

  test("streaming ingester equals the batch fold, one file per micro-batch") {
    val in = java.nio.file.Files.createTempDirectory("sdedup_in").toString
    val out = java.nio.file.Files.createTempDirectory("sdedup_out").toString
    val ix = java.nio.file.Files.createTempDirectory("sdedup_ix").toString
    val cp = java.nio.file.Files.createTempDirectory("sdedup_cp").toString
    writeBatchFiles(in)
    // compute the fold expectation FIRST: the fold legitimately leaves
    // scratch tables (its per-batch outputs stay lazy); the snapshot
    // below isolates the INGESTER's scratch behavior
    val expected = foldResult
    val scratch = new java.io.File(
      graft.operators.Lifecycle.scratchRoot(spark))
    def scratchDirs: Set[String] =
      Option(scratch.list()).map(_.toSet).getOrElse(Set.empty)
    val scratchBefore = scratchDirs
    val stream = spark.readStream.schema(docSchema)
      .option("maxFilesPerTrigger", 1).json(in)
    StreamingDedup.start(stream, "doc_id", "text", ix, out, cp)
      .awaitTermination()
    val got = spark.read.parquet(out)
      .select(col("doc_id"), col("ingest_batch").cast("int"))
      .as[(Long, Int)].collect().toSet
    assert(got == expected)
    // the index holds exactly the admitted docs' bands, no duplicates
    val ixIds = spark.read.parquet(ix).select("doc_id").distinct()
      .as[Long].collect().toSet
    assert(ixIds == expected.map(_._1))
    // steady-state storage: each micro-batch released its blocking
    // scratch table after committing its outputs — zero net growth
    assert(scratchDirs == scratchBefore,
      s"ingester leaked scratch tables: ${scratchDirs -- scratchBefore}")
  }

  test("readIndex goes through the Hadoop FileSystem (scheme-qualified index path)") {
    // regression: java.io.File listing of an `hdfs://`/`s3a://` (here:
    // explicit `file:`) index path returned null, so every batch saw an
    // empty index and silently admitted cross-batch duplicates
    val in = java.nio.file.Files.createTempDirectory("sdhfs_in").toString
    val out = java.nio.file.Files.createTempDirectory("sdhfs_out").toString
    val ix = "file:" + java.nio.file.Files.createTempDirectory("sdhfs_ix")
    val cp = java.nio.file.Files.createTempDirectory("sdhfs_cp").toString
    writeBatchFiles(in)
    val stream = spark.readStream.schema(docSchema)
      .option("maxFilesPerTrigger", 1).json(in)
    StreamingDedup.start(stream, "doc_id", "text", ix, out, cp)
      .awaitTermination()
    val got = spark.read.parquet(out)
      .select(col("doc_id"), col("ingest_batch").cast("int"))
      .as[(Long, Int)].collect().toSet
    assert(got == foldResult)
  }

  test("stray non-numeric dirs in the index are ignored, not fatal") {
    // manual backups / tool litter like `gen=2.bak` or
    // `ingest_batch=3-copy` used to throw NumberFormatException in the
    // suffix parse and wedge every readIndex/compactIndex (and so the
    // whole ingester) until someone hand-deleted the dir
    val in = java.nio.file.Files.createTempDirectory("sds_in").toString
    val out = java.nio.file.Files.createTempDirectory("sds_out").toString
    val ix = java.nio.file.Files.createTempDirectory("sds_ix")
    val cp = java.nio.file.Files.createTempDirectory("sds_cp").toString
    java.nio.file.Files.createDirectories(ix.resolve("gen=2.bak"))
    java.nio.file.Files.createDirectories(ix.resolve("ingest_batch=3-copy"))
    java.nio.file.Files.createDirectories(ix.resolve("ingest_batch="))
    writeBatchFiles(in)
    val stream = spark.readStream.schema(docSchema)
      .option("maxFilesPerTrigger", 1).json(in)
    StreamingDedup.start(stream, "doc_id", "text", ix.toString, out, cp)
      .awaitTermination()
    val got = spark.read.parquet(out)
      .select(col("doc_id"), col("ingest_batch").cast("int"))
      .as[(Long, Int)].collect().toSet
    assert(got == foldResult)
    StreamingDedup.compactIndex(spark, ix.toString) // must not throw
    assert(ix.resolve("gen=2.bak").toFile.exists(),
      "stray dir must be left alone, not reclaimed")
  }

  test("index compaction preserves semantics and bounds the directory") {
    val in = java.nio.file.Files.createTempDirectory("sdc_in").toString
    val out = java.nio.file.Files.createTempDirectory("sdc_out").toString
    val ix = java.nio.file.Files.createTempDirectory("sdc_ix").toString
    val cp = java.nio.file.Files.createTempDirectory("sdc_cp").toString
    // phase 1: batches 0 and 1 ingest, then the index is compacted
    writeBatchFiles(in, 0 until 2)
    def run(): Unit = {
      val stream = spark.readStream.schema(docSchema)
        .option("maxFilesPerTrigger", 1).json(in)
      StreamingDedup.start(stream, "doc_id", "text", ix, out, cp)
        .awaitTermination()
    }
    run()
    val before = StreamingDedup.readIndex(spark, ix, 2).get
      .as[(Long, String)].collect().toSet
    StreamingDedup.compactIndex(spark, ix)
    // mark-then-sweep: the covered batch 0 survives the fold pass (one
    // janitor cycle of reader grace), then the vacuum tick reclaims it
    assert(new java.io.File(ix).list().toSet.contains("ingest_batch=0"))
    StreamingDedup.vacuumIndex(spark, ix)
    val dirs = new java.io.File(ix).list().toSet
      .filterNot(_.startsWith("_")) // ignore commit markers if any
    assert(dirs == Set("gen=1", "ingest_batch=1", "retention"),
      dirs.toString)
    // same keys visible after compaction, for the next batch AND for a
    // replay of the newest (potentially uncommitted) batch
    assert(StreamingDedup.readIndex(spark, ix, 2).get
      .as[(Long, String)].collect().toSet == before)
    StreamingDedup.compactIndex(spark, ix) // idempotent no-op
    assert(StreamingDedup.readIndex(spark, ix, 2).get
      .as[(Long, String)].collect().toSet == before)
    // phase 2: remaining batches land on the compacted index; the
    // admitted corpus must still equal the uncompacted fold
    writeBatchFiles(in, 2 until 4)
    run()
    val got = spark.read.parquet(out)
      .select(col("doc_id"), col("ingest_batch").cast("int"))
      .as[(Long, Int)].collect().toSet
    assert(got == foldResult)
  }

  test("output compaction is lossless (ingest_batch materialized into generations)") {
    val in = java.nio.file.Files.createTempDirectory("sdoc_in").toString
    val out = java.nio.file.Files.createTempDirectory("sdoc_out").toString
    val ix = java.nio.file.Files.createTempDirectory("sdoc_ix").toString
    val cp = java.nio.file.Files.createTempDirectory("sdoc_cp").toString
    writeBatchFiles(in)
    val stream = spark.readStream.schema(docSchema)
      .option("maxFilesPerTrigger", 1).json(in)
    StreamingDedup.start(stream, "doc_id", "text", ix, out, cp)
      .awaitTermination()
    def corpus: Set[(Long, String, Long)] =
      StreamingDedup.readCorpus(spark, out).get
        .select(col("doc_id"), col("text"), col("ingest_batch"))
        .as[(Long, String, Long)].collect().toSet
    val before = corpus
    assert(before.map(t => (t._1, t._3.toInt)) == foldResult)
    StreamingDedup.compactOutput(spark, out)
    assert(corpus == before) // rows + batch labels + text all intact
    val dirs = new java.io.File(out).list().toSet.filterNot(_.startsWith("_"))
    assert(dirs == Set("gen=3", "ingest_batch=3"), dirs.toString)
    StreamingDedup.compactOutput(spark, out) // idempotent no-op
    assert(corpus == before)
  }

  test("in-ingester auto-compaction keeps the fold result and leaves a generation") {
    val in = java.nio.file.Files.createTempDirectory("sdac_in").toString
    val out = java.nio.file.Files.createTempDirectory("sdac_out").toString
    val ix = java.nio.file.Files.createTempDirectory("sdac_ix").toString
    val cp = java.nio.file.Files.createTempDirectory("sdac_cp").toString
    writeBatchFiles(in)
    val stream = spark.readStream.schema(docSchema)
      .option("maxFilesPerTrigger", 1).json(in)
    StreamingDedup.start(stream, "doc_id",
      StreamingDedup.minHashBlocks("doc_id", "text"), ix, out, cp,
      compactEvery = Some(2)).awaitTermination()
    val got = spark.read.parquet(out)
      .select(col("doc_id"), col("ingest_batch").cast("int"))
      .as[(Long, Int)].collect().toSet
    assert(got == foldResult)
    val dirs = new java.io.File(ix).list().toSet.filterNot(_.startsWith("_"))
    assert(dirs.exists(_.startsWith("gen=")), dirs.toString)
    // compacted + uncompacted together still serve the next batch
    val ixIds = StreamingDedup.readIndex(spark, ix, 4).get
      .select("doc_id").distinct().as[Long].collect().toSet
    assert(ixIds == foldResult.map(_._1))
  }

  test("restart continues batch ids and replays idempotently") {
    val in = java.nio.file.Files.createTempDirectory("sdedup2_in").toString
    val out = java.nio.file.Files.createTempDirectory("sdedup2_out").toString
    val ix = java.nio.file.Files.createTempDirectory("sdedup2_ix").toString
    val cp = java.nio.file.Files.createTempDirectory("sdedup2_cp").toString
    // phase 1: only batches 0 and 1 exist
    writeBatchFiles(in, 0 until 2)
    def run(): Unit = {
      val stream = spark.readStream.schema(docSchema)
        .option("maxFilesPerTrigger", 1).json(in)
      StreamingDedup.start(stream, "doc_id", "text", ix, out, cp)
        .awaitTermination()
    }
    run()
    val phase1 = spark.read.parquet(out).select("doc_id")
      .as[Long].collect().toSet
    assert(phase1 == Set(0L, 1L, 5L, 8L))
    // phase 2: the remaining files land; restart from the checkpoint
    writeBatchFiles(in, 2 until 4)
    run()
    val got = spark.read.parquet(out)
      .select(col("doc_id"), col("ingest_batch").cast("int"))
      .as[(Long, Int)].collect().toSet
    assert(got == foldResult)
    // a third run with nothing new must change nothing (idempotent)
    run()
    val again = spark.read.parquet(out)
      .select(col("doc_id"), col("ingest_batch").cast("int"))
      .as[(Long, Int)].collect().toSet
    assert(again == got)
  }

  test("retraction: tombstoned docs stop blocking, leave storage at compaction") {
    val ix = java.nio.file.Files.createTempDirectory("retr_ix").toString
    def t(tag: Long) = (0 until 12).map(i => s"r${tag}x$i").mkString(" ")
    val blocks: DataFrame => DataFrame =
      StreamingDedup.minHashBlocks("doc_id", "text")
    // batch 0: docs 1, 2 admitted (distinct texts)
    val b0 = Seq(1L -> t(1), 2L -> t(2)).toDF("doc_id", "text")
    val (_, nb0) = StreamingDedup.processBatch(b0,
      StreamingDedup.readIndex(spark, ix, 0), "doc_id", blocks)
    nb0.write.mode("overwrite").parquet(s"$ix/ingest_batch=0")
    // doc 3 duplicates doc 1 -> blocked while 1 is in the index
    val dup = Seq(3L -> t(1)).toDF("doc_id", "text")
    def admitOf(batchId: Long): Set[Long] = {
      val (novel, _) = StreamingDedup.processBatch(dup,
        StreamingDedup.readIndex(spark, ix, batchId), "doc_id", blocks)
      novel.select("doc_id").as[Long].collect().toSet
    }
    assert(admitOf(1) == Set.empty[Long])
    // takedown of doc 1: its near-dups must now be admitted
    StreamingDedup.retract(spark, ix,
      Seq(1L).toDF("doc_id"), "doc_id")
    assert(admitOf(1) == Set(3L),
      "near-dup of a retracted doc must be admitted")
    // the raw partition still holds doc 1 (filter is read-side)…
    val raw = spark.read.parquet(s"$ix/ingest_batch=0")
      .select("doc_id").as[Long].collect().toSet
    assert(raw.contains(1L))
    // …until compaction physically drops it
    StreamingDedup.compactIndex(spark, ix, upTo = 1L)
    val gen = spark.read.parquet(s"$ix/gen=1")
      .select("doc_id").as[Long].collect().toSet
    assert(!gen.contains(1L), "compaction must fold without tombstoned rows")
    assert(gen.contains(2L), "retained rows must survive compaction")
    // idempotent: retracting again (or an id never admitted) is safe
    StreamingDedup.retract(spark, ix, Seq(1L, 99L).toDF("doc_id"), "doc_id")
    assert(admitOf(1) == Set(3L))
    // a torn tombstone (no commit marker) is invisible to readers
    val torn = new java.io.File(s"$ix/tombstone=9")
    torn.mkdirs()
    assert(admitOf(1) == Set(3L)) // listing tolerates it; no wedge
  }

  test("soak: auto-compaction keeps the index dir bounded across kill/restart cycles") {
    // miniature of the ProfileScratch `soak` run (NOTES.md carries the
    // 500-batch numbers): 24 micro-batches land in 4 waves with a
    // restart (= kill + recovery replay) between waves, auto-compaction
    // every 5 batches. Invariants: (1) the index directory count stays
    // O(generations + batches-since-compaction) at EVERY observation
    // point, never O(total batches); (2) novelty decisions after all
    // the kills are byte-identical to the single-shot batch fold.
    val nBatches = 24
    val in = java.nio.file.Files.createTempDirectory("soak_in").toString
    val out = java.nio.file.Files.createTempDirectory("soak_out").toString
    val ix = java.nio.file.Files.createTempDirectory("soak_ix").toString
    val cp = java.nio.file.Files.createTempDirectory("soak_cp").toString
    def t(tag: Long) = (0 until 12).map(i => s"s${tag}x$i").mkString(" ")
    // doc i of batch b: dup of batch (b-2)'s doc when i%3==0 and b>=2
    // (cross-batch, far enough back that the pair is index-vs-batch
    // after any compaction), else unique
    def docsOf(b: Int): Seq[(Long, String)] = (0 until 6).map { i =>
      val id = b.toLong * 6 + i
      val src = if (b >= 2 && i % 3 == 0) (b - 2).toLong * 6 + i else id
      (id, t(src))
    }
    def landBatch(b: Int): Unit = {
      val rows = docsOf(b)
        .map { case (id, tx) => s"""{"doc_id":$id,"text":"$tx"}""" }
      val p = java.nio.file.Paths.get(in, f"batch$b%04d.json")
      java.nio.file.Files.write(p, rows.mkString("\n").getBytes("UTF-8"))
      p.toFile.setLastModified(1600000000000L + b * 60000L)
    }
    def run(): Unit = {
      val stream = spark.readStream.schema(docSchema)
        .option("maxFilesPerTrigger", 1).json(in)
      StreamingDedup.start(stream, "doc_id",
        StreamingDedup.minHashBlocks("doc_id", "text"), ix, out, cp,
        compactEvery = Some(5)).awaitTermination()
    }
    var maxDirs = 0
    (0 until 4).foreach { wave =>
      (wave * 6 until (wave + 1) * 6).foreach(landBatch)
      run() // wave boundary = kill + checkpoint-recovery restart
      val dirs = new java.io.File(ix).list().count(!_.startsWith("_"))
      maxDirs = math.max(maxDirs, dirs)
    }
    // bound: ≤ generations (total/compactEvery) + ONE retention grace
    // cycle of marked-but-unswept dirs (≤ compactEvery batches + 1
    // superseded gen) + un-compacted recent batches + the in-flight one
    // + the retention record dir. Still O(gens + 2 cycles) at every
    // observation, never O(total batches) — 24 un-compacted would be 24.
    assert(maxDirs <= nBatches / 5 + (5 + 1) + 5 + 1 + 1,
      s"index dir count $maxDirs grew past the compaction bound")
    val got = spark.read.parquet(out)
      .select(col("doc_id"), col("ingest_batch").cast("int"))
      .as[(Long, Int)].collect().toSet
    val allDocs = (0 until nBatches).flatMap(docsOf).toDF("doc_id", "text")
    val fold = StreamingDedup.incrementalDedup(allDocs, "doc_id", "text",
      (col("doc_id") / 6).cast("int"), nBatches = nBatches)
      .as[(Long, Int)].collect().toSet
    assert(got == fold,
      "kill/restart + auto-compaction changed novelty decisions vs the fold")
  }

  test("fold leaves zero persistent RDDs") {
    foldResult
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      spark.sparkContext.getPersistentRDDs.values.map(_.name).toList.toString)
  }

  /** (id, text, payload): 20/21 share payload bytes with different
    * prose (image-side dup); 22/23 share prose with different payloads
    * (text-side dup); 24 is unique in both modalities. */
  private def mkFusedDocs = {
    def t(tag: Long) = (0 until 12).map(i => s"w${tag}x$i").mkString(" ")
    Seq(
      (20L, t(500), "IMG_A"), (21L, t(501), "IMG_A"),
      (22L, t(502), "IMG_B"), (23L, t(502), "IMG_C"),
      (24L, t(503), "IMG_D"))
  }

  private def fusedBlockFn: DataFrame => DataFrame = df =>
    StreamingDedup.fusedBlocks("doc_id", "text", "payload_bin",
      dim = 16)(df.withColumn("payload_bin",
        encode(col("payload"), "UTF-8")))

  test("fused blocking drops either-modality duplicates in the fold") {
    val docs = mkFusedDocs.toDF("doc_id", "text", "payload")
    val got = StreamingDedup.incrementalDedupBlocked(docs, "doc_id",
      pmod(col("doc_id"), lit(2)).cast("int"), nBatches = 2,
      fusedBlockFn)
      .as[(Long, Int)].collect().toSet
    // batch 0 = {20, 22, 24}, batch 1 = {21, 23}; 21 collides on the
    // image bucket vs admitted 20, 23 on text bands vs admitted 22
    assert(got == Set(20L -> 0, 22L -> 0, 24L -> 0))
  }

  test("fused streaming ingester equals the fused fold") {
    val in = java.nio.file.Files.createTempDirectory("sfused_in").toString
    val out = java.nio.file.Files.createTempDirectory("sfused_out").toString
    val ix = java.nio.file.Files.createTempDirectory("sfused_ix").toString
    val cp = java.nio.file.Files.createTempDirectory("sfused_cp").toString
    (0 until 2).foreach { k =>
      val rows = mkFusedDocs.filter(_._1 % 2 == k)
        .map { case (id, tx, pl) =>
          s"""{"doc_id":$id,"text":"$tx","payload":"$pl"}""" }
      val p = java.nio.file.Paths.get(in, f"batch$k%02d.json")
      java.nio.file.Files.write(p, rows.mkString("\n").getBytes("UTF-8"))
      p.toFile.setLastModified(1600000000000L + k * 60000L)
    }
    val schema = StructType(docSchema.fields :+
      StructField("payload", StringType))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(in)
    StreamingDedup.start(stream, "doc_id", fusedBlockFn, ix, out, cp)
      .awaitTermination()
    val got = spark.read.parquet(out)
      .select(col("doc_id"), col("ingest_batch").cast("int"))
      .as[(Long, Int)].collect().toSet
    assert(got == Set(20L -> 0, 22L -> 0, 24L -> 0))
  }

  test("fused dedup over the broker-shaped source equals the fold") {
    // the full ingestion composition: broker records -> decode ->
    // fused multimodal dedup -> admitted corpus + index
    val in = java.nio.file.Files.createTempDirectory("sbk_in").toString
    val out = java.nio.file.Files.createTempDirectory("sbk_out").toString
    val ix = java.nio.file.Files.createTempDirectory("sbk_ix").toString
    val cp = java.nio.file.Files.createTempDirectory("sbk_cp").toString
    (0 until 2).foreach { k =>
      val rows = mkFusedDocs.filter(_._1 % 2 == k)
        .map { case (id, tx, pl) =>
          s"""{"doc_id":$id,"text":"$tx","payload":"$pl"}""" }
      val p = java.nio.file.Paths.get(in, f"batch$k%02d.json")
      java.nio.file.Files.write(p, rows.mkString("\n").getBytes("UTF-8"))
      p.toFile.setLastModified(1600000000000L + k * 60000L)
    }
    val schema = StructType(docSchema.fields :+
      StructField("payload", StringType))
    val records = BrokerSource.readFakeBrokerStreamJson(spark, in,
      schema, keyField = "doc_id", offsetField = "doc_id",
      options = Map("maxFilesPerTrigger" -> "1"))
    assert(records.schema.map(f => (f.name, f.dataType)) ==
      BrokerSource.recordSchema.map(f => (f.name, f.dataType)))
    val docs = BrokerSource.decodeJson(records, schema)
    StreamingDedup.start(docs, "doc_id", fusedBlockFn, ix, out, cp)
      .awaitTermination()
    val got = spark.read.parquet(out)
      .select(col("doc_id"), col("ingest_batch").cast("int"))
      .as[(Long, Int)].collect().toSet
    assert(got == Set(20L -> 0, 22L -> 0, 24L -> 0))
  }

  test("a torn generation (no _SUCCESS) is invisible to readers and reclaimed by compaction") {
    // crash window: compactIndex dies mid gen write → a gen= dir with
    // task files but no _SUCCESS. Trusting it would shadow the live
    // batch partitions it claims to cover (silent duplicate admission
    // after restart); it must be ignored on read and cleaned up once a
    // real generation commits
    val in = java.nio.file.Files.createTempDirectory("storn_in").toString
    val out = java.nio.file.Files.createTempDirectory("storn_out").toString
    val ix = java.nio.file.Files.createTempDirectory("storn_ix").toString
    val cp = java.nio.file.Files.createTempDirectory("storn_cp").toString
    writeBatchFiles(in, 0 until 2)
    val stream = spark.readStream.schema(docSchema)
      .option("maxFilesPerTrigger", 1).json(in)
    StreamingDedup.start(stream, "doc_id", "text", ix, out, cp)
      .awaitTermination()
    val before = StreamingDedup.readIndex(spark, ix, 2).get
      .as[(Long, String)].collect().toSet
    // simulate the torn gen=1: parquet-ish litter, no _SUCCESS marker
    val torn = java.nio.file.Paths.get(ix, "gen=1")
    java.nio.file.Files.createDirectories(torn)
    java.nio.file.Files.write(torn.resolve("part-00000.parquet"),
      Array[Byte](0x50, 0x41, 0x52, 0x31))
    assert(StreamingDedup.readIndex(spark, ix, 2).get
      .as[(Long, String)].collect().toSet == before,
      "torn generation leaked into readIndex")
    // a real compaction overwrites the torn dir with a COMMITTED
    // generation (same gen number → mode("overwrite") replaces it)
    StreamingDedup.compactIndex(spark, ix)
    assert(torn.resolve("_SUCCESS").toFile.exists(),
      "compaction did not leave a committed generation")
    assert(!torn.resolve("part-00000.parquet").toFile.exists(),
      "torn litter survived the overwrite")
    assert(StreamingDedup.readIndex(spark, ix, 2).get
      .as[(Long, String)].collect().toSet == before)
  }

  test("simhash blocking: streaming ingester equals the fold") {
    val blockFn: DataFrame => DataFrame =
      StreamingDedup.simHashBlocks("doc_id", "text")
    val docs = mkDocs.toDF("doc_id", "text")
    val expected = StreamingDedup.incrementalDedupBlocked(docs, "doc_id",
      pmod(col("doc_id"), lit(4)).cast("int"), 4, blockFn)
      .as[(Long, Int)].collect().toSet
    // identical texts share the signature exactly → every dup group
    // must collapse to its first-seen member, like the minhash fold
    assert(expected.map(_._1).intersect(Set(4L, 9L, 7L, 6L)).isEmpty)
    val in = java.nio.file.Files.createTempDirectory("ssh_in").toString
    val out = java.nio.file.Files.createTempDirectory("ssh_out").toString
    val ix = java.nio.file.Files.createTempDirectory("ssh_ix").toString
    val cp = java.nio.file.Files.createTempDirectory("ssh_cp").toString
    writeBatchFiles(in)
    val stream = spark.readStream.schema(docSchema)
      .option("maxFilesPerTrigger", 1).json(in)
    StreamingDedup.start(stream, "doc_id", blockFn, ix, out, cp)
      .awaitTermination()
    val got = spark.read.parquet(out)
      .select(col("doc_id"), col("ingest_batch").cast("int"))
      .as[(Long, Int)].collect().toSet
    assert(got == expected)
  }

  test("on-disk ingest ≡ fold under arbitrary compaction schedules (property)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def samples[A](g: Gen[A], n: Int, seed0: Long): Seq[A] = {
      var seed = Seed(seed0)
      (0 until n).map { _ =>
        val v = g.apply(Gen.Parameters.default, seed).get
        seed = seed.next; v
      }
    }
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps",
      "zeta", "eta", "theta")
    val gTrial = for {
      n <- Gen.choose(16, 36)
      nB <- Gen.choose(3, 5)
      base <- Gen.listOfN(n, for {
        len <- Gen.choose(3, 9)
        ws <- Gen.listOfN(len, Gen.oneOf(vocab))
      } yield ws.mkString(" "))
      // ~1/3 of docs clone an earlier doc's text → genuine cross- and
      // within-batch duplicates under every batch assignment
      clones <- Gen.listOfN(n, Gen.option(Gen.choose(0, n - 1)))
      compactIx <- Gen.listOfN(nB, Gen.oneOf(true, false, false))
      compactOut <- Gen.listOfN(nB, Gen.oneOf(true, false, false))
    } yield {
      val texts = base.zip(clones).zipWithIndex.map {
        case ((t, Some(src)), i) if src < i && i % 3 == 0 => base(src)
        case ((t, _), _) => t
      }
      (texts.zipWithIndex.map { case (t, i) => (i.toLong, t) },
        nB, compactIx, compactOut)
    }
    val blockFn: DataFrame => DataFrame =
      StreamingDedup.minHashBlocks("doc_id", "text")
    samples(gTrial, 4, 1234L).zipWithIndex.foreach {
      case ((docs, nB, compactIx, compactOut), trial) =>
        val df = docs.toDF("doc_id", "text")
        val expect = StreamingDedup.incrementalDedupBlocked(df, "doc_id",
          pmod(col("doc_id"), lit(nB)).cast("int"), nB, blockFn)
          .as[(Long, Int)].collect().toSet
        val root = java.nio.file.Files.createTempDirectory(s"sprop$trial")
        val ix = root.resolve("ix").toString
        val out = root.resolve("out").toString
        (0 until nB).foreach { k =>
          val batch = df.filter(pmod(col("doc_id"), lit(nB)) === k)
          val (novel, novelBlocks) = StreamingDedup.processBatch(batch,
            StreamingDedup.readIndex(spark, ix, k), "doc_id", blockFn)
          novel.write.mode("overwrite").parquet(s"$out/ingest_batch=$k")
          novelBlocks.write.mode("overwrite")
            .parquet(s"$ix/ingest_batch=$k")
          graft.operators.Lifecycle.release(novelBlocks)
          if (compactIx(k)) StreamingDedup.compactIndex(spark, ix)
          if (compactOut(k)) StreamingDedup.compactOutput(spark, out)
        }
        val got = StreamingDedup.readCorpus(spark, out).get
          .select(col("doc_id"), col("ingest_batch").cast("int"))
          .as[(Long, Int)].collect().toSet
        assert(got == expect,
          s"trial $trial (nB=$nB ix=$compactIx out=$compactOut): " +
            s"extra=${got -- expect} missing=${expect -- got}")
    }
  }

  test("ingester refuses an index or output path under the scratch root") {
    // the per-batch scratch release deletes every scanned root under
    // Lifecycle.scratchRoot; a durable index there would be reclaimed
    // mid-stream and duplicates silently admitted — must fail loudly
    val in = java.nio.file.Files.createTempDirectory("sgrd_in").toString
    val cp = java.nio.file.Files.createTempDirectory("sgrd_cp").toString
    val ok = java.nio.file.Files.createTempDirectory("sgrd_ok").toString
    writeBatchFiles(in, 0 until 1)
    val bad = graft.operators.Lifecycle.scratchRoot(spark) + "/ix"
    val docs = spark.readStream.schema(docSchema)
      .option("maxFilesPerTrigger", "1").json(in)
    val e = intercept[IllegalArgumentException] {
      StreamingDedup.start(docs, "doc_id",
        StreamingDedup.minHashBlocks("doc_id", "text") _, bad, ok, cp)
    }
    assert(e.getMessage.contains("scratch root"))
    val e2 = intercept[IllegalArgumentException] {
      StreamingDedup.start(docs, "doc_id",
        StreamingDedup.minHashBlocks("doc_id", "text") _, ok,
        // scheme-qualified spelling of the same scratch location must
        // be caught too (release qualifies paths before comparing)
        "file:" + graft.operators.Lifecycle.scratchRoot(spark) + "/out", cp)
    }
    assert(e2.getMessage.contains("scratch root"))
  }

  test("blocking shape: adaptive at creation, inherited by appends, mismatch refused") {
    val ix = java.nio.file.Files.createTempDirectory("shape_ix").toString
    // creation sizes from the expected corpus: 5M docs -> 16 hashes
    // over 8x... whatever adaptiveBandShape picks — pin inheritance,
    // not the constant
    val shape = StreamingDedup.createTextIndex(spark, ix,
      corpusSizeHint = 5000000L, portable = true)
    val (nh, nb, _) = graft.operators.Dedup.adaptiveBandShape(5000000L)
    assert(shape.numHashes == nh && shape.bands == nb && shape.portable)
    // appends inherit: textBlocks reads the recorded shape and emits
    // exactly `bands` keys per doc
    val docs = mkDocs.toDF("doc_id", "text")
    val keys = StreamingDedup.textBlocks(spark, ix, "doc_id", "text")(docs)
    assert(keys.groupBy(col("doc_id")).count()
      .agg(max(col("count"))).head.getLong(0) == shape.bands.toLong)
    // idempotent re-declaration of the SAME shape is fine
    assert(StreamingDedup.createTextIndex(spark, ix,
      corpusSizeHint = 5000000L, portable = true) == shape)
    // a DIFFERENT shape is refused loudly
    val e = intercept[IllegalArgumentException] {
      StreamingDedup.recordShape(spark, ix, StreamingDedup.LegacyShape)
    }
    assert(e.getMessage.contains("refusing"))
    // and an index with no shape refuses the append path
    val bare = java.nio.file.Files.createTempDirectory("shape_bare").toString
    intercept[IllegalArgumentException] {
      StreamingDedup.textBlocks(spark, bare, "doc_id", "text")
    }
  }

  test("no-hint ingest records LegacyShape; a restart inherits it") {
    val in = java.nio.file.Files.createTempDirectory("shape_in").toString
    val out = java.nio.file.Files.createTempDirectory("shape_out").toString
    val ix = java.nio.file.Files.createTempDirectory("shape_sx").toString
    val cp = java.nio.file.Files.createTempDirectory("shape_cp").toString
    writeBatchFiles(in, 0 until 2)
    val stream = spark.readStream.schema(docSchema)
      .option("maxFilesPerTrigger", 1).json(in)
    StreamingDedup.start(stream, "doc_id", "text", ix, out, cp)
      .awaitTermination()
    assert(StreamingDedup.readShape(spark, ix)
      .contains(StreamingDedup.LegacyShape))
    // an EXPLICIT mismatched shape on the same index is refused before
    // any batch runs
    val e = intercept[IllegalArgumentException] {
      StreamingDedup.start(stream, "doc_id", "text", ix, out, cp,
        shingleN = 3, numHashes = 32, bands = 8, seed = 42L,
        portable = false,
        trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
    }
    assert(e.getMessage.contains("refusing"))
  }

  test("fused shape: adaptive creation + inheritance, mismatch refused") {
    val ix = java.nio.file.Files.createTempDirectory("fshape_ix").toString
    val shape = StreamingDedup.createFusedIndex(spark, ix,
      corpusSizeHint = 2000000L)
    assert(shape.nBits ==
      graft.operators.Similarity.adaptiveHyperplaneBits(2000000L))
    val (nh, nb, _) = graft.operators.Dedup.adaptiveBandShape(2000000L)
    assert(shape.numHashes == nh && shape.bands == nb)
    // fusedBlocksFor inherits the recorded shape (no exception, and
    // the text keys carry the recorded band count)
    val docs = mkDocs.toDF("doc_id", "text")
      .withColumn("payload", lit(null).cast("binary"))
    val keys = StreamingDedup.fusedBlocksFor(spark, ix, "doc_id",
      "text", "payload", dim = 8)(docs)
    assert(keys.filter(col("block_key").startsWith("t:"))
      .groupBy(col("doc_id")).count()
      .agg(max(col("count"))).head.getLong(0) == shape.bands.toLong)
    val e = intercept[IllegalArgumentException] {
      StreamingDedup.recordFusedShape(spark, ix,
        StreamingDedup.LegacyFusedShape)
    }
    assert(e.getMessage.contains("refusing"))
  }
}
