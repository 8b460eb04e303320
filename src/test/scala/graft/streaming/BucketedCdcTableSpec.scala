package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class BucketedCdcTableSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString

  // a batch sequence with group birth (new keys), death (all keys of a
  // bucket deleted), updates, and a no-op batch
  private def base: DataFrame =
    (1L to 200L).map(k => (k, s"g${k % 5}", k * 10)).toDF("k", "g", "v")
  private def batches: Seq[DataFrame] = Seq(
    Seq(("delete", 7L, "", 0L), ("update", 8L, "g3", 888L),
      ("insert", 501L, "new", 1L)).toDF("op", "k", "g", "v"),
    Seq(("delete", 501L, "", 0L), ("insert", 502L, "new", 2L),
      ("update", 1L, "g0", 111L)).toDF("op", "k", "g", "v"),
    Seq.empty[(String, Long, String, Long)].toDF("op", "k", "g", "v"))

  test("bucketed ≡ flat over a batch sequence, per generation") {
    val flatDir = tmp("cdcflat")
    val flat = new CdcTable(spark, flatDir, "k")
    val bkt = new BucketedCdcTable(spark, tmp("cdcbkt"), "k", nBuckets = 8)
    flat.publish(base); bkt.publish(base)
    batches.foreach { b => flat.applyBatch(b); bkt.applyBatch(b) }
    assert(bkt.generation == flat.generation)
    // per-generation equality: flat gen dirs vs bucketed manifests
    (0 to flat.generation).foreach { g =>
      val f = spark.read.parquet(s"$flatDir/gen=$g")
        .as[(Long, String, Long)].collect().toSet
      val b = bkt.snapshotAt(g).as[(Long, String, Long)].collect().toSet
      assert(b === f, s"generation $g diverged")
    }
  }

  test("a batch rewrites only its touched buckets") {
    val dir = tmp("cdctouch")
    val t = new BucketedCdcTable(spark, dir, "k", nBuckets = 16)
    t.publish(base)
    t.applyBatch(Seq(("update", 3L, "g3", 999L)).toDF("op", "k", "g", "v"))
    // gen=1's data directory contains exactly ONE bucket — key 3's
    val gen1 = new java.io.File(s"$dir/data/gen=1")
      .listFiles().filter(_.getName.startsWith("__bkt=")).map(_.getName)
    assert(gen1.length == 1, gen1.toSeq.toString)
    // untouched buckets still resolve through the gen=0 data
    assert(t.snapshot.count() == 200)
    assert(t.snapshot.filter($"k" === 3L).select($"v").as[Long].head() == 999L)
  }

  test("construction recovers the last committed generation") {
    val dir = tmp("cdcrec")
    val t = new BucketedCdcTable(spark, dir, "k", nBuckets = 4)
    t.publish(base)
    t.applyBatch(batches.head)
    val expect = t.snapshot.as[(Long, String, Long)].collect().toSet
    // a fresh instance (post-crash process) resumes at gen 1
    val t2 = new BucketedCdcTable(spark, dir, "k", nBuckets = 4)
    assert(t2.generation == 1)
    assert(t2.snapshot.as[(Long, String, Long)].collect().toSet === expect)
    // a torn manifest (no _SUCCESS) is never flipped to
    val torn = new java.io.File(s"$dir/manifest/gen=9")
    torn.mkdirs()
    val t3 = new BucketedCdcTable(spark, dir, "k", nBuckets = 4)
    assert(t3.generation == 1)
  }

  test("auto-compaction bounds the snapshot's read fan-out") {
    val dir = tmp("cdccomp")
    val t = new BucketedCdcTable(spark, dir, "k", nBuckets = 4,
      autoCompactAt = 3)
    t.publish(base)
    (1L to 6L).foreach { i =>
      t.applyBatch(Seq(("update", i, "gX", i)).toDF("op", "k", "g", "v"))
      assert(t.referencedGens <= 4, s"after batch $i: ${t.referencedGens}")
    }
    assert(t.snapshot.count() == 200)
    assert(t.snapshot.filter($"g" === "gX").count() == 6)
  }

  test("snapshotOf reads only the requested buckets") {
    val dir = tmp("cdcsof")
    val t = new BucketedCdcTable(spark, dir, "k", nBuckets = 8)
    t.publish(base)
    val all = t.snapshot.as[(Long, String, Long)].collect().toSet
    val someBuckets = t.touchedBuckets(
      Seq(("update", 5L, "g0", 1L), ("update", 17L, "g2", 1L))
        .toDF("op", "k", "g", "v"))
    val pruned = t.snapshotOf(someBuckets)
      .as[(Long, String, Long)].collect().toSet
    assert(pruned.subsetOf(all))
    // the touched keys' rows are present; rows of other buckets aren't
    assert(pruned.exists(_._1 == 5L) && pruned.exists(_._1 == 17L))
    assert(pruned.size < all.size)
    assert(t.snapshotOf(Set.empty[Int]).count() == 0)
  }

  test("BucketedCdcAggTable: maintain ≡ recompute, pruned old images, recovery") {
    val dir = tmp("cdcbagg")
    val t = new BucketedCdcAggTable(spark, dir, "k", "g", "n", Seq("v"),
      nBuckets = 8)
    t.publish(base)
    t.applyBatch(batches.head, batchId = 0L)
    t.applyBatch(batches(1), batchId = 1L)
    def recompute(tbl: BucketedCdcTable) = tbl.snapshot.groupBy($"g")
      .agg(count(lit(1)).as("n"), sum($"v").as("v"))
      .as[(String, Long, Long)].collect().toSet
    assert(t.aggSnapshot.as[(String, Long, Long)].collect().toSet ==
      recompute(t.table))
    // post-crash construction recovers the committed pair and the
    // redelivery watermark; maintained state still equals recompute
    val t2 = new BucketedCdcAggTable(spark, dir, "k", "g", "n", Seq("v"),
      nBuckets = 8)
    assert(t2.aggSnapshot.as[(String, Long, Long)].collect().toSet ==
      recompute(t2.table))
    assert(t2.table.generation == t.table.generation)
  }

  test("scanWhere ≡ snapshot.filter, and stats skip files on clustered data") {
    val dir = tmp("cdcstats")
    val t = new BucketedCdcTable(spark, dir, "k", nBuckets = 4,
      statsCols = Seq("v"))
    // range-cluster on v upstream of publish: 8 task ranges × 4 hash
    // buckets → ~32 files, each covering ~1/8th of the v domain
    val wide = (1L to 2000L).map(k => (k, s"g${k % 5}", k)).toDF("k", "g", "v")
    t.publish(wide.repartitionByRange(8, $"v"))
    def expect(lo: Long, hi: Long) =
      t.snapshot.filter($"v".between(lo, hi))
        .as[(Long, String, Long)].collect().toSet
    assert(t.scanWhere("v", 100L, 300L)
      .as[(Long, String, Long)].collect().toSet == expect(100L, 300L))
    val (kept, total) = t.pruneFiles("v", 100L, 300L)
    assert(total >= 16, s"expected many files, got $total")
    // [100, 300] spans ≤ 2 of the 8 task ranges → ≤ 2/8 of the files
    // (+1 range for boundary straddle)
    assert(kept.size <= total * 3 / 8,
      s"kept ${kept.size} of $total — stats skipped nothing")
    // a change batch rewrites its touched buckets WITHOUT clustering;
    // those files get wide ranges (correct, just unskippable) while
    // untouched buckets keep their narrow gen-0 stats
    t.applyBatch(Seq(("update", 150L, "gX", 9999L), ("delete", 200L, "", 0L),
      ("insert", 5000L, "gN", 250L)).toDF("op", "k", "g", "v"))
    assert(t.scanWhere("v", 100L, 300L)
      .as[(Long, String, Long)].collect().toSet == expect(100L, 300L))
    assert(t.scanWhere("v", 9000L, 10000L)
      .as[(Long, String, Long)].collect().toSet == expect(9000L, 10000L))
    // the out-of-base-domain probe reads only gen-1's rewritten files
    val (kept2, total2) = t.pruneFiles("v", 9000L, 10000L)
    assert(kept2.nonEmpty && kept2.forall(_.startsWith("gen=1/")),
      s"$kept2 of $total2")
  }

  test("a torn stats+data write is invisible to scanWhere recovery") {
    val dir = tmp("cdcstatstorn")
    val t = new BucketedCdcTable(spark, dir, "k", nBuckets = 4,
      statsCols = Seq("v"))
    t.publish(base)
    t.applyBatch(batches.head)
    val expect = t.scanWhere("v", 0L, 500L)
      .as[(Long, String, Long)].collect().toSet
    // simulate a crash mid-commit of gen 2: data + stats landed, the
    // manifest (the commit point) did not
    Seq("data", "stats").foreach { sub =>
      val p = new java.io.File(s"$dir/$sub/gen=2"); p.mkdirs()
      java.nio.file.Files.write(p.toPath.resolve("_SUCCESS"), Array[Byte]())
    }
    val t2 = new BucketedCdcTable(spark, dir, "k", nBuckets = 4,
      statsCols = Seq("v"))
    assert(t2.generation == 1)
    assert(t2.scanWhere("v", 0L, 500L)
      .as[(Long, String, Long)].collect().toSet == expect)
  }

  test("flat CdcTable recovers its generation across construction") {
    val dir = tmp("cdcflatrec")
    val t = new CdcTable(spark, dir, "k")
    t.publish(base)
    t.applyBatch(batches.head)
    val t2 = new CdcTable(spark, dir, "k")
    assert(t2.generation == 1)
    assert(t2.snapshot.count() == t.snapshot.count())
  }

  test("CdcAggTable recovers batch watermark and pair across construction") {
    val dir = tmp("cdcaggrec")
    val t = new CdcAggTable(spark, dir, "k", "g", "n", Seq("v"))
    t.publish(base)
    t.applyBatch(batches.head, batchId = 0L)
    t.applyBatch(batches(1), batchId = 1L)
    val expected = t.aggSnapshot.as[(String, Long, Long)].collect().toSet
    val t2 = new CdcAggTable(spark, dir, "k", "g", "n", Seq("v"))
    assert(t2.aggSnapshot.as[(String, Long, Long)].collect().toSet === expected)
    // redelivery of an already-committed batch id is a no-op even in
    // the recovered process: attach-level dedup reads the commit record
    assert(t2.table.snapshot.count() == t.table.snapshot.count())
    val recomputed = t2.table.snapshot.groupBy($"g")
      .agg(count(lit(1)).as("n"), sum($"v").as("v"))
      .as[(String, Long, Long)].collect().toSet
    assert(t2.aggSnapshot.as[(String, Long, Long)].collect().toSet === recomputed)
  }

  test("schema evolution: add-with-default + widen across generations") {
    val dir = java.nio.file.Files.createTempDirectory("bcdc_evo").toString
    val t = new BucketedCdcTable(spark, dir, keyCol = "k", nBuckets = 4)
    t.publish(Seq((1L, 10), (2L, 20), (3L, 30)).toDF("k", "cents"))
    assert(t.snapshot.schema("cents").dataType.typeName == "integer")

    t.evolveWiden("cents")
    t.evolveAddColumn("src", "string", "legacy")

    // gen 0 data was never rewritten, yet reads under the merged schema
    assert(t.snapshot.schema("cents").dataType.typeName == "long")
    assert(t.snapshot.as[(Long, Long, String)].collect().toSet ==
      Set((1L, 10L, "legacy"), (2L, 20L, "legacy"), (3L, 30L, "legacy")))

    // post-evolution batch: long beyond int range + the new column
    t.applyBatch(Seq(("update", 2L, 3000000000L, "feed"),
        ("insert", 9L, 90L, "feed"))
      .toDF("op", "k", "cents", "src"))
    assert(t.snapshot.as[(Long, Long, String)].collect().toSet ==
      Set((1L, 10L, "legacy"), (2L, 3000000000L, "feed"),
        (3L, 30L, "legacy"), (9L, 90L, "feed")))

    // time travel ACROSS the evolution boundary: the pre-evolution
    // generation answers under the merged schema too
    assert(t.snapshotAt(0).as[(Long, Long, String)].collect().toSet ==
      Set((1L, 10L, "legacy"), (2L, 20L, "legacy"), (3L, 30L, "legacy")))

    // a pre-evolution producer's batch still folds (normalized)
    t.applyBatch(Seq(("insert", 12L, 120)).toDF("op", "k", "cents"))
    assert(t.snapshot.filter($"k" === 12L)
      .as[(Long, Long, String)].collect().toSet ==
      Set((12L, 120L, "legacy")))

    // guards
    intercept[IllegalArgumentException] {
      t.evolveAddColumn("cents", "string", "")
    }
    intercept[IllegalArgumentException] { t.evolveWiden("src") }
  }

  test("schema evolution: stats pruning stays exact on a widened column") {
    val dir = java.nio.file.Files.createTempDirectory("bcdc_evo_st").toString
    val t = new BucketedCdcTable(spark, dir, keyCol = "k", nBuckets = 2,
      statsCols = Seq("cents"))
    t.publish(Seq((1L, 100), (2L, 200), (3L, 300)).toDF("k", "cents"))
    t.evolveWiden("cents")
    t.applyBatch(Seq(("insert", 10L, 5000000000L), ("insert", 11L, 6000000000L))
      .toDF("op", "k", "cents"))
    // range query above int range must read only post-evolution files
    val (files, total) = t.pruneFiles("cents", 4000000000L, 7000000000L)
    assert(files.nonEmpty && files.size < total,
      s"expected pruning, read ${files.size}/$total")
    assert(t.scanWhere("cents", 4000000000L, 7000000000L)
      .select("k").as[Long].collect().toSet == Set(10L, 11L))
    // and a range inside the old int files still answers exactly
    assert(t.scanWhere("cents", 150L, 250L)
      .select("k").as[Long].collect().toSet == Set(2L))
  }

  test("compactClustered narrows per-file stats ranges; results unchanged") {
    import org.apache.spark.sql.functions.{col => c}
    val dir = java.nio.file.Files.createTempDirectory("bcdc_opt").toString
    val t = new BucketedCdcTable(spark, dir, keyCol = "k", nBuckets = 2,
      statsCols = Seq("v"))
    // interleaved value ranges: every file spans nearly the full domain,
    // so pre-OPTIMIZE skipping can prune almost nothing
    t.publish((1L to 400L).map(i => (i, (i * 7919) % 1000))
      .toDF("k", "v"))
    t.applyBatch((401L to 800L).map(i => ("insert", i, (i * 104729) % 1000))
      .toDF("op", "k", "v"))
    val expected = t.scanWhere("v", 100L, 140L)
      .select("k").as[Long].collect().toSet
    val (keptBefore, totalBefore) = t.pruneFiles("v", 100L, 140L)

    t.compactClustered(nFiles = 16)
    val (keptAfter, totalAfter) = t.pruneFiles("v", 100L, 140L)
    // clustering produced more, narrower files — and the narrow range
    // now reads a strictly smaller FRACTION of them
    assert(totalAfter >= 8, s"expected multiple clustered files, got $totalAfter")
    assert(keptAfter.size.toDouble / totalAfter <
      math.max(keptBefore.size, 1).toDouble / totalBefore,
      s"before $keptBefore/$totalBefore after ${keptAfter.size}/$totalAfter")
    assert(t.scanWhere("v", 100L, 140L)
      .select("k").as[Long].collect().toSet == expected)
    assert(t.snapshot.count() == 800)
    // guard: clustering needs statsCols
    val bare = new BucketedCdcTable(spark,
      java.nio.file.Files.createTempDirectory("bcdc_opt2").toString,
      keyCol = "k", nBuckets = 2)
    bare.publish(Seq((1L, 1L)).toDF("k", "v"))
    intercept[IllegalArgumentException] { bare.compactClustered(4) }
  }

  test("double stats: scanWhereDouble ≡ filter, negatives + NaN, real skipping") {
    val dir = tmp("bcdc_dbl")
    val t = new BucketedCdcTable(spark, dir, "k", nBuckets = 2,
      statsCols = Seq("v"))
    // signed doubles spanning zero (the lift's hard case) + NaN rows
    val rows = (1L to 800L).map(k => (k, (k - 400L) * 1.25)) ++
      Seq((900L, Double.NaN), (901L, Double.NaN))
    t.publish(rows.toDF("k", "v").repartitionByRange(8, col("v")))
    val expected = rows.filter { case (_, v) => v >= -100.5 && v <= 100.5 }
      .map(_._1).toSet
    assert(t.scanWhereDouble("v", -100.5, 100.5)
      .select("k").as[Long].collect().toSet == expected)
    // the narrow range must actually skip files on clustered data
    val (kept, total) = t.pruneFilesDouble("v", -100.5, 100.5)
    assert(total >= 8 && kept.size < total, s"kept ${kept.size}/$total")
    // NaN sorts above +Inf in the lift: a NaN-only file is never
    // wrongly skipped by a high range, and the predicate drops NaNs
    assert(t.scanWhereDouble("v", 400.0, Double.PositiveInfinity)
      .select("k").as[Long].collect().toSet ==
      rows.filter { case (_, v) => v >= 400.0 && !v.isNaN }.map(_._1).toSet)
    // family guards: integral API refuses double columns and vice versa
    intercept[IllegalArgumentException] { t.pruneFiles("v", 0L, 1L) }
    val ti = new BucketedCdcTable(spark, tmp("bcdc_dbl2"), "k",
      nBuckets = 2, statsCols = Seq("v"))
    ti.publish(Seq((1L, 10L)).toDF("k", "v"))
    intercept[IllegalArgumentException] {
      ti.pruneFilesDouble("v", 0.0, 1.0)
    }
  }

  // simulate a crash between a gen write and its commit record: the gen
  // directories landed (with their own _SUCCESS) but the record didn't
  private def dropLatestCommitRecord(dir: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val commits = new org.apache.hadoop.fs.Path(s"$dir/commits")
    val latest = fs.listStatus(commits).toSeq
      .filter(s => !s.isDirectory && s.getPath.getName.forall(_.isDigit))
      .maxBy(_.getPath.getName.toLong)
    fs.delete(latest.getPath, false)
  }

  test("CdcAggTable: redelivery after crash-before-commit does not wedge") {
    val dir = tmp("cdcaggcrash")
    val t = new CdcAggTable(spark, dir, "k", "g", "n", Seq("v"))
    t.publish(base)
    t.applyBatch(batches.head, batchId = 0L)
    // crash: batch 0's table+agg generations are on disk, record gone.
    // Pre-fix this wedged forever: the redelivered writeAgg lost the
    // CAS to its own committed orphan and threw on every restart.
    dropLatestCommitRecord(dir)
    val t2 = new CdcAggTable(spark, dir, "k", "g", "n", Seq("v"))
    t2.applyBatch(batches.head, batchId = 0L) // redelivery, must not throw
    val recomputed = t2.table.snapshot.groupBy($"g")
      .agg(count(lit(1)).as("n"), sum($"v").as("v"))
      .as[(String, Long, Long)].collect().toSet
    assert(t2.aggSnapshot.as[(String, Long, Long)].collect().toSet
      === recomputed)
    // and the timeline continues normally
    t2.applyBatch(batches(1), batchId = 1L)
    val recomputed2 = t2.table.snapshot.groupBy($"g")
      .agg(count(lit(1)).as("n"), sum($"v").as("v"))
      .as[(String, Long, Long)].collect().toSet
    assert(t2.aggSnapshot.as[(String, Long, Long)].collect().toSet
      === recomputed2)
  }

  test("BucketedCdcAggTable: redelivery after crash-before-commit recovers") {
    val dir = tmp("bcdcaggcrash")
    val t = new BucketedCdcAggTable(spark, dir, "k", "g", "n", Seq("v"),
      nBuckets = 4)
    t.publish(base)
    t.applyBatch(batches.head, batchId = 0L)
    dropLatestCommitRecord(dir)
    val t2 = new BucketedCdcAggTable(spark, dir, "k", "g", "n", Seq("v"),
      nBuckets = 4)
    t2.applyBatch(batches.head, batchId = 0L)
    t2.applyBatch(batches(1), batchId = 1L)
    val recomputed = t2.table.snapshot.groupBy($"g")
      .agg(count(lit(1)).as("n"), sum($"v").as("v"))
      .as[(String, Long, Long)].collect().toSet
    assert(t2.aggSnapshot.as[(String, Long, Long)].collect().toSet
      === recomputed)
  }

  test("a committed data gen without a manifest never wedges the table") {
    val dir = tmp("bcdcorphan")
    val t = new BucketedCdcTable(spark, dir, "k", nBuckets = 4)
    t.publish(base)
    // crashed writer's leftover: data committed (own _SUCCESS), no
    // manifest. Pre-fix, every later write lost the data CAS to this
    // orphan 3 times and refused with a misleading live-writer error.
    Seq((999L, "zz", 0L)).toDF("k", "g", "v")
      .withColumn("__bkt", lit(0))
      .write.partitionBy("__bkt").parquet(s"$dir/data/gen=7")
    t.applyBatch(batches.head) // must allocate PAST the orphan
    assert(t.generation == 1)
    // the orphan is unreferenced: snapshot equals the flat equivalent
    val flat = new CdcTable(spark, tmp("bcdcorphanflat"), "k")
    flat.publish(base); flat.applyBatch(batches.head)
    assert(t.snapshot.as[(Long, String, Long)].collect().toSet ===
      flat.snapshot.as[(Long, String, Long)].collect().toSet)
    // data landed above the orphan's number, not at manifest-gen pace
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$dir/data/gen=8")))
  }
}
