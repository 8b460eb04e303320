package graft.streaming

import graft.SparkSpec
import graft.operators.{AtomicCommit, ConcurrentWriteException, HammingIndex}
import org.apache.hadoop.fs.Path

/** Two interleaved writers on every persisted table type: the
  * conditional-commit CAS ([[graft.operators.AtomicCommit]]) must give
  * each raced generation exactly one winner, and the loser must either
  * retry against the winner's committed state (plain tables, rollups)
  * or refuse loudly (single-writer pair protocols, increment ids) —
  * never silently clobber. The interleave is two INSTANCES over the
  * same directory, alternating writes, so each instance's in-memory
  * generation is stale when it writes (the exact "both write gen=N+1"
  * shape the r11 verdict called out). */
class ConcurrentWriterSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def hfs(dir: String) =
    new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())

  test("AtomicCommit.publishDir: one winner, detected loser, cleanup") {
    val root = tmp("cas")
    val fs = hfs(root)
    def attempt(name: String, content: String): Path = {
      val p = new Path(root, name)
      fs.mkdirs(p)
      val out = fs.create(new Path(p, "data"), true)
      out.write(content.getBytes("UTF-8")); out.close()
      fs.create(new Path(p, "_SUCCESS"), true).close()
      p
    }
    val dst = new Path(root, "gen=1")
    val a = attempt(".attempt-a", "A")
    val b = attempt(".attempt-b", "B")
    assert(AtomicCommit.publishDir(fs, a, dst, "ua"))
    assert(!AtomicCommit.publishDir(fs, b, dst, "ub"))
    // winner's content survives; loser's attempt is gone, not nested
    val in = fs.open(new Path(dst, "data"))
    val buf = new Array[Byte](1); in.read(buf); in.close()
    assert(new String(buf, "UTF-8") == "A")
    assert(!fs.exists(b))
    assert(fs.listStatus(dst).map(_.getPath.getName).forall(n =>
      !n.startsWith(".attempt-")))
  }

  test("AtomicCommit.publishDir: torn (uncommitted) destination is reclaimed") {
    val root = tmp("cas_torn")
    val fs = hfs(root)
    val dst = new Path(root, "gen=1")
    fs.mkdirs(dst) // crashed writer: directory without _SUCCESS
    val out = fs.create(new Path(dst, "part-torn"), true)
    out.write("torn".getBytes("UTF-8")); out.close()
    val a = new Path(root, ".attempt-x")
    fs.mkdirs(a)
    fs.create(new Path(a, "_SUCCESS"), true).close()
    assert(AtomicCommit.publishDir(fs, a, dst, "ux"))
    assert(!fs.exists(new Path(dst, "part-torn")))
  }

  test("CdcTable: interleaved writers linearize (loser recomputes and lands)") {
    val dir = tmp("cdc_two")
    val a = new CdcTable(spark, dir, keyCol = "k")
    a.publish(Seq((1L, 10), (2L, 20)).toDF("k", "v"))
    val b = new CdcTable(spark, dir, keyCol = "k") // recovers gen=0
    a.applyBatch(Seq(("insert", 3L, 30)).toDF("op", "k", "v"))
    // b's in-memory gen is stale (0): its first CAS at gen=1 must LOSE
    // against a's committed gen=1, reload, and re-apply against it
    b.applyBatch(Seq(("update", 1L, 11)).toDF("op", "k", "v"))
    val fin = new CdcTable(spark, dir, keyCol = "k")
    assert(fin.generation == 2)
    assert(fin.snapshot.as[(Long, Int)].collect().toSet ==
      Set((1L, 11), (2L, 20), (3L, 30)))
    // a's instance serves its own committed gen; b's write did not
    // clobber gen=1 (time travel intact)
    assert(spark.read.parquet(s"$dir/gen=1").as[(Long, Int)]
      .collect().toSet == Set((1L, 10), (2L, 20), (3L, 30)))
  }

  test("BucketedCdcTable: interleaved writers linearize") {
    val dir = tmp("bcdc_two")
    val a = new BucketedCdcTable(spark, dir, keyCol = "k", nBuckets = 4)
    a.publish(Seq((1L, 10), (2L, 20), (5L, 50)).toDF("k", "v"))
    val b = new BucketedCdcTable(spark, dir, keyCol = "k", nBuckets = 4)
    a.applyBatch(Seq(("insert", 7L, 70)).toDF("op", "k", "v"))
    b.applyBatch(Seq(("delete", 2L, 0), ("update", 5L, 55))
      .toDF("op", "k", "v"))
    val fin = new BucketedCdcTable(spark, dir, keyCol = "k", nBuckets = 4)
    assert(fin.generation == 2)
    assert(fin.snapshot.as[(Long, Int)].collect().toSet ==
      Set((1L, 10), (5L, 55), (7L, 70)))
    // the raced generation's manifest belongs to ONE writer: gen=1 is
    // a's (has key 7, still has key 2)
    assert(fin.snapshotAt(1).as[(Long, Int)].collect().toSet ==
      Set((1L, 10), (2L, 20), (5L, 50), (7L, 70)))
  }

  test("KmvRollupTable: interleaved maintainers both land") {
    import org.apache.spark.sql.functions._
    val dir = tmp("kmv_two")
    val a = new KmvRollupTable(spark, dir, groupCol = "g", k = 16)
    val b = new KmvRollupTable(spark, dir, groupCol = "g", k = 16)
    val h = xxhash64(col("x"))
    a.maintain(Seq(("g1", 1L), ("g1", 2L)).toDF("g", "x"), h)
    b.maintain(Seq(("g1", 3L), ("g2", 4L)).toDF("g", "x"), h) // stale gen
    a.maintain(Seq(("g2", 5L)).toDF("g", "x"), h) // stale again
    val fin = new KmvRollupTable(spark, dir, groupCol = "g", k = 16)
    assert(fin.generation == 2)
    // all three batches' elements folded (k=16 > distinct count, so the
    // sketch is exact: minima count == distinct count)
    val sizes = fin.sketches().select(col("g"), size(col("sketch")))
      .as[(String, Int)].collect().toMap
    assert(sizes == Map("g1" -> 3, "g2" -> 2))
  }

  test("CdcAggTable: second pair-writer refuses loudly, pair stays consistent") {
    val dir = tmp("cdcagg_two")
    val a = new CdcAggTable(spark, dir, keyCol = "k", groupCol = "g",
      countCol = "n", sumCols = Seq("sv"))
    a.publish(Seq((1L, "x", 10L)).toDF("k", "g", "sv"))
    val b = new CdcAggTable(spark, dir, keyCol = "k", groupCol = "g",
      countCol = "n", sumCols = Seq("sv"))
    a.applyBatch(Seq(("insert", 2L, "x", 20L)).toDF("op", "k", "g", "sv"))
    intercept[ConcurrentWriteException] {
      b.applyBatch(Seq(("insert", 3L, "y", 30L)).toDF("op", "k", "g", "sv"))
    }
    // the winner's pair is intact and consistent
    val fin = new CdcAggTable(spark, dir, keyCol = "k", groupCol = "g",
      countCol = "n", sumCols = Seq("sv"))
    assert(fin.aggSnapshot.as[(String, Long, Long)].collect().toSet ==
      Set(("x", 2L, 30L)))
    assert(fin.table.snapshot.count() == 2)
  }

  test("BucketedCdcAggTable: second pair-writer refuses loudly") {
    val dir = tmp("bagg_two")
    val a = new BucketedCdcAggTable(spark, dir, keyCol = "k",
      groupCol = "g", countCol = "n", sumCols = Seq("sv"), nBuckets = 4)
    a.publish(Seq((1L, "x", 10L)).toDF("k", "g", "sv"))
    val b = new BucketedCdcAggTable(spark, dir, keyCol = "k",
      groupCol = "g", countCol = "n", sumCols = Seq("sv"), nBuckets = 4)
    a.applyBatch(Seq(("insert", 2L, "x", 20L)).toDF("op", "k", "g", "sv"))
    intercept[ConcurrentWriteException] {
      b.applyBatch(Seq(("insert", 3L, "y", 30L)).toDF("op", "k", "g", "sv"))
    }
    assert(new BucketedCdcAggTable(spark, dir, keyCol = "k",
      groupCol = "g", countCol = "n", sumCols = Seq("sv"), nBuckets = 4)
      .aggSnapshot.as[(String, Long, Long)].collect().toSet ==
      Set(("x", 2L, 30L)))
  }

  test("CdcAggTable: construction is read-only — an unrecorded " +
      "generation survives a reader and is reclaimed by the next WRITER") {
    val dir = tmp("cdcagg_reader")
    val fs = hfs(dir)
    val a = new CdcAggTable(spark, dir, keyCol = "k", groupCol = "g",
      countCol = "n", sumCols = Seq("sv"))
    a.publish(Seq((1L, "x", 10L)).toDF("k", "g", "sv")) // gen 0 + record
    // simulate a writer crashed between its gen write and its commit
    // record: a committed-looking table generation beyond the record
    val orphan = new Path(s"$dir/table/gen=1")
    fs.mkdirs(orphan)
    fs.create(new Path(orphan, "_SUCCESS"), true).close()
    // a PURE READER constructed now must not delete it (it may be a
    // live writer's in-flight commit, not crash debris)
    val r = new CdcAggTable(spark, dir, keyCol = "k", groupCol = "g",
      countCol = "n", sumCols = Seq("sv"))
    assert(r.aggSnapshot.as[(String, Long, Long)].collect().toSet ==
      Set(("x", 1L, 10L)))
    assert(fs.exists(orphan), "reader construction deleted an " +
      "unrecorded generation — construction must be read-only")
    // the recovered writer's first write reclaims the torn slot and
    // republishes into it (no permanent CAS crash loop)
    val w = new CdcAggTable(spark, dir, keyCol = "k", groupCol = "g",
      countCol = "n", sumCols = Seq("sv"))
    w.applyBatch(Seq(("insert", 2L, "x", 20L)).toDF("op", "k", "g", "sv"))
    assert(w.aggSnapshot.as[(String, Long, Long)].collect().toSet ==
      Set(("x", 2L, 30L)))
    assert(new CdcAggTable(spark, dir, keyCol = "k", groupCol = "g",
      countCol = "n", sumCols = Seq("sv"))
      .table.snapshot.count() == 2)
  }

  test("HammingIndex: raced increment id refuses; checkpoint replay overwrites") {
    val dir = tmp("ham_two") + "/idx"
    val vecs = (1 to 8).map(i => (i.toLong, Array.fill(16)(i * 0.1f)))
      .toDF("id", "vec")
    HammingIndex.build(vecs, "id", "vec", dim = 16, path = dir)
    // two batch writers both read nextBatchId = 1 and append
    val next = HammingIndex.nextBatchId(spark, dir)
    val more = Seq((100L, Array.fill(16)(0.5f))).toDF("id", "vec")
    HammingIndex.append(spark, dir, more, "id", "vec", next)
    val e = intercept[ConcurrentWriteException] {
      HammingIndex.append(spark, dir,
        Seq((200L, Array.fill(16)(-0.5f))).toDF("id", "vec"),
        "id", "vec", next)
    }
    assert(e.getMessage.contains("concurrent"), e.getMessage)
    // winner's codes intact
    val ids = HammingIndex.load(spark, dir, "id").codes
      .select("id").as[Long].collect().toSet
    assert(ids == (1L to 8L).toSet + 100L)
    // a streaming replay of its OWN id overwrites instead of refusing
    HammingIndex.append(spark, dir,
      Seq((100L, Array.fill(16)(0.5f))).toDF("id", "vec"),
      "id", "vec", next, replay = true)
    assert(HammingIndex.load(spark, dir, "id").codes.count() == 9)
  }

  test("StreamingDedup.compactIndex: an already-committed generation is a " +
      "silent replay — no re-fold, winner intact, sources survive the pass") {
    val dir = tmp("sdedup_two") + "/idx"
    // two committed ingest batches
    Seq((1L, "h1")).toDF("id", "block").write
      .parquet(s"$dir/ingest_batch=0")
    Seq((2L, "h2")).toDF("id", "block").write
      .parquet(s"$dir/ingest_batch=1")
    // another compactor already published gen=2 (committed marker)
    Seq((1L, "h1"), (2L, "h2")).toDF("id", "block").write
      .parquet(s"$dir/gen=2")
    hfs(dir).create(new Path(s"$dir/gen=2", "_GRAFT_COMMITTED"),
      true).close()
    // a racer (or checkpoint replay) whose gen=upTo is ALREADY committed
    // must not re-fold and must not throw: it proceeds straight to the
    // retention marks (idempotent replay — the CAS refusal is reserved
    // for the true in-flight race, where the winner lands BETWEEN this
    // compactor's destination check and its publish). The covered
    // sources are superseded by the committed winner either way, so
    // marking them for the next sweep is correct; they must still be
    // present after THIS pass (one janitor cycle of reader grace).
    StreamingDedup.compactIndex(spark, dir, upTo = 2L)
    // winner's generation intact, sources untouched this cycle (the
    // replay must not run a covered-partition delete)
    assert(spark.read.parquet(s"$dir/gen=2").count() == 2)
    assert(hfs(dir).exists(new Path(s"$dir/ingest_batch=0")))
    assert(hfs(dir).exists(new Path(s"$dir/ingest_batch=1")))
    // the index still reads exactly the winner's content
    val ids = StreamingDedup.readIndex(spark, dir, beforeBatch = 99L)
      .get.select("id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 2L))
  }
}
