package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Generation retention / VACUUM across the persisted stack: floor
  * semantics (exact within horizon, LOUD past it), mark-then-sweep
  * grace, orphan collection, janitor idempotence, recovery. */
class RetentionSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString

  private def fsOf(dir: String) = new org.apache.hadoop.fs.Path(dir)
    .getFileSystem(spark.sessionState.newHadoopConf())

  private def exists(dir: String, rel: String) =
    fsOf(dir).exists(new org.apache.hadoop.fs.Path(s"$dir/$rel"))

  private def base: DataFrame =
    (1L to 200L).map(k => (k, s"g${k % 5}", k * 10)).toDF("k", "g", "v")
  private def batches: Seq[DataFrame] = Seq(
    Seq(("delete", 7L, "", 0L), ("update", 8L, "g3", 888L),
      ("insert", 501L, "new", 1L)).toDF("op", "k", "g", "v"),
    Seq(("delete", 501L, "", 0L), ("insert", 502L, "new", 2L),
      ("update", 1L, "g0", 111L)).toDF("op", "k", "g", "v"))

  test("bucketed vacuum: exact within horizon, loud past it, bytes reclaimed") {
    val dir = tmp("vacbkt")
    val t = new BucketedCdcTable(spark, dir, "k", nBuckets = 4)
    t.publish(base)
    batches.foreach(t.applyBatch)
    assert(t.generation == 2)
    val expect1 = t.snapshotAt(1).as[(Long, String, Long)].collect().toSet
    val expect2 = t.snapshotAt(2).as[(Long, String, Long)].collect().toSet

    // pass 1: MARK. Floor rises, reads below it refuse immediately,
    // but the marked directories stay on disk (reader grace).
    t.vacuum(retainLast = 2)
    assert(t.retentionFloor == 1)
    intercept[IllegalArgumentException] { t.snapshotAt(0) }
    assert(exists(dir, "manifest/gen=0"), "grace: mark must not delete")

    // pass 2: SWEEP. gen 0's manifest and its now-unreferenced data
    // are physically reclaimed.
    t.vacuum(retainLast = 2)
    assert(!exists(dir, "manifest/gen=0"))
    // gen 0 wrote ALL buckets at data gen 1 (publish); batches 1 and 2
    // rewrote only touched buckets, so data gen 1 is still referenced
    // by retained manifests and must SURVIVE
    assert(exists(dir, "data/gen=1"), "live data gen swept")

    // within the horizon: still exact, against pre-vacuum truth
    assert(t.snapshotAt(1).as[(Long, String, Long)].collect().toSet
      === expect1)
    assert(t.snapshotAt(2).as[(Long, String, Long)].collect().toSet
      === expect2)

    // construction recovers the floor
    val t2 = new BucketedCdcTable(spark, dir, "k", nBuckets = 4)
    assert(t2.retentionFloor == 1)
    intercept[IllegalArgumentException] { t2.snapshotAt(0) }

    // the timeline continues, and vacuuming again advances the floor
    t2.applyBatch(batches.head)
    t2.vacuum(retainLast = 1)
    t2.vacuum(retainLast = 1)
    assert(t2.retentionFloor == 3)
    assert(!exists(dir, "manifest/gen=1") && !exists(dir, "manifest/gen=2"))
    assert(t2.snapshotAt(3).count() == t2.snapshot.count())
  }

  test("bucketed vacuum collects unreferenced (orphan) data generations") {
    val dir = tmp("vacorphan")
    val t = new BucketedCdcTable(spark, dir, "k", nBuckets = 4)
    t.publish(base)
    // a crashed writer's committed data gen that no manifest references
    Seq((999L, "zz", 0L)).toDF("k", "g", "v").withColumn("__bkt", lit(0))
      .write.partitionBy("__bkt").parquet(s"$dir/data/gen=7")
    t.vacuum(retainLast = 10) // mark (floor unchanged: horizon is wide)
    assert(t.retentionFloor == 0)
    assert(exists(dir, "data/gen=7"), "grace: mark must not delete")
    t.vacuum(retainLast = 10) // sweep
    assert(!exists(dir, "data/gen=7"), "orphan data gen not collected")
    // the table itself is untouched
    assert(t.snapshotAt(0).count() == 200)
  }

  test("second janitor is idempotent; a pre-mark reader survives the mark pass") {
    val dir = tmp("vacrace")
    val t = new BucketedCdcTable(spark, dir, "k", nBuckets = 4)
    t.publish(base)
    batches.foreach(t.applyBatch)
    // a reader plans its scan BEFORE the janitor runs
    val reader = t.snapshotAt(0)
    t.vacuum(retainLast = 1) // MARK pass: floor rises, nothing deleted
    assert(t.retentionFloor == 2)
    // grace: the pre-mark reader completes — its files are only marked
    assert(reader.count() == 200L)
    // a SECOND janitor (fresh handle, same root) runs the sweep pass:
    // same records, double-delete is a no-op, floors agree
    val j2 = new BucketedCdcTable(spark, dir, "k", nBuckets = 4)
    j2.vacuum(retainLast = 1)
    assert(j2.retentionFloor == 2)
    assert(!exists(dir, "manifest/gen=0") && !exists(dir, "manifest/gen=1"))
    // further passes at the same horizon are pure no-ops
    j2.vacuum(retainLast = 1)
    t.vacuum(retainLast = 1)
    assert(t.snapshot.count() == j2.snapshot.count())
    assert(t.snapshotAt(2).count() == 200L)
  }

  test("flat CdcTable vacuum + snapshotAt horizon") {
    val dir = tmp("vacflat")
    val t = new CdcTable(spark, dir, "k")
    t.publish(base)
    batches.foreach(t.applyBatch)
    val expect2 = t.snapshotAt(2).as[(Long, String, Long)].collect().toSet
    t.vacuum(retainLast = 1); t.vacuum(retainLast = 1)
    assert(t.retentionFloor == 2)
    assert(!exists(dir, "gen=0") && !exists(dir, "gen=1"))
    intercept[IllegalArgumentException] { t.snapshotAt(1) }
    assert(t.snapshotAt(2).as[(Long, String, Long)].collect().toSet
      === expect2)
    assert(new CdcTable(spark, dir, "k").retentionFloor == 2)
  }

  test("pair vacuum: agg generations + commit records pruned, pair intact") {
    val dir = tmp("vacpair")
    val t = new BucketedCdcAggTable(spark, dir, "k", "g", "n", Seq("v"),
      nBuckets = 4)
    t.publish(base)
    t.applyBatch(batches.head, 0L)
    t.applyBatch(batches(1), 1L)
    val expected = t.aggSnapshot.as[(String, Long, Long)].collect().toSet
    t.vacuum(retainLast = 1); t.vacuum(retainLast = 1)
    assert(!exists(dir, "agg/gen=0") && !exists(dir, "agg/gen=1"))
    assert(exists(dir, "agg/gen=2"))
    // only the newest commit record survives; recovery still exact
    val fs = fsOf(dir)
    val recs = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/commits"))
      .filter(s => s.getPath.getName.forall(_.isDigit))
    assert(recs.length == 1)
    val t2 = new BucketedCdcAggTable(spark, dir, "k", "g", "n", Seq("v"),
      nBuckets = 4)
    assert(t2.aggSnapshot.as[(String, Long, Long)].collect().toSet
      === expected)
    // and the maintained timeline continues after a vacuum
    t2.applyBatch(
      Seq(("insert", 900L, "g9", 9L)).toDF("op", "k", "g", "v"), 2L)
    val recomputed = t2.table.snapshot.groupBy($"g")
      .agg(count(lit(1)).as("n"), sum($"v").as("v"))
      .as[(String, Long, Long)].collect().toSet
    assert(t2.aggSnapshot.as[(String, Long, Long)].collect().toSet
      === recomputed)
  }

  test("rollup tables: timeline vacuum keeps the fold path exact") {
    val kdir = tmp("vackmv")
    val kmv = new KmvRollupTable(spark, kdir, "g", k = 32)
    (1 to 3).foreach { i =>
      kmv.maintain(
        (1L to 50L).map(x => (s"g${x % 2}", x * i)).toDF("g", "x"),
        xxhash64(col("x")))
    }
    val latest = kmv.sketches().collect().map(_.toString).toSet
    kmv.vacuum(retainLast = 2); kmv.vacuum(retainLast = 2)
    assert(kmv.retentionFloor == 1)
    assert(!exists(kdir, "gen=0"))
    intercept[IllegalArgumentException] { kmv.sketches(0) }
    assert(kmv.sketches().collect().map(_.toString).toSet === latest)
    // maintain continues folding on the retained latest generation
    kmv.maintain((1L to 10L).map(x => (s"g${x % 2}", x + 1000))
      .toDF("g", "x"), xxhash64(col("x")))
    assert(kmv.generation == 3)

    val hdir = tmp("vachll")
    val hll = new HllRollupTable(spark, hdir, Seq("g"))
    (1 to 3).foreach { i =>
      hll.maintain(
        (1L to 50L).map(x => (s"g${x % 2}", x * i)).toDF("g", "x"),
        col("x"))
    }
    val est = hll.estimates().collect().map(_.toString).toSet
    hll.vacuum(retainLast = 1); hll.vacuum(retainLast = 1)
    assert(hll.retentionFloor == 2)
    assert(!exists(hdir, "gen=0") && !exists(hdir, "gen=1"))
    intercept[IllegalArgumentException] { hll.registers(1) }
    assert(hll.estimates().collect().map(_.toString).toSet === est)
  }
}
