package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.functions.KmvSketch
import org.apache.spark.sql.functions._

/** Incrementally-maintained KMV overlap sketch: maintain ≡ recompute
  * (bit-identical, every generation), generation protocol, overlap
  * estimates off the rollup. */
class KmvRollupSpec extends SparkSpec {
  import spark.implicits._

  private def h(x: Long): Long = (x * -7046029254386353131L) >>> 4

  private def items(g: String, xs: Seq[Long], batch: Long => Int) =
    xs.map(x => (g, h(x), batch(x))).toDF("grp", "h", "batch")

  test("maintained sketch is bit-identical to the one-shot sketch, every generation") {
    val dir = Files.createTempDirectory("kmvroll").toString + "/t"
    val all = items("g", 1L to 5000L, x => (x % 3).toInt)
      .union(items("g2", 2000L to 9000L, x => (x % 3).toInt))
    val tbl = new KmvRollupTable(spark, dir, "grp", k = 64)
    (0 to 2).foreach { b =>
      tbl.maintain(all.filter(col("batch") === b), col("h"))
      val oneShot = all.filter(col("batch") <= b)
        .groupBy(col("grp")).agg(KmvSketch.minima(col("h"), 64).as("sketch"))
      val maintained = tbl.sketches(b)
      assert(maintained.exceptAll(oneShot).isEmpty &&
        oneShot.exceptAll(maintained).isEmpty, s"generation $b diverged")
    }
    assert(tbl.generation === 2)
  }

  test("groups born in a later batch merge against empty") {
    val dir = Files.createTempDirectory("kmvroll2").toString + "/t"
    val tbl = new KmvRollupTable(spark, dir, "grp", k = 32)
    tbl.maintain(items("old", 1L to 100L, _ => 0), col("h"))
    tbl.maintain(items("newborn", 1L to 100L, _ => 1), col("h"))
    val g1 = tbl.sketches(1).collect().map(r => r.getString(0)).sorted
    assert(g1.toSeq === Seq("newborn", "old"))
    // the old group's sketch is untouched by a batch without its rows
    val oldSk = tbl.sketches(1).filter(col("grp") === "old")
      .head.getSeq[Long](1)
    assert(oldSk === (1L to 100L).map(h).sorted.take(32))
  }

  test("overlapWith estimates exactly against a fixed reference sketch") {
    val dir = Files.createTempDirectory("kmvroll3").toString + "/t"
    val tbl = new KmvRollupTable(spark, dir, "grp", k = 256)
    // two batches covering 1..100; reference covers 51..150 → |∩|=50
    tbl.maintain(items("g", 1L to 50L, _ => 0), col("h"))
    tbl.maintain(items("g", 51L to 100L, _ => 1), col("h"))
    val ref = items("g", 51L to 150L, _ => 0)
      .groupBy(col("grp")).agg(KmvSketch.minima(col("h"), 256).as("sketch"))
    val r = tbl.overlapWith(ref).head
    assert(r.getAs[Double]("est_union") === 150.0) // exact below k
    assert(math.abs(r.getAs[Double]("est_intersection") - 50.0) < 1e-9)
    // generation 0 saw only 1..50: zero overlap with 51..150
    val r0 = tbl.overlapWith(ref, g = 0).head
    assert(r0.getAs[Long]("n_match") === 0L)
  }

  test("registry timeline: every (group x set x generation) cell, late-born groups included") {
    val dir = Files.createTempDirectory("kmvroll5").toString + "/t"
    val tbl = new KmvRollupTable(spark, dir, "grp", k = 256)
    // group gA ingests from batch 0; gB is BORN in batch 1
    tbl.maintain(items("gA", 1L to 80L, _ => 0), col("h"))
    tbl.maintain(items("gA", 81L to 100L, _ => 0)
      .union(items("gB", 200L to 260L, _ => 0)), col("h"))
    // registry: two eval sets — setX overlaps gA (41..60), setY
    // overlaps gB (241..280)
    val registry = items("setX", 41L to 60L, _ => 0)
      .union(items("setY", 241L to 280L, _ => 0))
      .withColumnRenamed("grp", "eval_set")
      .groupBy(col("eval_set"))
      .agg(KmvSketch.minima(col("h"), 256).as("sketch"))
    val cells = tbl.overlapTimeline(registry, "eval_set")
      .select(col("gen"), col("grp"), col("eval_set"),
        col("est_intersection"), col("n_match"))
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2)) ->
        (r.getDouble(3), r.getLong(4))).toMap
    // gen 0: only gA exists → 2 cells; gen 1: 2 groups × 2 sets = 4
    assert(cells.size === 6)
    // everything is below k → EXACT estimates
    assert(math.abs(cells((0, "gA", "setX"))._1 - 20.0) < 1e-9)
    assert(cells((0, "gA", "setY"))._2 === 0L)
    assert(math.abs(cells((1, "gB", "setY"))._1 - 20.0) < 1e-9)
    assert(cells((1, "gB", "setX"))._2 === 0L)
    assert(math.abs(cells((1, "gA", "setX"))._1 - 20.0) < 1e-9)
  }

  test("a reopened table resumes from the committed generation") {
    val dir = Files.createTempDirectory("kmvroll4").toString + "/t"
    val tbl = new KmvRollupTable(spark, dir, "grp", k = 16)
    tbl.maintain(items("g", 1L to 10L, _ => 0), col("h"))
    tbl.maintain(items("g", 11L to 20L, _ => 1), col("h"))
    val reopened = new KmvRollupTable(spark, dir, "grp", k = 16)
    assert(reopened.generation === 1)
    assert(reopened.sketches().head.getSeq[Long](1) ===
      (1L to 20L).map(h).sorted.take(16))
  }
}
